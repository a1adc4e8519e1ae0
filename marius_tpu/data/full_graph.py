"""Full-graph padded adjacency: exact ALL-neighbor GNN compute, TPU-first.

The reference's ALL sampling is unbounded (data/samplers/neighbor.cpp:9) and
re-gathers every batch's multi-hop neighborhood. On graphs whose k-hop
frontier covers most nodes (ogbn-arxiv at batch 1000 reaches ~80% of the
graph by hop 2), the TPU-native formulation is to drop per-batch frontier
machinery entirely: compute every GNN layer over ALL nodes with a fixed
padded adjacency and slice the batch rows from the final layer. The result
is bit-equal to exact ALL sampling (a node's layer-k output depends only on
its k-hop neighborhood) while replacing dedup/remap/scalar-index work with
wide gathers — pure MXU/HBM work.

**Degree bucketing** makes the padding hub-proof: nodes are permuted into
power-of-two degree buckets (bucket key = ceil_pow2(max(in_deg, out_deg))),
and each bucket pads to ITS max per-direction degree. Total padded slots are
< 2x the edge count even on power-law graphs (arxiv's ~13k-degree hub costs
one small bucket, not N x 13k of padding), and every bucket is a fixed-shape
masked gather-sum XLA tiles cleanly.

The backward pass is scatter-free by construction: the vjp of "sum over
in-neighbors" is "sum over out-neighbors" (the transposed adjacency), which
this module wires as a custom_vjp so XLA never emits a row scatter-add
(v5e scatters serialize at ~7ns/row; the transposed gather runs ~30x
faster). The identity is global, so it holds regardless of how each
direction's sum is bucketed internally.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FullGraphAdjacency:
    """Degree-bucketed padded neighbor lists for ALL nodes, both directions.

    Nodes are reordered by ``perm`` (bucket-major); bucket ``b`` occupies
    sorted rows [boundaries[b], boundaries[b+1]) and its per-direction
    neighbor/mask blocks are ``in_nbrs[b]`` etc., each padded to the bucket's
    own max degree. ``inv_pos[i]`` is node i's row in sorted order, so
    original-order outputs are one gather away. Neighbor ids are ORIGINAL
    node ids (inputs stay in original order). in/out are each other's
    transpose, which the custom-vjp aggregation exploits.
    """

    in_nbrs: Tuple[Array, ...]   # per bucket: (n_b, cap_in_b) int32
    in_masks: Tuple[Array, ...]  # per bucket: (n_b, cap_in_b) bool
    out_nbrs: Tuple[Array, ...]
    out_masks: Tuple[Array, ...]
    inv_pos: Array               # (N,) int32: original id -> sorted row
    in_deg: Array                # (N,) int32, original order
    out_deg: Array               # (N,) int32, original order
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def total_slots(self) -> int:
        return sum(int(np.prod(a.shape)) for a in self.in_nbrs + self.out_nbrs)


def _direction_csr(anchor: np.ndarray, other: np.ndarray, num_nodes: int):
    """Sorted-by-anchor CSR: (offsets (N+1,), neighbors-in-anchor-order)."""
    order = np.argsort(anchor, kind="stable")
    o_s = other[order]
    offsets = np.searchsorted(anchor[order], np.arange(num_nodes + 1))
    return offsets.astype(np.int64), o_s


def _bucket_padded(offsets: np.ndarray, nbrs_sorted: np.ndarray,
                   nodes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Padded (len(nodes), cap) neighbor block for the given original ids."""
    deg = (offsets[nodes + 1] - offsets[nodes]).astype(np.int64)
    cap = max(int(deg.max()) if len(deg) else 0, 1)
    nbr = np.zeros((len(nodes), cap), np.int32)
    rows = np.repeat(np.arange(len(nodes)), deg)
    cols = np.arange(int(deg.sum())) - np.repeat(np.cumsum(deg) - deg, deg)
    src_idx = np.repeat(offsets[nodes], deg) + cols
    nbr[rows, cols] = nbrs_sorted[src_idx]
    mask = np.arange(cap)[None, :] < deg[:, None]
    return nbr, mask


def build_full_graph_adjacency(
        edges: np.ndarray, num_nodes: int,
        max_degree_limit: Optional[int] = None) -> Optional[FullGraphAdjacency]:
    """Build the bucketed adjacency. Degree bucketing bounds padding waste,
    so arbitrary hub degrees are fine; ``max_degree_limit`` is kept for API
    compatibility and ignored."""
    del max_degree_limit
    e = np.asarray(edges)
    if len(e) == 0 or num_nodes == 0:
        return None
    src = e[:, 0].astype(np.int32)
    dst = e[:, -1].astype(np.int32)
    in_off, in_sorted = _direction_csr(dst, src, num_nodes)    # in-nbrs of i
    out_off, out_sorted = _direction_csr(src, dst, num_nodes)  # out-nbrs of i
    in_deg = np.diff(in_off).astype(np.int32)
    out_deg = np.diff(out_off).astype(np.int32)

    key = np.maximum(np.maximum(in_deg, out_deg), 1).astype(np.int64)
    bucket_id = np.ceil(np.log2(key)).astype(np.int64)  # pow2 bucket
    perm = np.argsort(bucket_id, kind="stable")
    inv_pos = np.empty(num_nodes, np.int32)
    inv_pos[perm] = np.arange(num_nodes, dtype=np.int32)

    ids_sorted = bucket_id[perm]
    bounds = np.flatnonzero(np.diff(ids_sorted)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [num_nodes]])

    in_nbrs, in_masks, out_nbrs, out_masks = [], [], [], []
    for s, t in zip(starts, ends):
        nodes = perm[s:t]
        nbr, mask = _bucket_padded(in_off, in_sorted, nodes)
        in_nbrs.append(jnp.asarray(nbr))
        in_masks.append(jnp.asarray(mask))
        nbr, mask = _bucket_padded(out_off, out_sorted, nodes)
        out_nbrs.append(jnp.asarray(nbr))
        out_masks.append(jnp.asarray(mask))

    return FullGraphAdjacency(
        in_nbrs=tuple(in_nbrs), in_masks=tuple(in_masks),
        out_nbrs=tuple(out_nbrs), out_masks=tuple(out_masks),
        inv_pos=jnp.asarray(inv_pos),
        in_deg=jnp.asarray(in_deg), out_deg=jnp.asarray(out_deg),
        num_nodes=int(num_nodes))


def make_nbr_sums(adj: FullGraphAdjacency):
    """(in_sum, out_sum) functions x:(N, d) -> (N, d), each summing masked
    neighbor rows with a scatter-free custom vjp (backward = the transposed
    direction's gather)."""

    def _bucketed_sum(x, nbrs, masks):
        parts = [jnp.sum(jnp.where(m[:, :, None], x[nbr], 0), axis=1)
                 for nbr, m in zip(nbrs, masks)]
        y_sorted = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return y_sorted[adj.inv_pos]  # back to original node order (a gather)

    def _make(nbrs, masks, t_nbrs, t_masks):
        @jax.custom_vjp
        def f(x):
            return _bucketed_sum(x, nbrs, masks)

        def fwd(x):
            return f(x), None

        def bwd(_, u):
            # d/dx_j sum_i sum_{s: nbr[i,s]=j} u_i = sum over the transposed
            # adjacency's row j — a gather, never a scatter
            return (_bucketed_sum(u, t_nbrs, t_masks),)

        f.defvjp(fwd, bwd)
        return f

    in_sum = _make(adj.in_nbrs, adj.in_masks, adj.out_nbrs, adj.out_masks)
    out_sum = _make(adj.out_nbrs, adj.out_masks, adj.in_nbrs, adj.in_masks)
    return in_sum, out_sum
