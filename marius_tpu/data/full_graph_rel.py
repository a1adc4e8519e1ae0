"""Relational full-graph structure: exact-ALL RGCN, TPU-first.

The sampled RGCN layer (nn/layers/layers.py rgcn_layer; reference
rgcn_layer.cpp) computes, for anchor i with out-edges (i, r, j):

    out_i = mean_e( x_j @ W_{r_e} ) + x_i @ W_self

Under unbounded ALL sampling the mean runs over ALL out-edges. The
full-graph twin here computes that for every node at once with zero
scatters, extending data/full_graph.py's recipe to a relation-dependent,
DIRECTIONAL operator (the combined-symmetric trick does not apply because
each slot is transformed by its own relation matrix before aggregation):

- **Relation-bucketed batched matmul.** Edges are grouped by relation;
  relations are count-sorted and greedily bucketed (same `_greedy_buckets`
  policy as the degree buckets), each bucket padded to its max count. One
  bucket's transform is a single (n_rel, cap, d_in) x (n_rel, d_in, d_out)
  batched einsum — pure MXU work, no per-edge W gather (the reference bmm's
  one matrix per neighbor slot, rgcn_layer.cpp).
- **Sentinel padding.** Padding slots gather the zero row of x, so they
  transform to zeros and vanish from every sum — no masks anywhere.
- **Three custom-vjp gathers, no scatter.** (1) slot gather x -> blocks
  backs through a per-node inverse occurrence map (bucketed gather-sum);
  (2) transformed-slot -> per-anchor sum backs through the slot->anchor
  row map (a plain gather, since each slot belongs to exactly one anchor);
  (3) the W row gather per bucket backs through a tiny <=R-row scatter —
  the only scatter, over relation count, not edge count.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.full_graph import _greedy_buckets

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RelFullGraph:
    """Relation- and anchor-bucketed views of one directed edge set.

    Flat slot space: relation buckets flattened bucket-major, row-major;
    ``total_slots`` = sum of n_b*cap_b over relation buckets. A slot is one
    (possibly padding) out-edge.
    """

    # relation buckets: slot -> neighbor (dst) node id, pad = num_nodes
    rel_nbr: Tuple[Array, ...]        # per bucket (n_rel_b, cap_b) int32
    rel_ids: Tuple[Array, ...]        # per bucket (n_rel_b,) int32 W rows
    # anchor buckets (out-degree-sorted nodes): slot indices to sum,
    # pad = total_slots (reads the appended zero row of the transformed flat)
    anchor_slots: Tuple[Array, ...]   # per bucket (n_b, capA_b) int32
    anchor_inv_pos: Array             # (N,) original id -> sorted anchor row
    # backward maps
    slot_src: Array                   # (T,) int32 anchor ORIGINAL id, pad = N
    occ_slots: Tuple[Array, ...]      # per bucket (n_b, capO_b) int32, pad = T
    occ_inv_pos: Array                # (N,) original id -> sorted occ row
    out_deg: Array                    # (N,) int32
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    total_slots: int = dataclasses.field(metadata=dict(static=True))


def _bucketize_groups(group_of_item: np.ndarray, item_vals: np.ndarray,
                      num_groups: int, pad_val: int):
    """Shared builder: per-group padded value lists, groups sorted ascending
    by size and greedily bucketed. Returns (buckets, group_row_ids, inv_pos)
    where ``group_row_ids[b]`` are the ORIGINAL group ids of bucket b's rows
    and ``inv_pos`` maps group id -> global sorted row."""
    counts = np.bincount(group_of_item, minlength=num_groups).astype(np.int64)
    order = np.argsort(group_of_item, kind="stable")
    vals_sorted = item_vals[order]
    offsets = np.searchsorted(group_of_item[order], np.arange(num_groups + 1))

    perm = np.argsort(counts, kind="stable")
    inv_pos = np.empty(num_groups, np.int32)
    inv_pos[perm] = np.arange(num_groups, dtype=np.int32)
    bounds = _greedy_buckets(counts[perm])

    buckets, row_ids = [], []
    for s, t in zip(bounds[:-1], bounds[1:]):
        groups = perm[s:t]
        c = counts[groups]
        cap = max(int(c.max()) if len(c) else 0, 1)
        blk = np.full((len(groups), cap), pad_val, np.int32)
        rows = np.repeat(np.arange(len(groups)), c)
        cols = np.arange(int(c.sum())) - np.repeat(np.cumsum(c) - c, c)
        blk[rows, cols] = vals_sorted[np.repeat(offsets[groups], c) + cols]
        buckets.append(blk)
        row_ids.append(groups.astype(np.int32))
    return buckets, row_ids, inv_pos


def build_rel_full_graph(edges: np.ndarray, num_nodes: int) -> RelFullGraph:
    """Build from an (E, 3) [src, rel, dst] (or (E, 2) -> all relation 0)
    edge array."""
    e = np.asarray(edges)
    src = e[:, 0].astype(np.int64)
    dst = e[:, -1].astype(np.int64)
    rel = (e[:, 1].astype(np.int64) if e.shape[1] >= 3
           else np.zeros(len(e), np.int64))
    num_rels = int(rel.max()) + 1 if len(rel) else 1

    # --- relation buckets over dst values; remember each edge's flat slot
    rel_buckets, rel_row_ids, _ = _bucketize_groups(
        rel, dst.astype(np.int32), num_rels, pad_val=num_nodes)

    # flat slot index of every real edge, in the bucketization's edge order
    slot_src = []
    slot_of_edge_sorted = []           # aligned with rel-stable-sorted edges
    base = 0
    counts = np.bincount(rel, minlength=num_rels).astype(np.int64)
    perm_r = np.argsort(counts, kind="stable")
    order_e = np.argsort(rel, kind="stable")
    offsets_e = np.searchsorted(rel[order_e], np.arange(num_rels + 1))
    for blk, rows in zip(rel_buckets, rel_row_ids):
        n_b, cap = blk.shape
        s_blk = np.full((n_b, cap), num_nodes, np.int64)
        for i, r in enumerate(rows):
            c = int(counts[r])
            eidx = order_e[offsets_e[r]:offsets_e[r] + c]
            s_blk[i, :c] = src[eidx]
            slot_of_edge_sorted.append(
                (eidx, base + i * cap + np.arange(c, dtype=np.int64)))
        slot_src.append(s_blk.reshape(-1))
        base += n_b * cap
    total_slots = base
    slot_src = np.concatenate(slot_src) if slot_src else np.empty(0, np.int64)

    assert total_slots < np.iinfo(np.int32).max, \
        "relational full graph exceeds int32 slots; use the sampled path"

    # per-edge flat slot, in ORIGINAL edge order
    edge_slot = np.empty(len(e), np.int64)
    for eidx, slots in slot_of_edge_sorted:
        edge_slot[eidx] = slots

    # --- anchor buckets: each src sums its own edges' transformed slots
    anchor_buckets, _, anchor_inv = _bucketize_groups(
        src, edge_slot, num_nodes, pad_val=total_slots)

    # --- occurrence buckets: each dst's slots (for the x-gather backward)
    occ_buckets, _, occ_inv = _bucketize_groups(
        dst, edge_slot, num_nodes, pad_val=total_slots)

    out_deg = np.bincount(src, minlength=num_nodes).astype(np.int32)

    return RelFullGraph(
        rel_nbr=tuple(jnp.asarray(b) for b in rel_buckets),
        rel_ids=tuple(jnp.asarray(r) for r in rel_row_ids),
        anchor_slots=tuple(jnp.asarray(b) for b in anchor_buckets),
        anchor_inv_pos=jnp.asarray(anchor_inv),
        slot_src=jnp.asarray(slot_src.astype(np.int32)),
        occ_slots=tuple(jnp.asarray(b) for b in occ_buckets),
        occ_inv_pos=jnp.asarray(occ_inv),
        out_deg=jnp.asarray(out_deg),
        num_nodes=int(num_nodes), total_slots=int(total_slots))


def make_rel_sum(rg: RelFullGraph):
    """Returns ``rel_sum(x, w_stack) -> (N, d_out)``: for every node, the SUM
    over its out-edges of x[dst] @ W[rel] (the caller divides by out-degree
    for the RGCN mean). Scatter-free in everything edge-sized."""
    from marius_tpu.ops.pallas import gather_sum_auto

    @jax.custom_vjp
    def gather_blocks(x):
        x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], 0)
        return tuple(x_pad[nbr] for nbr in rg.rel_nbr)

    def gb_fwd(x):
        return gather_blocks(x), None

    def gb_bwd(_, u_blocks):
        d = u_blocks[0].shape[-1]
        flat_u = jnp.concatenate(
            [u.reshape(-1, d) for u in u_blocks]
            + [jnp.zeros((1, d), u_blocks[0].dtype)], 0)
        parts = [gather_sum_auto(flat_u, occ) for occ in rg.occ_slots]
        g_sorted = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return (g_sorted[rg.occ_inv_pos],)

    gather_blocks.defvjp(gb_fwd, gb_bwd)

    @jax.custom_vjp
    def anchor_sum(t_flat):
        t_pad = jnp.concatenate(
            [t_flat, jnp.zeros((1, t_flat.shape[1]), t_flat.dtype)], 0)
        parts = [gather_sum_auto(t_pad, a) for a in rg.anchor_slots]
        s_sorted = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return s_sorted[rg.anchor_inv_pos]

    def as_fwd(t_flat):
        return anchor_sum(t_flat), None

    def as_bwd(_, u):
        # each slot feeds exactly one anchor's sum: d_t[slot] = u[src(slot)]
        u_pad = jnp.concatenate([u, jnp.zeros((1, u.shape[1]), u.dtype)], 0)
        return (u_pad[rg.slot_src],)

    anchor_sum.defvjp(as_fwd, as_bwd)

    def rel_sum(x: Array, w_stack: Array) -> Array:
        blocks = gather_blocks(x)
        d_out = w_stack.shape[-1]
        parts = []
        for blk, rids in zip(blocks, rg.rel_ids):
            wb = jnp.take(w_stack, rids, axis=0)     # (n_rel_b, d_in, d_out)
            t = jnp.einsum("ncd,ndo->nco", blk, wb)
            parts.append(t.reshape(-1, d_out))
        t_flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return anchor_sum(t_flat)

    return rel_sum
