"""Node-sharded full-graph aggregation: ring collective-permute pipelining.

Multi-chip twin of data/full_graph.py's exact-ALL neighbor sum — the
"boundary node exchange = collective_permute pipelining" design (the graph
analogue of ring attention) that replaces the reference's host-RAM hogwild
scale-out (buffer.cpp:460 indexAdd + model.cpp:136-159 all_reduce). Node
rows (activations, features, degrees) are sharded over a mesh axis in
original id order; each layer's combined (in+out) neighbor sum runs as an
S-step ring:

  step k: every shard aggregates the edge block whose SOURCES live on shard
          (s - k) mod S — a flat local-id gather + segment_sum over only
          that block's edges — then `lax.ppermute` rotates the activation
          block one hop around the ring.

Total exchanged bytes per layer = (S-1)/S of the activation matrix (the
minimum for a graph with arbitrary cross-shard edges), overlapped with the
local aggregation of the previous block. Per-shard compute touches exactly
its own 2E/S edge endpoints — no replication, no scatter: the combined
multiset is symmetric, so the vjp of the whole ring op is the SAME ring op
on the upstream gradient (one custom_vjp, no transposed structure).

HBM per chip is O(N/S · d + max block), so graphs whose activations exceed
one chip's HBM train exactly (no sampling truncation) across the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedFullGraph:
    """Ring-scheduled edge blocks for an S-way node sharding.

    Row layout: node i lives on shard i // n_loc at local row i % n_loc,
    n_loc = ceil(N/S); ids in [N, S*n_loc) are padding rows (zero, degree 0).

    ``flat_nbr[k]`` / ``flat_seg[k]``: (S, cap_k) int32, dim 0 sharded over
    the mesh axis. Shard s's row holds the edges whose destination is owned
    by s and whose source is owned by t = (s-k) mod S: ``flat_nbr`` is the
    source's LOCAL row in t's block (pad = n_loc, reads the zero sentinel),
    ``flat_seg`` the destination's local row (pad = n_loc, dropped by the
    segment sum). Within a shard's row, slots are destination-major (CSR
    order), so segment ids are sorted.
    """

    flat_nbr: Tuple[Array, ...]   # per ring step: (S, cap_k) int32
    flat_seg: Tuple[Array, ...]   # per ring step: (S, cap_k) int32
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_shards: int = dataclasses.field(metadata=dict(static=True))
    n_loc: int = dataclasses.field(metadata=dict(static=True))

    @property
    def padded_nodes(self) -> int:
        return self.num_shards * self.n_loc


def build_sharded_full_graph(edges: np.ndarray, num_nodes: int,
                             num_shards: int,
                             pad_multiple: int = 128) -> ShardedFullGraph:
    """Split the combined (in+out) edge multiset into the S x S ring blocks.

    Exact slot counts per block (flat CSR, no per-row padding); each ring
    step's blocks are padded to the step's max across shards (+ rounded to
    ``pad_multiple``) so one compiled program serves every shard."""
    e = np.asarray(edges)
    src = e[:, 0].astype(np.int64)
    dst = e[:, -1].astype(np.int64)
    # combined symmetric multiset: every edge contributes both directions
    a = np.concatenate([dst, src])   # anchor (destination of the sum)
    o = np.concatenate([src, dst])   # other  (gathered source)
    return _build_from_pairs(a, o, num_nodes, num_shards, pad_multiple)


def build_sharded_from_csr(offsets: np.ndarray, nbrs: np.ndarray,
                           num_nodes: int, num_shards: int,
                           pad_multiple: int = 128) -> ShardedFullGraph:
    """Same, from an already-combined symmetric CSR (e.g.
    data/full_graph.py host_csr_from_adjacency's output)."""
    deg = np.diff(np.asarray(offsets)).astype(np.int64)
    a = np.repeat(np.arange(num_nodes, dtype=np.int64), deg)
    o = np.asarray(nbrs).astype(np.int64)
    return _build_from_pairs(a, o, num_nodes, num_shards, pad_multiple)


def _build_from_pairs(a: np.ndarray, o: np.ndarray, num_nodes: int,
                      num_shards: int, pad_multiple: int) -> ShardedFullGraph:
    s = num_shards
    n_loc = -(-num_nodes // s)

    a_shard, a_local = a // n_loc, a % n_loc
    o_shard, o_local = o // n_loc, o % n_loc
    step = (a_shard - o_shard) % s

    # destination-major order within each (step, anchor-shard) block
    order = np.lexsort((a_local, a_shard, step))
    a_shard, a_local = a_shard[order], a_local[order]
    o_local, step = o_local[order], step[order]

    flat_nbr, flat_seg = [], []
    for k in range(s):
        in_k = step == k
        caps = np.bincount(a_shard[in_k], minlength=s)
        cap = int(caps.max()) if caps.size else 0
        cap = max(-(-max(cap, 1) // pad_multiple) * pad_multiple, pad_multiple)
        nbr = np.full((s, cap), n_loc, np.int32)
        seg = np.full((s, cap), n_loc, np.int32)
        for sh in range(s):
            m = in_k & (a_shard == sh)
            cnt = int(m.sum())
            nbr[sh, :cnt] = o_local[m]
            seg[sh, :cnt] = a_local[m]
        flat_nbr.append(jnp.asarray(nbr))
        flat_seg.append(jnp.asarray(seg))

    return ShardedFullGraph(
        flat_nbr=tuple(flat_nbr), flat_seg=tuple(flat_seg),
        num_nodes=int(num_nodes), num_shards=s, n_loc=n_loc)


def shard_rows(x: np.ndarray, graph: ShardedFullGraph, mesh, axis: str):
    """Pad a (N, d) host array to (S*n_loc, d) and place it row-sharded over
    ``axis`` (padding rows zero; process-spanning meshes supported)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from marius_tpu.parallel.mesh import put_global
    n, d = x.shape
    pad = np.zeros((graph.padded_nodes, d), x.dtype)
    pad[:n] = x
    return put_global(pad, NamedSharding(mesh, P(axis, None)))


def place_on_mesh(graph, mesh, axis: str):
    """Re-place a ring structure's arrays for a mesh that may span
    PROCESSES: leading-S arrays shard over ``axis``, 1-D arrays replicate.
    Works for ShardedFullGraph and ShardedRelGraph alike (any pytree of
    arrays whose sharded dim is the leading one). Single-process this is a
    no-op (shard_map re-shards on dispatch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from marius_tpu.parallel.mesh import put_global
    if jax.process_count() == 1:
        return graph

    def place(a):
        spec = (P(axis, *([None] * (a.ndim - 1))) if a.ndim > 1 else P())
        return put_global(np.asarray(a), NamedSharding(mesh, spec))

    return jax.tree.map(place, graph)


def make_nbr_sum_sharded(graph: ShardedFullGraph, mesh, axis: str):
    """Returns ``nbr_sum``: (S*n_loc, d) row-sharded -> same, the combined
    neighbor sum, computed as the S-step ppermute ring. Symmetric operator:
    custom vjp = the same ring on the upstream gradient."""
    from jax.sharding import PartitionSpec as P

    s, n_loc = graph.num_shards, graph.n_loc
    perm = [(i, (i + 1) % s) for i in range(s)]

    def ring_local(x_loc, nbrs, segs):
        # x_loc/nbrs/segs: this shard's (n_loc, d) block and (1, cap_k) rows
        acc = jnp.zeros_like(x_loc)
        block = x_loc
        for k in range(s):
            blk_pad = jnp.concatenate(
                [block, jnp.zeros((1, block.shape[1]), block.dtype)], 0)
            vals = blk_pad[nbrs[k][0]]                       # (cap_k, d)
            acc = acc + jax.ops.segment_sum(
                vals, segs[k][0], num_segments=n_loc + 1,
                indices_are_sorted=True)[:n_loc]
            if k + 1 < s:
                block = jax.lax.ppermute(block, axis, perm)
        return acc

    ring = jax.shard_map(
        ring_local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None), check_vma=False)

    @jax.custom_vjp
    def nbr_sum(x):
        return ring(x, graph.flat_nbr, graph.flat_seg)

    def fwd(x):
        return nbr_sum(x), None

    def bwd(_, u):
        # (A x)^T vjp = A^T u = A u: the combined multiset is symmetric
        return (ring(u, graph.flat_nbr, graph.flat_seg),)

    nbr_sum.defvjp(fwd, bwd)
    return nbr_sum


def make_gat_ring(graph: ShardedFullGraph, mesh, axis: str):
    """Ring-sharded GAT attention aggregation (nn/full_graph_encoder._sharded_gat).

    GAT slot logits decompose as leaky(L_i + R_j) with L = a_l.(Wx) anchored
    and R = a_r.(Wx) source-side, so only the small (n_loc, h) R block and
    the (n_loc, h*hd) value block rotate around the ring — two passes:

      max pass:  m_i = max_j leaky(L_i + R_j)       (rotates R only)
      sum pass:  denom_i = sum_j exp(l_ij - m_i),
                 numer_i = sum_j e_ij * t_j          (rotates R and t)

    Attention dropout masks e in the NUMERATOR only (the single-device path
    drops normalized alphas, leaving the denominator full — gat_layer
    semantics); keys fold (shard, step) so slots draw independent bits.

    Returns (ring_max, ring_sum):
      ring_max(l_vec, r_vec, slope) -> (N', h) neighbor-logit max
      ring_sum(l_vec, r_vec, t, m, slope, drop_rate, drop_key) ->
          ((N', h) denom, (N', h*hd) numer); drop_key None disables dropout.
    """
    from jax.sharding import PartitionSpec as P

    s, n_loc = graph.num_shards, graph.n_loc
    perm = [(i, (i + 1) % s) for i in range(s)]

    def _pad(b):
        return jnp.concatenate([b, jnp.zeros((1, b.shape[1]), b.dtype)], 0)

    def ring_max(l_vec, r_vec, slope):
        def local(l_loc, r_loc, nbrs, segs):
            l_pad = _pad(l_loc)
            m = jnp.full(l_loc.shape, -jnp.inf, l_loc.dtype)
            block = r_loc
            for k in range(s):
                vr = _pad(block)[nbrs[k][0]]                    # (cap, h)
                lg = jax.nn.leaky_relu(l_pad[segs[k][0]] + vr, slope)
                m = jnp.maximum(m, jax.ops.segment_max(
                    lg, segs[k][0], num_segments=n_loc + 1,
                    indices_are_sorted=True)[:n_loc])
                if k + 1 < s:
                    block = jax.lax.ppermute(block, axis, perm)
            return m

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None),
                      P(axis, None)),
            out_specs=P(axis, None), check_vma=False)(
            l_vec, r_vec, graph.flat_nbr, graph.flat_seg)

    def ring_sum(l_vec, r_vec, t, m, slope, drop_rate=0.0, drop_key=None):
        h = l_vec.shape[1]

        def local(l_loc, r_loc, t_loc, m_loc, key_loc, nbrs, segs):
            l_pad, m_pad = _pad(l_loc), _pad(m_loc)
            denom = jnp.zeros((n_loc, h), t_loc.dtype)
            numer = jnp.zeros((n_loc, t_loc.shape[1]), t_loc.dtype)
            rb, tb = r_loc, t_loc
            shard = jax.lax.axis_index(axis)
            for k in range(s):
                seg = segs[k][0]
                vr = _pad(rb)[nbrs[k][0]]                       # (cap, h)
                vt = _pad(tb)[nbrs[k][0]]                       # (cap, h*hd)
                lg = jax.nn.leaky_relu(l_pad[seg] + vr, slope)
                e = jnp.exp(lg - m_pad[seg])                    # (cap, h)
                denom = denom + jax.ops.segment_sum(
                    e, seg, num_segments=n_loc + 1,
                    indices_are_sorted=True)[:n_loc]
                e_num = e
                if drop_key is not None and drop_rate > 0.0:
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(key_loc[0], shard * s + k),
                        1.0 - drop_rate, e.shape)
                    e_num = jnp.where(keep, e / (1.0 - drop_rate), 0.0)
                hd = vt.shape[1] // h
                weighted = (e_num[:, :, None]
                            * vt.reshape(-1, h, hd)).reshape(-1, h * hd)
                numer = numer + jax.ops.segment_sum(
                    weighted, seg, num_segments=n_loc + 1,
                    indices_are_sorted=True)[:n_loc]
                if k + 1 < s:
                    rb = jax.lax.ppermute(rb, axis, perm)
                    tb = jax.lax.ppermute(tb, axis, perm)
            return denom, numer

        if drop_key is None:
            drop_key = jax.random.key(0)   # unused branch, shape placeholder
            drop_rate = 0.0
        keys = jnp.broadcast_to(drop_key, (s,))
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None),
                      P(axis, None), P(axis), P(axis, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None)), check_vma=False)(
            l_vec, r_vec, t, m, keys, graph.flat_nbr, graph.flat_seg)

    return ring_max, ring_sum
