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

    def from_blocks(blocks, w_stack: Array) -> Array:
        """Transform + aggregate pre-gathered neighbor blocks. Exposed so a
        constant input's gather can be cached once (full_graph_encoder
        _const_first_agg) while W stays live."""
        d_out = w_stack.shape[-1]
        parts = []
        for blk, rids in zip(blocks, rg.rel_ids):
            wb = jnp.take(w_stack, rids, axis=0)     # (n_rel_b, d_in, d_out)
            t = jnp.einsum("ncd,ndo->nco", blk, wb)
            parts.append(t.reshape(-1, d_out))
        t_flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return anchor_sum(t_flat)

    def rel_sum(x: Array, w_stack: Array) -> Array:
        return from_blocks(gather_blocks(x), w_stack)

    rel_sum.gather_blocks = gather_blocks
    rel_sum.from_blocks = from_blocks
    return rel_sum


def host_out_csr(rg: RelFullGraph):
    """Directed out-CSR with per-slot relation ids, ORIGINAL src order:
    (offsets (N+1,) int64, dst (E,) int32, rel (E,) int32). Backs the
    seed-restricted RGCN final stage (full_graph_encoder._seed_rgcn): a
    batch's out-edges come from one searchsorted + gathers, like the
    combined CSR in data/full_graph.py but directional and relational."""
    e = edges_from_rel_graph(rg)
    src = e[:, 0]
    order = np.argsort(src, kind="stable")
    offsets = np.searchsorted(src[order], np.arange(rg.num_nodes + 1))
    return (offsets.astype(np.int64), e[order, 2].astype(np.int32),
            e[order, 1].astype(np.int32))


def device_rel_csr(csr):
    """Device-resident int32 copy of host_out_csr's output."""
    offsets, dst, rel = csr
    assert int(offsets[-1]) < np.iinfo(np.int32).max
    return (jnp.asarray(offsets.astype(np.int32)), jnp.asarray(dst),
            jnp.asarray(rel))


def device_seed_flat_lists_rel(csr_dev, seeds: Array, mask: Array,
                               budget: int, num_nodes: int):
    """Relational twin of data/full_graph.py device_seed_flat_lists: flat
    OUT-edge lists of one seed batch, built in-jit. Returns (flat_nbr,
    flat_rel, flat_seg), all (budget,) int32 — flat_nbr pad = num_nodes
    (zero sentinel row), flat_rel pad = 0, flat_seg pad = batch_size."""
    offsets, nbrs, rels = csr_dev
    b = seeds.shape[0]
    s = jnp.minimum(seeds, num_nodes - 1)
    deg = (offsets[s + 1] - offsets[s]) * mask.astype(jnp.int32)
    cum = jnp.cumsum(deg)
    slots = jnp.arange(budget, dtype=jnp.int32)
    # scatter+cumsum searchsorted (see full_graph.device_seed_flat_lists)
    ind = jnp.zeros((budget + 1,), jnp.int32).at[cum].add(1, mode="drop")
    seg = jnp.cumsum(ind[:budget])
    valid = slots < cum[-1]
    seg_c = jnp.minimum(seg, b - 1)
    start = cum[seg_c] - deg[seg_c]
    idx = jnp.clip(offsets[s[seg_c]] + (slots - start), 0, nbrs.shape[0] - 1)
    flat_nbr = jnp.where(valid, nbrs[idx], num_nodes)
    flat_rel = jnp.where(valid, rels[idx], 0)
    flat_seg = jnp.where(valid, seg_c, b)
    return flat_nbr, flat_rel, flat_seg


def edges_from_rel_graph(rg: RelFullGraph) -> np.ndarray:
    """Recover the (E, 3) [src, rel, dst] edge array from the bucketed
    structure (slot_src + relation buckets) — lets the ring-sharded builder
    run from a RelFullGraph without the caller re-plumbing raw edges."""
    src = np.asarray(rg.slot_src).astype(np.int64)
    dst = np.concatenate(
        [np.asarray(b).reshape(-1) for b in rg.rel_nbr]).astype(np.int64)
    rel = np.concatenate(
        [np.repeat(np.asarray(r), b.shape[1])
         for r, b in zip(rg.rel_ids, rg.rel_nbr)]).astype(np.int64)
    valid = src < rg.num_nodes
    return np.stack([src[valid], rel[valid], dst[valid]], 1)


# --------------------------------------------------------------------------
# Ring-sharded RGCN: node-sharded exact-ALL relational aggregation
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _RingRelCells:
    """One direction's ring schedule. For ring step k, shard s owns the
    ANCHOR side of the cell's edges and gathers values from the visiting
    block (originally shard (s-k) mod S). Relation-bucketed per step with
    shapes UNIFORM across shards (caps maxed over shards), so one compiled
    program serves every shard.

    nbr[k][b]:  (S, n_b, cap) gathered node's LOCAL row in the visiting
                block, pad = n_loc (reads the zero sentinel)
    rel[k][b]:  (n_b,) relation ids (same rows on every shard)
    anch[k][b]: (S, n_b, cap) anchor's LOCAL row, pad = n_loc
    perm[k]:    (S, T_k) anchor-sorted position -> flat (bucket-major) slot,
                pad = T_k (reads the appended zero row)
    seg[k]:     (S, T_k) anchor local row at each sorted position, sorted
                ascending, pad = n_loc (dropped by the segment sum)
    """

    nbr: Tuple[Tuple[Array, ...], ...]
    rel: Tuple[Tuple[Array, ...], ...]
    anch: Tuple[Tuple[Array, ...], ...]
    perm: Tuple[Array, ...]
    seg: Tuple[Array, ...]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedRelGraph:
    """Ring schedules for both flow directions of the RGCN operator.

    fwd: anchor = src (out_i sums over its out-edges' transformed dst rows).
    bwd: anchor = dst (the x-cotangent sums u[src] @ W^T per dst) — the
    directional operator is NOT symmetric, so the backward needs its own
    schedule (unlike full_graph_sharded's combined-symmetric neighbor sum).
    """

    fwd: _RingRelCells
    bwd: _RingRelCells
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_shards: int = dataclasses.field(metadata=dict(static=True))
    n_loc: int = dataclasses.field(metadata=dict(static=True))


def _build_ring_cells(anchor: np.ndarray, gathered: np.ndarray,
                      rel: np.ndarray, num_rels: int,
                      num_shards: int, n_loc: int) -> _RingRelCells:
    s = num_shards
    a_own, a_loc = anchor // n_loc, anchor % n_loc
    g_own, g_loc = gathered // n_loc, gathered % n_loc
    step = ((a_own - g_own) % s).astype(np.int64)

    # one global stable sort by (step, anchor shard, relation); every cell
    # is then a contiguous run — O(E log E) total, not O(s^2 R E) masking
    key = (step * s + a_own) * num_rels + rel
    order = np.argsort(key, kind="stable")
    off = np.searchsorted(key[order], np.arange(s * s * num_rels + 1))
    g_l, a_l = g_loc[order], a_loc[order]

    nbr_all, rel_all, anch_all, perm_all, seg_all = [], [], [], [], []
    for k in range(s):
        o0 = k * s * num_rels
        cnt = (off[o0 + 1:o0 + s * num_rels + 1]
               - off[o0:o0 + s * num_rels]).reshape(s, num_rels)
        maxcnt = cnt.max(axis=0)
        active = np.flatnonzero(maxcnt > 0)
        if len(active) == 0:
            nbr_all.append(())
            rel_all.append(())
            anch_all.append(())
            perm_all.append(jnp.zeros((s, 0), jnp.int32))
            seg_all.append(jnp.zeros((s, 0), jnp.int32))
            continue
        rows_order = active[np.argsort(maxcnt[active], kind="stable")]
        bounds = _greedy_buckets(maxcnt[rows_order])

        nbr_k, rel_k, anch_k = [], [], []
        slot_lists = [[] for _ in range(s)]   # (flat_slot, anchor_local)
        base = 0
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            rows = rows_order[lo:hi]
            cap = max(int(maxcnt[rows].max()), 1)
            n_b = len(rows)
            nbr_b = np.full((s, n_b, cap), n_loc, np.int32)
            anch_b = np.full((s, n_b, cap), n_loc, np.int32)
            for sh in range(s):
                for i, r in enumerate(rows):
                    c = int(cnt[sh, r])
                    if c == 0:
                        continue
                    e0 = off[o0 + sh * num_rels + r]
                    nbr_b[sh, i, :c] = g_l[e0:e0 + c]
                    anch_b[sh, i, :c] = a_l[e0:e0 + c]
                    slots = base + i * cap + np.arange(c, dtype=np.int64)
                    slot_lists[sh].append(
                        (slots, a_l[e0:e0 + c].astype(np.int64)))
            nbr_k.append(jnp.asarray(nbr_b))
            anch_k.append(jnp.asarray(anch_b))
            rel_k.append(jnp.asarray(rows.astype(np.int32)))
            base += n_b * cap
        t_k = base

        perm_k = np.full((s, t_k), t_k, np.int32)
        seg_k = np.full((s, t_k), n_loc, np.int32)
        for sh in range(s):
            if not slot_lists[sh]:
                continue
            slots = np.concatenate([p[0] for p in slot_lists[sh]])
            anchs = np.concatenate([p[1] for p in slot_lists[sh]])
            o = np.lexsort((slots, anchs))
            perm_k[sh, :len(slots)] = slots[o]
            seg_k[sh, :len(slots)] = anchs[o]
        nbr_all.append(tuple(nbr_k))
        rel_all.append(tuple(rel_k))
        anch_all.append(tuple(anch_k))
        perm_all.append(jnp.asarray(perm_k))
        seg_all.append(jnp.asarray(seg_k))

    return _RingRelCells(nbr=tuple(nbr_all), rel=tuple(rel_all),
                         anch=tuple(anch_all), perm=tuple(perm_all),
                         seg=tuple(seg_all))


def build_sharded_rel_graph(edges: np.ndarray, num_nodes: int,
                            num_shards: int) -> ShardedRelGraph:
    """Build both ring schedules from an (E, 3) [src, rel, dst] array. Node
    rows use the same layout as ShardedFullGraph: node i on shard i//n_loc
    at local row i%n_loc, n_loc = ceil(N/S)."""
    e = np.asarray(edges)
    src = e[:, 0].astype(np.int64)
    dst = e[:, -1].astype(np.int64)
    rel = (e[:, 1].astype(np.int64) if e.shape[1] >= 3
           else np.zeros(len(e), np.int64))
    num_rels = int(rel.max()) + 1 if len(rel) else 1
    n_loc = -(-num_nodes // num_shards)
    fwd = _build_ring_cells(src, dst, rel, num_rels, num_shards, n_loc)
    bwd = _build_ring_cells(dst, src, rel, num_rels, num_shards, n_loc)
    return ShardedRelGraph(fwd=fwd, bwd=bwd, num_nodes=int(num_nodes),
                           num_shards=int(num_shards), n_loc=int(n_loc))


def make_rel_sum_sharded(srg: ShardedRelGraph, mesh, axis: str):
    """Ring-sharded twin of make_rel_sum: (S*n_loc, d_in) row-sharded x and
    replicated (R, d_in, d_out) W -> row-sharded per-node out-edge sums.

    Forward rotates the x block; each step transforms the visiting cell's
    relation buckets (batched einsum) and segment-sums into the local
    accumulator. Backward (custom vjp) rotates x AND the upstream cotangent
    together: the visiting-x cells yield the W grad (psum'd over the ring),
    the visiting-u cells yield the x grad via the transposed schedule."""
    from jax.sharding import PartitionSpec as P

    s, n_loc = srg.num_shards, srg.n_loc
    ring = [(i, (i + 1) % s) for i in range(s)]

    def _spec(a):
        return P(axis, *([None] * (a.ndim - 1))) if a.ndim > 1 else P()

    specs_fwd = jax.tree.map(_spec, srg.fwd)
    specs_bwd = jax.tree.map(_spec, srg.bwd)

    def _pad(b):
        return jnp.concatenate([b, jnp.zeros((1, b.shape[1]), b.dtype)], 0)

    def _cell_sums(cells, k, blk_pad, w, transpose, d_res, dtype):
        """One cell's per-anchor sums: gather visiting rows, transform by
        W (or W^T), reorder anchor-sorted, sorted segment-sum."""
        parts = []
        for b in range(len(cells.nbr[k])):
            rows = blk_pad[cells.nbr[k][b][0]]       # (n_b, cap, d)
            wb = w[cells.rel[k][b]]                  # (n_b, d_in, d_out)
            eq = "nco,ndo->ncd" if transpose else "ncd,ndo->nco"
            t = jnp.einsum(eq, rows, wb)
            parts.append(t.reshape(-1, d_res))
        if not parts:
            return jnp.zeros((n_loc, d_res), dtype)
        t_flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        t_pad = jnp.concatenate(
            [t_flat, jnp.zeros((1, d_res), t_flat.dtype)], 0)
        return jax.ops.segment_sum(
            t_pad[cells.perm[k][0]], cells.seg[k][0],
            num_segments=n_loc + 1, indices_are_sorted=True)[:n_loc]

    def fwd_local(x_loc, w, cells):
        d_out = w.shape[-1]
        acc = jnp.zeros((n_loc, d_out), x_loc.dtype)
        block = x_loc
        for k in range(s):
            acc = acc + _cell_sums(cells, k, _pad(block), w,
                                   False, d_out, x_loc.dtype)
            if k + 1 < s:
                block = jax.lax.ppermute(block, axis, ring)
        return acc

    def bwd_local(x_loc, u_loc, w, cells_f, cells_b):
        d_in, d_out = w.shape[-2], w.shape[-1]
        dx = jnp.zeros((n_loc, d_in), x_loc.dtype)
        dw = jnp.zeros_like(w)
        u_loc_pad = _pad(u_loc)
        xb, ub = x_loc, u_loc
        for k in range(s):
            xb_pad, ub_pad = _pad(xb), _pad(ub)
            # W grad from the forward schedule: xs visiting, u local
            for b in range(len(cells_f.nbr[k])):
                xs = xb_pad[cells_f.nbr[k][b][0]]        # (n_b, cap, d_in)
                us = u_loc_pad[cells_f.anch[k][b][0]]    # (n_b, cap, d_out)
                dw = dw.at[cells_f.rel[k][b]].add(
                    jnp.einsum("ncd,nco->ndo", xs, us))
            # x grad from the transposed schedule: u visiting, anchor = dst
            dx = dx + _cell_sums(cells_b, k, ub_pad, w,
                                 True, d_in, x_loc.dtype)
            if k + 1 < s:
                xb = jax.lax.ppermute(xb, axis, ring)
                ub = jax.lax.ppermute(ub, axis, ring)
        return dx, jax.lax.psum(dw, axis)

    fwd_sm = jax.shard_map(
        fwd_local, mesh=mesh,
        in_specs=(P(axis, None), P(), specs_fwd),
        out_specs=P(axis, None), check_vma=False)
    bwd_sm = jax.shard_map(
        bwd_local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), specs_fwd, specs_bwd),
        out_specs=(P(axis, None), P()), check_vma=False)

    @jax.custom_vjp
    def rel_sum(x, w):
        return fwd_sm(x, w, srg.fwd)

    def f(x, w):
        return rel_sum(x, w), (x, w)

    def b(res, u):
        x, w = res
        return bwd_sm(x, u, w, srg.fwd, srg.bwd)

    rel_sum.defvjp(f, b)
    return rel_sum
