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

Design choices, each measured on v5e at ogbn-arxiv scale:

- **One symmetrized structure.** The supported aggregation layers
  (GraphSAGE GCN/MEAN, GCN) only ever consume ``in_sum + out_sum``, so the
  adjacency stores each node's in- and out-neighbors as ONE combined padded
  list. The combined neighbor multiset is symmetric (i appears in j's list
  exactly as often as j in i's), so the aggregation operator is
  self-transposed: its vjp is the SAME gather-sum — no second structure, no
  scatter in the backward (v5e scatters serialize at ~7ns/row).
- **Greedy degree bucketing.** Nodes are permuted into ascending-degree
  buckets, each padded to its own max degree (bucket closes when padding
  waste would exceed ~15% and it has enough rows to amortize a kernel).
  Total padded slots stay within ~1.1x of 2E even on power-law graphs — a
  13k-degree hub costs one small bucket, not N x 13k of padding.
- **Sentinel padding, no mask select.** Padding slots point at a zero
  sentinel row (id N), so each bucket is a pure gather + reduce with no
  `where` — one fewer elementwise pass over the gathered block.
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
    """Bucketed padded combined (in+out) neighbor lists for ALL nodes.

    Nodes are reordered ascending by total degree; bucket ``b`` occupies
    sorted rows [starts[b], starts[b] + nbrs[b].shape[0]). ``inv_pos[i]`` is
    node i's row in sorted order, so original-order outputs are one gather
    away. Neighbor ids are ORIGINAL node ids; padding slots hold ``N`` (the
    caller's gather source appends a zero sentinel row). The combined
    multiset is symmetric, so the masked sum operator equals its transpose.
    """

    nbrs: Tuple[Array, ...]      # per bucket: (n_b, cap_b) int32, pad id = N
    inv_pos: Array               # (N,) int32: original id -> sorted row
    in_deg: Array                # (N,) int32, original order
    out_deg: Array               # (N,) int32, original order
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    # Inverse occurrence map (build_inverse_map): same bucket shapes as
    # ``nbrs``; row r slot t = flat slot index (bucket-major) of the t-th
    # occurrence of node perm[r] as a neighbor, pad = total_slots. Lets the
    # vjp of "gather neighbor blocks" be ANOTHER bucketed gather (symmetry
    # pairs each node's occurrences with its own slots) — needed by
    # per-slot-weighted layers (GAT) whose backward is not the plain sum.
    inv_map: Optional[Tuple[Array, ...]] = None
    # Relational companion (data/full_graph_rel.py RelFullGraph): the
    # DIRECTIONAL, per-relation view RGCN stages aggregate over. Built when
    # the encoder has RGCN layers (build_full_graph_adjacency
    # with_relations=True); None otherwise.
    rel: Optional[object] = None
    # Locality relabeling (build_full_graph_adjacency locality_reorder=True):
    # neighbor slots index a reverse-Cuthill-McKee-PERMUTED copy of x instead
    # of x itself, so the big bucketed gathers touch HBM-adjacent rows
    # (power-law graphs scatter original ids arbitrarily). loc_perm[p] = the
    # ORIGINAL id at locality position p. Internal to the neighbor-sum path:
    # inputs/outputs stay in original order (make_nbr_sums permutes via a
    # gather-only custom-vjp pair). Plain SAGE/GCN aggregation only.
    loc_perm: Optional[Array] = None

    @property
    def total_slots(self) -> int:
        return sum(int(np.prod(a.shape)) for a in self.nbrs)

    @property
    def bucket_starts(self) -> Tuple[int, ...]:
        out, s = [], 0
        for b in self.nbrs:
            out.append(s)
            s += b.shape[0]
        return tuple(out)


def _greedy_buckets(deg_sorted: np.ndarray, waste: float = 1.15,
                    max_buckets: int = 40) -> np.ndarray:
    """Split an ascending degree sequence into bucket boundaries. A bucket
    closes when its max/min degree ratio exceeds ``waste``; then the
    cheapest adjacent pairs (least added padding) are merged until at most
    ``max_buckets`` remain, so a lone hub never forces wide padding onto a
    block of low-degree rows."""
    n = len(deg_sorted)
    bounds = [0]
    i = 0
    while i < n:
        lo = max(int(deg_sorted[i]), 1)
        j = int(np.searchsorted(deg_sorted, lo * waste, side="right"))
        i = min(max(j, i + 1), n)
        bounds.append(i)
    bounds = np.asarray(bounds, np.int64)
    while len(bounds) - 1 > max_buckets:
        caps = np.maximum(deg_sorted[bounds[1:] - 1], 1)
        rows = np.diff(bounds)
        merge_cost = rows[:-1] * (caps[1:] - caps[:-1])
        k = int(np.argmin(merge_cost))
        bounds = np.delete(bounds, k + 1)
    return bounds


def build_full_graph_adjacency(
        edges: np.ndarray, num_nodes: int,
        max_degree_limit: Optional[int] = None,
        with_relations: bool = False,
        locality_reorder: bool = False) -> Optional[FullGraphAdjacency]:
    """Build the bucketed symmetric adjacency. Bucketing bounds padding
    waste, so arbitrary hub degrees are fine; ``max_degree_limit`` is kept
    for API compatibility and ignored. ``with_relations`` additionally
    builds the directional per-relation companion RGCN stages need.
    ``locality_reorder`` relabels the GATHER SOURCE by reverse Cuthill-McKee
    so neighbor gathers touch HBM-adjacent rows (see loc_perm)."""
    del max_degree_limit
    e = np.asarray(edges)
    if len(e) == 0 or num_nodes == 0:
        return None
    src = e[:, 0].astype(np.int64)
    dst = e[:, -1].astype(np.int64)
    # combined multiset: anchor sees BOTH directions (self-transpose)
    anchor = np.concatenate([dst, src])
    other = np.concatenate([src, dst]).astype(np.int32)
    order = np.argsort(anchor, kind="stable")
    nbrs_sorted = other[order]
    offsets = np.searchsorted(anchor[order], np.arange(num_nodes + 1))

    loc_perm = None
    if locality_reorder:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        m = sp.csr_matrix(
            (np.ones(len(anchor), np.int8), (anchor, other.astype(np.int64))),
            shape=(num_nodes, num_nodes))
        loc_perm = np.asarray(
            reverse_cuthill_mckee(m, symmetric_mode=True), np.int64)
        loc_inv = np.empty(num_nodes + 1, np.int32)
        loc_inv[loc_perm] = np.arange(num_nodes, dtype=np.int32)
        loc_inv[num_nodes] = num_nodes          # sentinel stays sentinel
        nbrs_sorted = loc_inv[nbrs_sorted]      # slot ids -> loc positions
    in_deg = np.bincount(dst, minlength=num_nodes).astype(np.int32)
    out_deg = np.bincount(src, minlength=num_nodes).astype(np.int32)
    deg = (offsets[1:] - offsets[:-1]).astype(np.int64)

    perm = np.argsort(deg, kind="stable")
    inv_pos = np.empty(num_nodes, np.int32)
    inv_pos[perm] = np.arange(num_nodes, dtype=np.int32)
    deg_sorted = deg[perm]
    bounds = _greedy_buckets(deg_sorted)

    buckets = []
    for s, t in zip(bounds[:-1], bounds[1:]):
        nodes = perm[s:t]
        d_b = deg[nodes]
        cap = max(int(d_b.max()) if len(d_b) else 0, 1)
        nbr = np.full((len(nodes), cap), num_nodes, np.int32)  # sentinel pad
        rows = np.repeat(np.arange(len(nodes)), d_b)
        cols = np.arange(int(d_b.sum())) - np.repeat(np.cumsum(d_b) - d_b, d_b)
        src_idx = np.repeat(offsets[nodes], d_b) + cols
        nbr[rows, cols] = nbrs_sorted[src_idx]
        buckets.append(jnp.asarray(nbr))

    rel = None
    if with_relations:
        assert loc_perm is None, \
            "locality_reorder supports the plain SAGE/GCN neighbor-sum path"
        from marius_tpu.data.full_graph_rel import build_rel_full_graph
        rel = build_rel_full_graph(e, num_nodes)

    return FullGraphAdjacency(
        nbrs=tuple(buckets), inv_pos=jnp.asarray(inv_pos),
        in_deg=jnp.asarray(in_deg), out_deg=jnp.asarray(out_deg),
        num_nodes=int(num_nodes), rel=rel,
        loc_perm=None if loc_perm is None
        else jnp.asarray(loc_perm.astype(np.int32)))


def host_csr_from_adjacency(adj: FullGraphAdjacency):
    """Host-side combined-neighbor CSR (offsets, nbrs) in ORIGINAL node
    order, derived from the bucketed device adjacency (no re-sort of the
    edge list). Used to build per-batch seed neighbor lists for the
    seed-restricted final GNN stage (full_graph_encoder.py)."""
    deg = (np.asarray(adj.in_deg) + np.asarray(adj.out_deg)).astype(np.int64)
    offsets = np.zeros(adj.num_nodes + 1, np.int64)
    np.cumsum(deg, out=offsets[1:])
    nbrs = np.empty(int(offsets[-1]), np.int32)
    perm = np.argsort(np.asarray(adj.inv_pos), kind="stable")  # sorted row -> id
    row0 = 0
    for b in adj.nbrs:
        nb_ = np.asarray(b)
        nodes = perm[row0:row0 + nb_.shape[0]]
        d = deg[nodes]
        rows = np.repeat(np.arange(nb_.shape[0]), d)
        cols = np.arange(int(d.sum())) - np.repeat(np.cumsum(d) - d, d)
        nbrs[np.repeat(offsets[nodes], d) + cols] = nb_[rows, cols]
        row0 += nb_.shape[0]
    if adj.loc_perm is not None:
        # bucket slots hold LOCALITY positions; the CSR contract is original
        # ids (seed flat lists gather from original-order x)
        perm_ext = np.concatenate([np.asarray(adj.loc_perm, np.int32),
                                   np.asarray([adj.num_nodes], np.int32)])
        nbrs = perm_ext[nbrs]
    return offsets, nbrs


def device_csr(csr) -> Tuple[Array, Array]:
    """Device-resident int32 copy of ``host_csr_from_adjacency``'s output.
    ~9 bytes/edge of HBM; lets the seed flat lists be built inside the
    compiled epoch (below) with zero per-epoch host work or transfer."""
    offsets, nbrs = csr
    assert int(offsets[-1]) < np.iinfo(np.int32).max, \
        "full-graph CSR exceeds int32 slots; use the sampled path"
    return jnp.asarray(offsets.astype(np.int32)), jnp.asarray(nbrs)


def device_seed_flat_lists(csr_dev: Tuple[Array, Array], seeds: Array,
                           mask: Array, budget: int, num_nodes: int):
    """Flat CSR neighbor list of one seed batch, built IN-JIT on device.

    Returns (flat_nbr, flat_seg), both (budget,) int32: ``flat_nbr`` holds
    the concatenated neighbor ids of the batch's valid seeds (pad =
    num_nodes, the zero sentinel row), ``flat_seg`` the seed row each slot
    belongs to (pad = batch_size, dropped by segment ops). Masked (padding)
    seeds contribute zero slots. Slot layout is seed-major CSR order.

    The host builds NOTHING per epoch: slot -> seed row is a searchsorted
    over the batch's degree cumsum, slot -> neighbor id one gather from the
    device CSR — ~0.2 ms/batch vs ~15 ms/epoch of host numpy + a 20 MB
    host->device transfer for the precomputed (num_batches, budget) lists.
    The caller guarantees the batch fits in ``budget`` (train_epoch sizes it
    from the epoch's deterministic permutation before compiling)."""
    offsets, nbrs = csr_dev
    b = seeds.shape[0]
    s = jnp.minimum(seeds, num_nodes - 1)
    deg = (offsets[s + 1] - offsets[s]) * mask.astype(jnp.int32)
    cum = jnp.cumsum(deg)
    slots = jnp.arange(budget, dtype=jnp.int32)
    # seg[t] = #{j: cum[j] <= t} == searchsorted(cum, t, side="right"); the
    # scatter+cumsum form runs in one pass where jnp.searchsorted's binary
    # scan is log2(b) sequential gather steps (~1.6 ms/batch on v5e)
    ind = jnp.zeros((budget + 1,), jnp.int32).at[cum].add(1, mode="drop")
    seg = jnp.cumsum(ind[:budget])
    valid = slots < cum[-1]
    seg_c = jnp.minimum(seg, b - 1)
    start = cum[seg_c] - deg[seg_c]
    idx = offsets[s[seg_c]] + (slots - start)
    vals = nbrs[jnp.clip(idx, 0, nbrs.shape[0] - 1)]
    flat_nbr = jnp.where(valid, vals, num_nodes)
    flat_seg = jnp.where(valid, seg_c, b)
    return flat_nbr, flat_seg


# Gathered slot blocks larger than this spill to HBM and the bucket reduce
# re-reads them (v5e: the (10, 39400, 128) arxiv bucket = 202 MB, measured
# 1150 us gather+reduce); slicing each bucket into <=CHUNK_SLOTS column
# chunks keeps every block VMEM-resident so the reduce is fused and free
# (measured 844 us for the same bucket at 16384 slots = 8 MB f32 d=128,
# isolated; in the full epoch program per-op overhead eats part of that —
# 32768 measured best end-to-end on v5e). Env FG_CHUNK_SLOTS overrides.
import os as _os

FG_CHUNK_SLOTS = int(_os.environ.get("FG_CHUNK_SLOTS", 32768))


def _bucket_chunks(cap: int, n8: int, chunk_slots: int = FG_CHUNK_SLOTS):
    """Column-chunk boundaries [(start, size), ...] for a (cap, n8)
    transposed bucket, each chunk <= chunk_slots slots (8-aligned)."""
    piece = max(8, chunk_slots // max(cap, 1) // 8 * 8)
    return [(s, min(piece, n8 - s)) for s in range(0, n8, piece)]


def transpose_buckets(nbrs) -> Tuple[Tuple[Array, ...], Tuple[int, ...]]:
    """Per bucket: ids transposed to (cap, n8) with rows padded to a sublane
    multiple (8). XLA lowers ``take(x, (cap, n8)).sum(0)`` as gather ->
    BITCAST -> major-axis reduce: with n8 % 8 == 0 the (cap*n8, d) ->
    (cap, n8, d) reshape is layout-preserving, removing the full re-tiling
    pass the row-major (n, cap) form pays (measured 2.1 ns/slot of the
    4.5 ns/slot total on v5e at arxiv scale — bench_kernels.py)."""
    tids, ns = [], []
    for b in nbrs:
        nb_ = np.asarray(b)
        n, cap = nb_.shape
        n8 = -(-n // 8) * 8
        t = np.full((cap, n8), np.iinfo(np.int32).max, np.int32)
        t[:, :n] = nb_.T
        tids.append(jnp.asarray(t))
        ns.append(n)
    return tuple(tids), tuple(ns)


def _chunked_gather_sum(x: Array, t: Array, n: int) -> Array:
    """sum over slots of a (cap, n8) transposed bucket, sliced into
    <=FG_CHUNK_SLOTS column chunks so each gathered block stays VMEM-sized
    and its reduce fuses (no HBM round-trip of the slot block); trims the
    sublane padding back to n rows."""
    cap, n8 = t.shape
    outs = []
    for s, size in _bucket_chunks(cap, n8):
        tc = t[:, s:s + size]
        outs.append(jnp.sum(jnp.take(x, tc, axis=0, mode="fill",
                                     fill_value=0), axis=0))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
    return y[:n]


def relabel_buckets_sorted(adj: FullGraphAdjacency) -> Tuple[Array, ...]:
    """Bucket neighbor ids relabeled from ORIGINAL node ids to SORTED row
    positions (sentinel N stays N), so a gather from sorted-order x needs no
    per-pass inv_pos re-permutation (see make_nbr_sums sorted_space)."""
    inv_ext = np.empty(adj.num_nodes + 1, np.int32)
    inv_ext[:adj.num_nodes] = np.asarray(adj.inv_pos)
    inv_ext[adj.num_nodes] = adj.num_nodes
    return tuple(jnp.asarray(inv_ext[np.asarray(b)]) for b in adj.nbrs)


def make_nbr_sums(adj: FullGraphAdjacency, sorted_space: bool = False):
    """Returns ``nbr_sum``: x:(N, d) -> (N, d), the sum of each node's
    combined (in+out) neighbor rows. Scatter-free custom vjp: the combined
    adjacency is symmetric, so the backward is the SAME gather-sum.

    Default path: per-bucket TRANSPOSED padded gathers (transpose_buckets)
    with ``mode="fill"`` — out-of-range padding slots read 0 without
    materializing a sentinel-row copy of x (87 MB/pass at arxiv scale) —
    then a free bitcast + major-axis reduce. The Pallas row-DMA kernel
    (ops/pallas/nbr_sum.py) lost to this pipeline on v5e and stays opt-in.

    ``sorted_space``: input AND output rows are in degree-SORTED order
    (row r = node perm[r]); bucket ids are relabeled to sorted positions at
    build time so the per-pass inv_pos re-permutation gather + concat
    reorder vanish entirely (~1 ms/pass at arxiv scale on v5e). The sorted
    operator B = P A P^T stays symmetric, so the vjp is unchanged. The
    caller owns keeping every node-indexed array in the same sorted space
    (full_graph_encoder sorted mode)."""
    from marius_tpu.ops.pallas import gather_sum_opt_in

    loc_perm = adj.loc_perm
    loc_inv = None
    if loc_perm is not None:
        assert not sorted_space, \
            "sorted_space and locality_reorder are mutually exclusive"
        inv = np.empty(adj.num_nodes, np.int32)
        inv[np.asarray(loc_perm)] = np.arange(adj.num_nodes, dtype=np.int32)
        loc_inv = jnp.asarray(inv)

    use_pallas = gather_sum_opt_in() and not sorted_space
    if not use_pallas:
        tids, ns = transpose_buckets(
            relabel_buckets_sorted(adj) if sorted_space else adj.nbrs)

    def _to_locality(x):
        """Permutation gather with a gather-only vjp (a scatter would undo
        the win). The COMPOSITE operator stays symmetric, so nbr_sum's own
        custom vjp below is still just the same forward."""
        if loc_perm is None:
            return x

        @jax.custom_vjp
        def f(v):
            return v[loc_perm]

        f.defvjp(lambda v: (v[loc_perm], None), lambda _, u: (u[loc_inv],))
        return f(x)

    def _bucketed_sum(x):
        x_src = _to_locality(x)
        if use_pallas:
            from marius_tpu.ops.pallas import gather_sum_auto
            x_pad = jnp.concatenate(
                [x_src, jnp.zeros((1, x.shape[1]), x.dtype)], 0)
            parts = [gather_sum_auto(x_pad, nbr) for nbr in adj.nbrs]
        else:
            parts = [_chunked_gather_sum(x_src, t, n)
                     for t, n in zip(tids, ns)]
        y_sorted = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        if sorted_space:
            return y_sorted  # rows already in the caller's sorted space
        return y_sorted[adj.inv_pos]  # back to original node order (a gather)

    @jax.custom_vjp
    def nbr_sum(x):
        return _bucketed_sum(x)

    def fwd(x):
        return nbr_sum(x), None

    def bwd(_, u):
        # (A x)^T vjp = A^T u = A u: the combined multiset is symmetric
        return (_bucketed_sum(u),)

    nbr_sum.defvjp(fwd, bwd)
    return nbr_sum


def build_inverse_map(adj: FullGraphAdjacency) -> FullGraphAdjacency:
    """Fill ``inv_map``: for each node, the flat (bucket-major) slot indices
    where it appears as a neighbor. By symmetry a node occurs exactly
    combined-degree times, so the map has the SAME bucket shapes as ``nbrs``.
    Host-side, one stable argsort over the slots."""
    if adj.inv_map is not None:
        return adj
    assert adj.loc_perm is None, \
        "locality_reorder supports the plain SAGE/GCN neighbor-sum path"
    flat = np.concatenate([np.asarray(b).reshape(-1) for b in adj.nbrs])
    total = flat.shape[0]
    order = np.argsort(flat, kind="stable").astype(np.int64)
    occ_off = np.searchsorted(flat[order], np.arange(adj.num_nodes + 1))
    perm = np.argsort(np.asarray(adj.inv_pos), kind="stable")  # sorted row -> id
    inv_buckets = []
    row0 = 0
    for b in adj.nbrs:
        n_b, cap = b.shape
        nodes = perm[row0:row0 + n_b]
        d = (occ_off[nodes + 1] - occ_off[nodes]).astype(np.int64)
        inv = np.full((n_b, cap), total, np.int32)
        rows = np.repeat(np.arange(n_b), d)
        cols = np.arange(int(d.sum())) - np.repeat(np.cumsum(d) - d, d)
        inv[rows, cols] = order[np.repeat(occ_off[nodes], d) + cols]
        inv_buckets.append(jnp.asarray(inv))
        row0 += n_b
    return dataclasses.replace(adj, inv_map=tuple(inv_buckets))


def make_permuters(adj: FullGraphAdjacency):
    """(to_sorted, to_orig) row-permutation gathers with gather-only vjps
    (XLA would otherwise emit a serialized scatter for the backward)."""
    perm = jnp.asarray(
        np.argsort(np.asarray(adj.inv_pos), kind="stable").astype(np.int32))
    inv_pos = adj.inv_pos

    def _make(fwd_idx, bwd_idx):
        @jax.custom_vjp
        def f(x):
            return x[fwd_idx]

        f.defvjp(lambda x: (x[fwd_idx], None), lambda _, u: (u[bwd_idx],))
        return f

    return _make(perm, inv_pos), _make(inv_pos, perm)


def make_gather_blocks(adj: FullGraphAdjacency):
    """Returns ``gather_blocks``: x:(N, d) -> tuple of (n_b, cap_b, d)
    neighbor blocks (padding slots read a zero sentinel row). The vjp is a
    bucketed gather-sum over ``inv_map`` — never a scatter — so per-slot
    weighted aggregations (GAT) stay scatter-free end to end."""
    assert adj.inv_map is not None, \
        "call build_inverse_map(adj) first (needed for weighted aggregation)"

    inv_tids, inv_ns = transpose_buckets(adj.inv_map)

    @jax.custom_vjp
    def gather_blocks(x):
        return tuple(jnp.take(x, nbr, axis=0, mode="fill", fill_value=0)
                     for nbr in adj.nbrs)

    def fwd(x):
        return gather_blocks(x), None

    def bwd(_, u_blocks):
        d = u_blocks[0].shape[-1]
        flat_u = jnp.concatenate([u.reshape(-1, d) for u in u_blocks], 0)
        # bucketed transposed gather-sum over the inverse occurrence map;
        # inv pad slots are out of range -> read 0 via mode="fill"
        parts = [_chunked_gather_sum(flat_u, t, n)
                 for t, n in zip(inv_tids, inv_ns)]
        g_sorted = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return (g_sorted[adj.inv_pos],)

    gather_blocks.defvjp(fwd, bwd)
    return gather_blocks
