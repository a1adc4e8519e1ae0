"""On-device edge membership tests (false-negative filtering) via int32 triples.

The reference filters false negatives with CPU/GPU searchsorted passes over
globally src-/dst-sorted edge lists producing ragged (row, col) index pairs
(data/samplers/negative.cpp:50-197) that are scattered to -1e9
(apply_score_filter :306-311). On TPU we answer "is (anchor, rel, other) a true
edge?" for entire (B, num_candidates) score matrices with one vectorized
lexicographic binary search over a pre-sorted edge set.

Keys are kept as THREE int32 components (anchor, rel, other) compared
lexicographically — never packed into int64 — because TPUs emulate int64 and
packing overflows for large graphs (100M nodes x 1k relations). The ~log2(E)
search steps are a handful of vectorized gathers on the VPU; no ragged shapes.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class EdgeKeySet(NamedTuple):
    """Lexicographically sorted (anchor, rel, other) triples."""

    anchor: Array  # (E,) int32
    rel: Array     # (E,) int32 (zeros for untyped graphs)
    other: Array   # (E,) int32


def build_edge_key_set(edges: np.ndarray, corrupt_dst: bool) -> EdgeKeySet:
    """Sort edges into a key set for membership queries.

    corrupt_dst=True  -> anchored on (src, rel), candidates are dst nodes.
    corrupt_dst=False -> anchored on (dst, rel), candidates are src nodes.
    Accepts (E, 3) or (E, 2) edge arrays (numpy or jax).
    """
    e = np.asarray(edges)
    has_rel = e.shape[-1] == 3
    src = e[:, 0].astype(np.int32)
    dst = e[:, -1].astype(np.int32)
    rel = e[:, 1].astype(np.int32) if has_rel else np.zeros_like(src)
    anchor, other = (src, dst) if corrupt_dst else (dst, src)
    order = np.lexsort((other, rel, anchor))
    anchor, rel, other = anchor[order], rel[order], other[order]
    # dedupe exact triples: membership is unchanged, and the rank-correction
    # path (true_tail_counts) must count each true candidate exactly once
    if len(anchor):
        keep = np.concatenate([[True], (np.diff(anchor) != 0)
                               | (np.diff(rel) != 0) | (np.diff(other) != 0)])
        anchor, rel, other = anchor[keep], rel[keep], other[keep]
    from marius_tpu.parallel.mesh import put_closure
    return EdgeKeySet(
        anchor=put_closure(anchor),
        rel=put_closure(rel),
        other=put_closure(other),
    )


def max_anchor_tail(edges: np.ndarray, corrupt_dst: bool) -> int:
    """Max number of DISTINCT candidates sharing one (anchor, rel) key —
    the static pad width of per-edge true-candidate lists."""
    e = np.asarray(edges)
    has_rel = e.shape[-1] == 3
    src = e[:, 0].astype(np.int64)
    dst = e[:, -1].astype(np.int64)
    rel = e[:, 1].astype(np.int64) if has_rel else np.zeros_like(src)
    anchor, other = (src, dst) if corrupt_dst else (dst, src)
    trip = np.unique(np.stack([anchor, rel, other], 1), axis=0)
    if not len(trip):
        return 1
    pair = trip[:, 0] * (trip[:, 1].max() + 1) + trip[:, 1]
    _, counts = np.unique(pair, return_counts=True)
    return int(counts.max())


def _lex_less(a1, r1, o1, a2, r2, o2):
    return (a1 < a2) | ((a1 == a2) & ((r1 < r2) | ((r1 == r2) & (o1 < o2))))


def _lex_lower_bound(keys: EdgeKeySet, qa: Array, qr: Array, qo: Array) -> Array:
    """Insertion point of each flat (qa, qr, qo) query in the sorted set."""
    n = keys.anchor.shape[0]
    assert n < np.iinfo(np.int32).max, \
        "edge key set exceeds int32 rows; shard the filter edge set"
    steps = max(1, math.ceil(math.log2(max(n, 2))) + 1)
    lo = jnp.zeros_like(qa)
    hi = jnp.full_like(qa, n)

    from marius_tpu.ops.gather1d import take_1d

    def body(_, carry):
        lo, hi = carry
        # overflow-safe midpoint: hi - lo <= n stays in int32 even when
        # lo + hi would wrap (E > 2^30 — exactly the scale this module
        # targets; a wrapped mid silently corrupts every membership answer)
        mid = lo + (hi - lo) // 2
        midc = jnp.minimum(mid, n - 1)
        # scalar gathers serialize on TPU; take_1d vectorizes them — the
        # binary search does ~log2(E) rounds of three gathers over every
        # query
        less = _lex_less(take_1d(keys.anchor, midc), take_1d(keys.rel, midc),
                         take_1d(keys.other, midc), qa, qr, qo)
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def isin_triples(keys: EdgeKeySet, anchor: Array, rel: Optional[Array], other: Array) -> Array:
    """Vectorized membership of (anchor, rel, other) queries (any broadcastable
    shapes) against the sorted key set. Returns bool array of the query shape."""
    qa, qr, qo = jnp.broadcast_arrays(
        anchor.astype(jnp.int32),
        (rel if rel is not None else jnp.zeros_like(anchor)).astype(jnp.int32),
        other.astype(jnp.int32))
    shape = qa.shape
    qa, qr, qo = qa.reshape(-1), qr.reshape(-1), qo.reshape(-1)
    n = keys.anchor.shape[0]
    lo = _lex_lower_bound(keys, qa, qr, qo)
    from marius_tpu.ops.gather1d import take_1d
    pos = jnp.minimum(lo, n - 1)
    found = ((lo < n) & (take_1d(keys.anchor, pos) == qa)
             & (take_1d(keys.rel, pos) == qr) & (take_1d(keys.other, pos) == qo))
    return found.reshape(shape)


def anchor_ranges(keys: EdgeKeySet, anchors: Array,
                  rels: Optional[Array]) -> tuple:
    """Per-query [lo, hi) row range of the key set holding (anchor, rel, *):
    two binary searches per query — the all-node filtered-ranking correction
    needs each edge's TRUE-candidate list, which is exactly this contiguous
    run (the set is (anchor, rel, other)-lexsorted)."""
    qa = anchors.astype(jnp.int32)
    qr = (rels if rels is not None else jnp.zeros_like(anchors)).astype(jnp.int32)
    lo = _lex_lower_bound(keys, qa, qr, jnp.full_like(qa, -1))
    hi = _lex_lower_bound(keys, qa, qr,
                          jnp.full_like(qa, np.iinfo(np.int32).max))
    return lo, hi


def filter_mask_all_nodes(keys: EdgeKeySet, anchors: Array, rels: Optional[Array],
                          num_nodes: int) -> Array:
    """(B, num_nodes) bool: True where (anchor_i, rel_i, j) is a known true edge.

    Filtered evaluation against all-node corruption: scores at True positions
    get -1e9 (apply_score_filter, negative.cpp:306-311)."""
    cand = jnp.arange(num_nodes, dtype=jnp.int32)[None, :]
    return isin_triples(keys, anchors[:, None], None if rels is None else rels[:, None], cand)


def filter_mask_sampled(keys: EdgeKeySet, anchors: Array, rels: Optional[Array],
                        neg_ids: Array) -> Array:
    """(B, N) bool filter for chunked sampled negatives ``neg_ids (C, N)``.

    Edge i in chunk c is tested against chunk c's shared negatives — sampled
    analogue of compute_filter_corruption (negative.cpp:50-197)."""
    b = anchors.shape[0]
    c, n = neg_ids.shape
    a = anchors.reshape(c, b // c, 1)
    r = None if rels is None else rels.reshape(c, b // c, 1)
    cand = neg_ids.astype(jnp.int32)[:, None, :]
    return isin_triples(keys, a, r, cand).reshape(b, n)
