"""Static-shape unique-id machinery for batch-local index mapping.

The reference dedups the ids touched by a batch on the host (`torch::_unique`
in dataloader.cpp:417-441) so embeddings are gathered/updated once per unique
node. On TPU everything must be static-shape and on-device, so we provide a
sort-based `unique(ids, size=U)` that returns (padded unique ids, inverse map,
valid count). Padding uses ``fill_value`` = an out-of-range id so downstream
scatters drop it (XLA scatter drops out-of-bounds indices; gathers clamp).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class UniqueResult(NamedTuple):
    ids: Array        # (size,) sorted unique ids, padded with fill_value
    inverse: Array    # same shape as input; input[i] == ids[inverse[i]]
    count: Array      # scalar int32 number of valid unique ids


def unique_padded(ids: Array, size: int, fill_value: int) -> UniqueResult:
    """Sorted unique with static output size.

    ``fill_value`` must compare greater than every valid id (use num_nodes) so
    padding sorts to the tail and scatters to it are dropped as out-of-bounds.
    """
    flat = ids.reshape(-1)
    uniq, inverse = jnp.unique(
        flat, return_inverse=True, size=size, fill_value=fill_value)
    count = jnp.sum(uniq < fill_value).astype(jnp.int32)
    return UniqueResult(uniq.astype(ids.dtype), inverse.reshape(ids.shape), count)


def unique_padded_bitmap(ids: Array, size: int, fill_value: int) -> UniqueResult:
    """Dedup via a node-id-space bitmap — the reference's computeDeltaIds
    bitmap (neighbor.cpp:511-524) without sorts entirely. (A sort-only
    compaction variant was benchmarked and rejected: TPU sorts cost ~60ms at
    1M elements, 5x worse than jnp.unique.)

    1. mark[v] = 1 for every candidate (one scalar scatter over the input);
    2. prefix = cumsum(mark) assigns each marked id its compacted slot
       (elementwise scan over the ID SPACE, not the input);
    3. unique ids scatter into their slots (|unique| rows);
    4. inverse is a pure gather of prefix at the inputs.

    Returns ids in sorted order like unique_padded. Needs fill_value ==
    max valid id + 1 (the bitmap is sized fill_value + 1). Wins over
    jnp.unique when the input is much larger than the id space (multi-hop
    GNN candidates): sorts scale with input length, the bitmap scan scales
    with the id space.
    """
    flat = ids.reshape(-1)
    mark = jnp.zeros((fill_value + 1,), jnp.int32).at[flat].set(
        1, mode="drop").at[fill_value].set(0)
    prefix = jnp.cumsum(mark)                       # 1-based slots
    count = prefix[-1].astype(jnp.int32)
    slot = (prefix - 1).astype(jnp.int32)
    # scatter each marked id into its slot (duplicate writes collapse)
    all_ids = jnp.arange(fill_value + 1, dtype=ids.dtype)
    target = jnp.where(mark == 1, slot, size)       # unmarked rows drop
    uniq = jnp.full((size,), fill_value, ids.dtype).at[target].set(
        all_ids, mode="drop")
    from marius_tpu.ops.gather1d import take_1d
    inverse = jnp.minimum(take_1d(slot, flat), size - 1)
    return UniqueResult(uniq, inverse.reshape(ids.shape), count)


class PrefixUniqueResult(NamedTuple):
    ids: Array        # (size,) cur_ids ++ new unique ids, padded with fill
    inverse: Array    # (n_new_candidates,) positions of the candidates
    count: Array      # scalar int32 total valid ids (cur + new)
    overflow: Array   # scalar int32 distinct new ids dropped by the cap


def prefix_unique_padded(cur_ids: Array, cur_mask: Array, candidates: Array,
                         size: int, fill_value: int) -> PrefixUniqueResult:
    """Frontier-prefix dedup: the output id set starts with ``cur_ids``
    verbatim (slots [0, n)); new candidate ids not already in cur get slots
    n, n+1, ... in ascending id order. Built on the same id-space bitmap as
    :func:`unique_padded_bitmap`.

    Layout properties the GNN sampler relies on (data/samplers/neighbor.py):
    - a hop's node set is a PREFIX of the next hop's set, so self rows can
      never be evicted by a tight cap — ``self_idx`` is simply iota(n);
    - when the cap overflows, only NEW neighbor ids drop, their inverse
      entries alias inside the dropped range and must be masked by the
      caller via ``inverse < size`` ... here we pre-clamp and report
      ``overflow`` so callers can mask with ``take(ids, inverse) ==
      candidate`` or the returned per-candidate validity.

    Requires fill_value == max valid id + 1 (bitmap is fill_value + 1 wide).
    """
    n = cur_ids.shape[0]
    assert size >= n, f"prefix cap {size} < current frontier {n}"
    from marius_tpu.ops.gather1d import take_1d
    flat = candidates.reshape(-1)
    # position of each valid cur id (invalid rows leave HOLES that new ids
    # reclaim — without this, worst-case caps would spuriously overflow)
    pos_cur = jnp.full((fill_value + 1,), -1, jnp.int32).at[
        jnp.where(cur_mask, cur_ids, fill_value)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop").at[fill_value].set(-1)
    is_new = jnp.zeros((fill_value + 1,), jnp.int32).at[flat].set(
        1, mode="drop").at[fill_value].set(0)
    is_new = jnp.where(pos_cur >= 0, 0, is_new)   # already resident in cur
    prefix = jnp.cumsum(is_new)                   # 1-based ranks of new ids
    new_count = prefix[-1].astype(jnp.int32)

    # free slots: holes in [0, n) first (ascending), then the tail [n, size)
    hole = ~cur_mask
    hrank = jnp.cumsum(hole.astype(jnp.int32))    # 1-based hole ranks
    num_holes = hrank[-1]
    hole_pos = jnp.full((n,), size, jnp.int32).at[
        jnp.where(hole, hrank - 1, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")

    def slot_for_rank(r):                          # r is 1-based
        in_hole = r <= num_holes
        hp = take_1d(hole_pos, jnp.minimum(r - 1, n - 1))
        return jnp.where(in_hole, hp, n + (r - 1) - num_holes)

    rank = prefix.astype(jnp.int32)
    slot = jnp.where(pos_cur >= 0, pos_cur, slot_for_rank(rank))
    # assemble: cur block first (holes = fill), then scatter new ids into
    # their slots (holes included)
    all_ids = jnp.arange(fill_value + 1, dtype=cur_ids.dtype)
    ids = jnp.full((size,), fill_value, cur_ids.dtype)
    ids = jax.lax.dynamic_update_slice(
        ids, jnp.where(cur_mask, cur_ids, fill_value), (0,))
    target = jnp.where((is_new == 1) & (slot < size), slot, size)
    ids = ids.at[target].set(all_ids, mode="drop")
    inverse = jnp.minimum(take_1d(slot, flat), size - 1).astype(jnp.int32)
    capacity = num_holes + (size - n)
    count = (jnp.sum(cur_mask.astype(jnp.int32))
             + jnp.minimum(new_count, capacity)).astype(jnp.int32)
    overflow = jnp.maximum(new_count - capacity, 0).astype(jnp.int32)
    return PrefixUniqueResult(ids, inverse.reshape(candidates.shape),
                              count, overflow)


# prefix_unique allocates O(num_nodes) temporaries per hop; above this the
# sampler falls back to the sorted path with overflow-free worst-case caps
PREFIX_BITMAP_LIMIT = 256_000_000

BITMAP_THRESHOLD = 65_536


def unique_padded_auto(ids: Array, size: int, fill_value: int) -> UniqueResult:
    """Pick the dedup strategy: sort-based jnp.unique for small inputs or
    huge id spaces, the bitmap for large multi-hop candidate sets (v5e: 26ms
    -> 15ms at 1M candidates). The bitmap allocates O(fill_value) temporaries,
    so it only wins when the input is at least comparable to the id space —
    a 100M-node graph with a 1M-candidate hop must keep the sort path.
    Requires fill_value == max valid id + 1."""
    if ids.size >= BITMAP_THRESHOLD and fill_value <= 8 * ids.size:
        return unique_padded_bitmap(ids, size, fill_value)
    return unique_padded(ids, size, fill_value)
