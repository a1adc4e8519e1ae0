"""Native C++ runtime vs numpy-fallback equivalence tests."""

import numpy as np
import pytest

from marius_tpu import native


def test_native_builds():
    assert native.available(), "native library failed to build (g++ present?)"


def test_gather_remap_buckets_matches_numpy():
    rng = np.random.default_rng(0)
    P, psize = 4, 10
    edges = rng.integers(0, P * psize, (500, 3)).astype(np.int32)
    from marius_tpu.tools.preprocess.partitioner import partition_edges
    grouped, sizes = partition_edges(edges, P * psize, P)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    part_to_slot = np.array([2, -1, 0, 1], np.int32)
    # buckets among resident partitions {0, 2, 3}
    bucket_ids = np.array([0 * P + 2, 2 * P + 3, 3 * P + 0], np.int32)

    out = native.gather_remap_buckets(grouped, offsets, bucket_ids,
                                      part_to_slot, psize)
    # reference computation
    parts = [grouped[offsets[b]:offsets[b + 1]] for b in bucket_ids]
    exp = np.concatenate(parts).copy()
    for c in (0, 2):
        g = exp[:, c]
        exp[:, c] = part_to_slot[g // psize] * psize + g % psize
    np.testing.assert_array_equal(out, exp)
    assert (out[:, [0, 2]] >= 0).all()


def test_shuffle_preserves_rows():
    rows = np.arange(300, dtype=np.int32).reshape(100, 3)
    shuffled = native.shuffle_rows(rows.copy(), seed=1)
    assert not np.array_equal(shuffled, rows)
    np.testing.assert_array_equal(np.sort(shuffled[:, 0]), rows[:, 0])
    # rows stay intact (col1 = col0 + 1)
    np.testing.assert_array_equal(shuffled[:, 1], shuffled[:, 0] + 1)


def test_csr_offsets_matches_searchsorted():
    rng = np.random.default_rng(1)
    anchor = np.sort(rng.integers(0, 50, 400)).astype(np.int32)
    out = native.csr_offsets(anchor, 50)
    np.testing.assert_array_equal(out, np.searchsorted(anchor, np.arange(51)))


def test_sample_uniform_neighbors():
    # star graph: node 0 -> 1..20; node 1 -> 2,3
    edges = sorted([(0, i) for i in range(1, 21)] + [(1, 2), (1, 3)])
    anchor = np.array([e[0] for e in edges], np.int32)
    cols = np.array([e[1] for e in edges], np.int32)
    offsets = native.csr_offsets(anchor, 22)
    seeds = np.array([0, 1, 5], np.int32)
    nbrs, counts = native.sample_uniform_neighbors(
        offsets, cols, seeds, fanout=8, fill=-1, seed=3)
    assert counts.tolist() == [8, 2, 0]
    assert set(nbrs[0]) <= set(range(1, 21))
    assert len(set(nbrs[0])) == 8          # without replacement
    assert nbrs[1].tolist()[:2] == [2, 3] and (nbrs[1][2:] == -1).all()
    assert (nbrs[2] == -1).all()


def test_global_to_local():
    part_to_slot = np.array([1, -1, 0], np.int32)
    ids = np.array([0, 5, 10, 25], np.int32)  # parts 0,0,1,2 (psize=10)
    out, misses = native.global_to_local(ids, part_to_slot, 10, fill=999)
    assert misses == 1
    assert out.tolist() == [10, 15, 999, 5]


def test_partition_rows_matches_stable_argsort():
    """Native counting-sort partitioner == the partitioner's double stable
    argsort (torch_partitioner.py:12-46 order), bucket sizes included."""
    import numpy as np
    from marius_tpu import native

    rng = np.random.default_rng(3)
    e = np.stack([rng.integers(0, 100, 5000), rng.integers(0, 5, 5000),
                  rng.integers(0, 100, 5000)], axis=1).astype(np.int32)
    out, sizes = native.partition_rows(e, 100, 8)
    psize = -(-100 // 8)
    sp, dp = e[:, 0] // psize, e[:, -1] // psize
    order = np.argsort(dp, kind="stable")
    order = order[np.argsort(sp[order], kind="stable")]
    np.testing.assert_array_equal(out, e[order])
    np.testing.assert_array_equal(
        sizes, np.bincount(sp * 8 + dp, minlength=64))
