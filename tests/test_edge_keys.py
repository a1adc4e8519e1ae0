"""Edge-key membership filters vs. brute-force numpy (negative.cpp filter parity)."""

import jax.numpy as jnp
import numpy as np

from marius_tpu.ops.edge_keys import (
    build_edge_key_set,
    filter_mask_all_nodes,
    filter_mask_sampled,
    isin_triples,
)

RNG = np.random.default_rng(3)


def _random_edges(e, n, r):
    return np.stack([RNG.integers(0, n, e), RNG.integers(0, r, e),
                     RNG.integers(0, n, e)], axis=1).astype(np.int32)


def test_isin_triples_exact():
    edges = _random_edges(200, 20, 4)
    keys = build_edge_key_set(edges, corrupt_dst=True)
    # half real queries, half random
    q_real = edges[RNG.permutation(200)[:50]]
    q_rand = _random_edges(50, 20, 4)
    queries = np.concatenate([q_real, q_rand])
    got = np.asarray(isin_triples(
        keys, jnp.array(queries[:, 0]), jnp.array(queries[:, 1]), jnp.array(queries[:, 2])))
    edge_set = {tuple(row) for row in edges.tolist()}
    want = np.array([tuple(q) in edge_set for q in queries.tolist()])
    np.testing.assert_array_equal(got, want)


def test_filter_mask_all_nodes():
    n = 15
    edges = _random_edges(60, n, 3)
    keys = build_edge_key_set(edges, corrupt_dst=True)
    anchors = edges[:8, 0]
    rels = edges[:8, 1]
    mask = np.asarray(filter_mask_all_nodes(
        keys, jnp.array(anchors), jnp.array(rels), n))
    edge_set = {tuple(row) for row in edges.tolist()}
    for i in range(8):
        for j in range(n):
            assert mask[i, j] == ((anchors[i], rels[i], j) in edge_set)


def test_filter_mask_all_nodes_untyped():
    n = 10
    edges = np.stack([RNG.integers(0, n, 40), RNG.integers(0, n, 40)], 1).astype(np.int32)
    keys = build_edge_key_set(edges, corrupt_dst=False)  # anchor=dst, other=src
    anchors = edges[:5, 1]
    mask = np.asarray(filter_mask_all_nodes(keys, jnp.array(anchors), None, n))
    edge_set = {(d, s) for s, d in edges.tolist()}
    for i in range(5):
        for j in range(n):
            assert mask[i, j] == ((anchors[i], j) in edge_set)


def test_filter_mask_sampled_chunked():
    n, b, c, k = 12, 6, 2, 4
    edges = _random_edges(50, n, 2)
    keys = build_edge_key_set(edges, corrupt_dst=True)
    anchors = edges[:b, 0]
    rels = edges[:b, 1]
    neg_ids = RNG.integers(0, n, (c, k)).astype(np.int32)
    mask = np.asarray(filter_mask_sampled(
        keys, jnp.array(anchors), jnp.array(rels), jnp.array(neg_ids)))
    edge_set = {tuple(row) for row in edges.tolist()}
    per_chunk = b // c
    for i in range(b):
        chunk = i // per_chunk
        for j in range(k):
            want = (anchors[i], rels[i], neg_ids[chunk, j]) in edge_set
            assert mask[i, j] == want


def test_take_1d_matches_indexing():
    import numpy as np
    import jax.numpy as jnp
    from marius_tpu.ops.gather1d import take_1d, VECTOR_THRESHOLD

    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.integers(-5, 5, 1000).astype(np.int32))
    # both the plain path (small) and the vectorized path (large)
    for k in (100, VECTOR_THRESHOLD + 7):
        idx = jnp.asarray(rng.integers(0, 1000, k).astype(np.int32))
        np.testing.assert_array_equal(np.asarray(take_1d(arr, idx)),
                                      np.asarray(arr)[np.asarray(idx)])
    # multi-dim indices
    idx2 = jnp.asarray(rng.integers(0, 1000, (300, 256)).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(take_1d(arr, idx2)),
                                  np.asarray(arr)[np.asarray(idx2)])
