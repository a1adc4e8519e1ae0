"""Edge-key membership filters vs. brute-force numpy (negative.cpp filter parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# Local (in-batch) filters: DEG self-collision mask and ALL in-batch filter
# (deg_negative_local_filter negative.cpp:21-48; local ALL :50-197)
# ---------------------------------------------------------------------------

def test_deg_local_filter_parity_brute_force():
    import jax
    from marius_tpu.data.samplers.negative import deg_local_filter_mask

    b, c, nneg, num_batch = 24, 4, 10, 6
    deg_rows = RNG.integers(0, b, (c, num_batch)).astype(np.int32)
    got = np.asarray(deg_local_filter_mask(jnp.asarray(deg_rows), b, nneg))

    want = np.zeros((b, nneg), bool)
    chunk_size = -(-b // c)
    for ci in range(c):
        for t in range(num_batch):
            r = int(deg_rows[ci, t])
            if r // chunk_size == ci:
                want[r, t] = True
    np.testing.assert_array_equal(got, want)


def test_local_all_filter_parity_brute_force():
    from marius_tpu.data.samplers.negative import local_all_filter_mask

    b, c, nneg, n_nodes, n_rel = 24, 4, 12, 15, 3
    edges = _random_edges(b, n_nodes, n_rel)
    mask = np.ones(b, bool)
    mask[-3:] = False                           # padded rows
    negs = RNG.integers(0, n_nodes, (c, nneg)).astype(np.int32)
    chunk_size = b // c

    for inverse in (False, True):
        got = np.asarray(local_all_filter_mask(
            jnp.asarray(edges), jnp.asarray(mask), jnp.asarray(negs),
            inverse))
        true_edges = {tuple(r) for r in edges[mask].tolist()}
        want = np.zeros((b, nneg), bool)
        for q in range(b):
            s, r, d = edges[q]
            for t in range(nneg):
                neg = int(negs[q // chunk_size, t])
                cand = ((neg, r, d) if inverse else (s, r, neg))
                if mask[q] and cand in true_edges:
                    want[q, t] = True
        np.testing.assert_array_equal(got, want, err_msg=f"inverse={inverse}")


@pytest.mark.slow
def test_local_filters_change_training_loss(tmp_path):
    """Config e2e: degree_fraction>0 with DEG filtering trains a different
    trajectory than local_filter_mode NONE (the masked self-collisions carry
    loss mass); ALL also runs end to end."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_lp

    ds_dir = str(tmp_path / "ds_lf")
    generate_random_dataset_lp(ds_dir, num_nodes=50, num_edges=500,
                               num_relations=3)

    def run(mode):
        raw = {
            "model": {
                "learning_task": "LINK_PREDICTION",
                "encoder": {"layers": [[{"type": "EMBEDDING",
                                         "output_dim": 12}]]},
                "decoder": {"type": "DISTMULT", "options": {"input_dim": 12}},
                "loss": {"type": "SOFTMAX_CE",
                         "options": {"reduction": "SUM"}},
                "dense_optimizer": {"type": "ADAGRAD",
                                    "options": {"learning_rate": 0.1}},
            },
            "storage": {"dataset": {"dataset_dir": ds_dir},
                        "save_model": False},
            "training": {"batch_size": 50, "num_epochs": 2,
                         "negative_sampling": {
                             "num_chunks": 2, "negatives_per_positive": 20,
                             "degree_fraction": 0.5,
                             "local_filter_mode": mode}},
            "evaluation": {"batch_size": 50,
                           "negative_sampling": {
                               "num_chunks": 2, "negatives_per_positive": 20,
                               "degree_fraction": 0.5,
                               "local_filter_mode": mode}},
        }
        return marius_train(load_config(raw))

    r_deg = run("DEG")
    r_none = run("NONE")
    r_all = run("ALL")
    assert r_deg["epochs"][0]["loss"] != r_none["epochs"][0]["loss"]
    assert r_all["epochs"][0]["loss"] != r_none["epochs"][0]["loss"]
    for r in (r_deg, r_none, r_all):
        assert 0.0 < r["test"]["mrr"] <= 1.0
