"""Rank computation and metric parity (reporting.cpp:11-57)."""

import jax.numpy as jnp
import numpy as np

from marius_tpu.reporting.metrics import (
    categorical_accuracy_statistics,
    compute_ranks,
    finalize_rank_statistics,
    rank_statistics,
)


def test_compute_ranks_matches_reference_formula():
    pos = jnp.array([1.0, 0.5, -1.0])
    neg = jnp.array([[0.0, 2.0, 1.0],     # 2 >= 1.0 (2.0, 1.0) -> rank 3
                     [0.4, 0.4, 0.6],     # 1 >= 0.5 -> rank 2
                     [-2.0, -3.0, -1.0]])  # -1.0 >= -1.0 -> rank 2
    ranks = np.asarray(compute_ranks(pos, neg))
    np.testing.assert_array_equal(ranks, [3, 2, 2])


def test_rank_statistics_mrr_hits():
    ranks = jnp.array([1, 2, 10, 100])
    stats = rank_statistics(ranks, hits_ks=(1, 10))
    out = finalize_rank_statistics({k: float(v) for k, v in stats.items()})
    import pytest
    assert out["mrr"] == pytest.approx((1 + 0.5 + 0.1 + 0.01) / 4, rel=1e-6)
    assert out["hits@1"] == 0.25
    assert out["hits@10"] == 0.75
    assert out["mean_rank"] == (1 + 2 + 10 + 100) / 4


def test_rank_statistics_mask():
    ranks = jnp.array([1, 5])
    stats = rank_statistics(ranks, mask=jnp.array([True, False]))
    out = finalize_rank_statistics({k: float(v) for k, v in stats.items()})
    assert out["mrr"] == 1.0
    assert out["num_evaluated"] == 1.0


def test_neg_mask_excludes_padded_slots():
    pos = jnp.array([0.0])
    neg = jnp.array([[1.0, 1.0, 1.0]])
    mask = jnp.array([[True, False, False]])
    assert int(compute_ranks(pos, neg, mask)[0]) == 2


def test_categorical_accuracy():
    logits = jnp.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    labels = jnp.array([1, 0, 0])
    stats = categorical_accuracy_statistics(logits, labels)
    assert float(stats["correct"]) == 2.0
    assert float(stats["count"]) == 3.0
