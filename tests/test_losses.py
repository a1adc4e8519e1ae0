"""Loss functions vs. torch reference formulas (nn/loss.cpp parity)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from marius_tpu.nn import losses


@pytest.fixture
def scores():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(8,)).astype(np.float32)
    neg = rng.normal(size=(8, 5)).astype(np.float32)
    return pos, neg


def torch_softmax_ce(pos, neg, reduction):
    y_pred = torch.cat([torch.from_numpy(pos).unsqueeze(1),
                        torch.from_numpy(neg).logsumexp(1, True)], dim=1)
    labels = torch.zeros(pos.shape[0], dtype=torch.int64)
    return F.cross_entropy(y_pred, labels, reduction=reduction.lower()).item()


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_softmax_ce(scores, reduction):
    pos, neg = scores
    got = float(losses.softmax_ce(jnp.array(pos), jnp.array(neg), reduction=reduction))
    want = torch_softmax_ce(pos, neg, reduction)
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_ranking(scores, reduction):
    pos, neg = scores
    got = float(losses.ranking_loss(jnp.array(pos), jnp.array(neg),
                                    margin=0.1, reduction=reduction))
    want = F.margin_ranking_loss(
        torch.from_numpy(neg), torch.from_numpy(pos).unsqueeze(1),
        torch.full((1, 1), -1.0), margin=0.1, reduction=reduction.lower()).item()
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_cross_entropy_scores(scores, reduction):
    pos, neg = scores
    got = float(losses.cross_entropy_scores(jnp.array(pos), jnp.array(neg),
                                            reduction=reduction))
    y_pred = torch.cat([torch.from_numpy(pos).unsqueeze(1), torch.from_numpy(neg)], 1)
    labels = torch.zeros(pos.shape[0], dtype=torch.int64)
    want = F.cross_entropy(y_pred, labels, reduction=reduction.lower()).item()
    assert got == pytest.approx(want, rel=1e-5)


def _binary_pair(pos, neg):
    y = torch.cat([torch.from_numpy(pos), torch.from_numpy(neg).flatten()])
    t = torch.cat([torch.ones(pos.shape[0]), torch.zeros(neg.size)])
    return y, t


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_bce_after_sigmoid(scores, reduction):
    pos, neg = scores
    got = float(losses.bce_after_sigmoid(jnp.array(pos), jnp.array(neg), reduction=reduction))
    y, t = _binary_pair(pos, neg)
    want = F.binary_cross_entropy(y.sigmoid(), t, reduction=reduction.lower()).item()
    assert got == pytest.approx(want, rel=1e-4)


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_bce_with_logits(scores, reduction):
    pos, neg = scores
    got = float(losses.bce_with_logits(jnp.array(pos), jnp.array(neg), reduction=reduction))
    y, t = _binary_pair(pos, neg)
    want = F.binary_cross_entropy_with_logits(y, t, reduction=reduction.lower()).item()
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_mse(scores, reduction):
    pos, neg = scores
    got = float(losses.mse_loss(jnp.array(pos), jnp.array(neg), reduction=reduction))
    y, t = _binary_pair(pos, neg)
    want = F.mse_loss(y, t, reduction=reduction.lower()).item()
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("reduction", ["SUM", "MEAN"])
def test_softplus(scores, reduction):
    pos, neg = scores
    got = float(losses.softplus_loss(jnp.array(pos), jnp.array(neg), reduction=reduction))
    y, t = _binary_pair(pos, neg)
    labels = 2 * t - 1
    loss = F.softplus(-labels * y)
    want = (loss.sum() if reduction == "SUM" else loss.mean()).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_classification_ce():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=(16,)).astype(np.int32)
    got = float(losses.classification_cross_entropy(
        jnp.array(logits), jnp.array(labels), reduction="SUM"))
    want = F.cross_entropy(torch.from_numpy(logits),
                           torch.from_numpy(labels).long(), reduction="sum").item()
    assert got == pytest.approx(want, rel=1e-5)


def test_mask_zeroes_padded_edges(scores):
    pos, neg = scores
    mask = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    got = float(losses.softmax_ce(jnp.array(pos), jnp.array(neg),
                                  reduction="SUM", mask=jnp.array(mask)))
    want = torch_softmax_ce(pos[:4], neg[:4], "SUM")
    assert got == pytest.approx(want, rel=1e-5)


def test_norm_regularizer():
    """nn/regularizer.cpp:6 parity: coefficient * mean of p-powered row norms."""
    import jax.numpy as jnp
    import numpy as np
    from marius_tpu.nn.regularizer import norm_regularizer

    x = jnp.asarray([[3.0, 4.0], [0.0, 2.0]])
    np.testing.assert_allclose(float(norm_regularizer(x, p=2)), (25 + 4) / 2)
    np.testing.assert_allclose(float(norm_regularizer(x, p=1, coefficient=0.5)),
                               0.5 * (7 + 2) / 2)
