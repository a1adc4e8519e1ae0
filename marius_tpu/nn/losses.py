"""Loss functions for link prediction (score-based) and node classification.

Behavioral parity with the reference's nn/loss.cpp:51-198 (SoftmaxCE, Ranking,
CrossEntropy, BCEAfterSigmoid, BCEWithLogits, MSE, SoftPlus) but written as pure
masked functions: every loss takes an optional per-edge/per-node validity mask so
padded (static-shape) batches contribute exactly zero — this is what lets the
whole epoch run as one compiled lax.scan on TPU.

Score losses take ``pos_scores (B,)`` and ``neg_scores (B, N)``.
Classification losses take ``logits (B, C)`` and integer ``labels (B,)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _reduce(per_example: Array, mask: Optional[Array], reduction: str) -> Array:
    """SUM/MEAN reduction over valid examples (loss.cpp reduction options)."""
    if mask is not None:
        per_example = per_example * mask.astype(per_example.dtype)
    if reduction.upper() == "SUM":
        return jnp.sum(per_example)
    if reduction.upper() == "MEAN":
        if mask is None:
            return jnp.mean(per_example)
        denom = jnp.maximum(jnp.sum(mask.astype(per_example.dtype)), 1.0)
        return jnp.sum(per_example) / denom
    if reduction.upper() == "NONE":
        return per_example
    raise ValueError(f"Unknown reduction: {reduction}")


def _flat_mask(mask: Optional[Array], n: int) -> Optional[Array]:
    """Broadcast a (B,) edge mask to the flattened (B*(1+N),) pos+neg layout."""
    if mask is None:
        return None
    return jnp.repeat(mask, n)


def softmax_ce(pos_scores: Array, neg_scores: Array, *, reduction: str = "MEAN",
               mask: Optional[Array] = None, neg_mask: Optional[Array] = None) -> Array:
    """2-way CE between pos and logsumexp(neg): loss.cpp:51-68.

    per-edge loss = logsumexp([pos, lse(neg)]) - pos = softplus(lse(neg) - pos).
    ``neg_mask (B, N)`` excludes padded negative slots from the logsumexp.
    """
    if neg_mask is not None:
        neg_scores = jnp.where(neg_mask, neg_scores, -jnp.inf)
    lse = jax.nn.logsumexp(neg_scores, axis=1)
    per_edge = jax.nn.softplus(lse - pos_scores)
    return _reduce(per_edge, mask, reduction)


def ranking_loss(pos_scores: Array, neg_scores: Array, *, margin: float = 0.1,
                 reduction: str = "MEAN", mask: Optional[Array] = None,
                 neg_mask: Optional[Array] = None) -> Array:
    """Margin ranking loss with target=-1 (loss.cpp:70-87):
    elementwise max(0, neg - pos + margin), reduced over all (B, N) elements."""
    per_elem = jnp.maximum(neg_scores - pos_scores[:, None] + margin, 0.0)
    m = None
    if mask is not None:
        m = jnp.broadcast_to(mask[:, None], per_elem.shape)
    if neg_mask is not None:
        m = neg_mask if m is None else (m & neg_mask)
    return _reduce(per_elem.reshape(-1), None if m is None else m.reshape(-1), reduction)


def cross_entropy_scores(pos_scores: Array, neg_scores: Array, *, reduction: str = "MEAN",
                         mask: Optional[Array] = None, neg_mask: Optional[Array] = None) -> Array:
    """CE over [pos, neg_0..neg_N] with target index 0 (loss.cpp:89-102):
    per-edge = logsumexp(all scores) - pos."""
    if neg_mask is not None:
        neg_scores = jnp.where(neg_mask, neg_scores, -jnp.inf)
    all_scores = jnp.concatenate([pos_scores[:, None], neg_scores], axis=1)
    per_edge = jax.nn.logsumexp(all_scores, axis=1) - pos_scores
    return _reduce(per_edge, mask, reduction)


def _binary_targets_flat(pos_scores: Array, neg_scores: Array):
    """cat([pos, neg.flatten()]) with labels cat([1s, 0s]) — scores_to_labels
    (loss.cpp:37-48) for the one_hot=true losses."""
    y = jnp.concatenate([pos_scores, neg_scores.reshape(-1)])
    t = jnp.concatenate([jnp.ones_like(pos_scores), jnp.zeros_like(neg_scores).reshape(-1)])
    return y, t


def bce_after_sigmoid(pos_scores: Array, neg_scores: Array, *, reduction: str = "MEAN",
                      mask: Optional[Array] = None) -> Array:
    """BCE on sigmoid(scores) vs {1,0} targets (loss.cpp:104-119)."""
    y, t = _binary_targets_flat(pos_scores, neg_scores)
    p = jnp.clip(jax.nn.sigmoid(y), 1e-12, 1.0 - 1e-12)
    per = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    m = None
    if mask is not None:
        m = jnp.concatenate([mask, _flat_mask(mask, neg_scores.shape[1])])
    return _reduce(per, m, reduction)


def bce_with_logits(pos_scores: Array, neg_scores: Array, *, reduction: str = "MEAN",
                    mask: Optional[Array] = None) -> Array:
    """Numerically-stable BCE-with-logits (loss.cpp:121-136)."""
    y, t = _binary_targets_flat(pos_scores, neg_scores)
    per = jnp.maximum(y, 0.0) - y * t + jax.nn.softplus(-jnp.abs(y))
    m = None
    if mask is not None:
        m = jnp.concatenate([mask, _flat_mask(mask, neg_scores.shape[1])])
    return _reduce(per, m, reduction)


def mse_loss(pos_scores: Array, neg_scores: Array, *, reduction: str = "MEAN",
             mask: Optional[Array] = None) -> Array:
    """MSE of raw scores vs {1,0} targets (loss.cpp:138-153)."""
    y, t = _binary_targets_flat(pos_scores, neg_scores)
    per = (y - t) ** 2
    m = None
    if mask is not None:
        m = jnp.concatenate([mask, _flat_mask(mask, neg_scores.shape[1])])
    return _reduce(per, m, reduction)


def softplus_loss(pos_scores: Array, neg_scores: Array, *, reduction: str = "MEAN",
                  mask: Optional[Array] = None) -> Array:
    """softplus(-label * score) with labels in {+1,-1} (loss.cpp:155-175)."""
    y, t = _binary_targets_flat(pos_scores, neg_scores)
    labels = 2.0 * t - 1.0
    per = jax.nn.softplus(-labels * y)
    m = None
    if mask is not None:
        m = jnp.concatenate([mask, _flat_mask(mask, neg_scores.shape[1])])
    return _reduce(per, m, reduction)


def classification_cross_entropy(logits: Array, labels: Array, *, reduction: str = "MEAN",
                                 mask: Optional[Array] = None) -> Array:
    """Standard softmax CE for node classification (loss.cpp CrossEntropyLoss,
    classification branch)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    return _reduce(per, mask, reduction)


_SCORE_LOSSES = {
    "SOFTMAX_CE": softmax_ce,
    "RANKING": ranking_loss,
    "CROSS_ENTROPY": cross_entropy_scores,
    "BCE_AFTER_SIGMOID": bce_after_sigmoid,
    "BCE_WITH_LOGITS": bce_with_logits,
    "MSE": mse_loss,
    "SOFTPLUS": softplus_loss,
}


def get_loss_function(loss_type: str, *, reduction: str = "MEAN", margin: float = 0.1):
    """Factory mirroring getLossFunction (loss.cpp:177-198). Returns
    f(pos_scores, neg_scores, mask=None, neg_mask=None) -> scalar."""
    lt = loss_type.upper()
    custom = None
    if lt not in _SCORE_LOSSES:
        from marius_tpu.nn import registry
        custom = registry.loss(lt)
        if custom is None:
            raise ValueError(f"Unsupported loss function type: {loss_type}")
    fn = custom or _SCORE_LOSSES[lt]

    def apply(pos_scores, neg_scores, mask=None, neg_mask=None):
        kwargs = dict(reduction=reduction, mask=mask)
        if custom is not None or lt in ("SOFTMAX_CE", "RANKING", "CROSS_ENTROPY"):
            kwargs["neg_mask"] = neg_mask
        if lt == "RANKING":
            kwargs["margin"] = margin
        return fn(pos_scores, neg_scores, **kwargs)

    return apply
