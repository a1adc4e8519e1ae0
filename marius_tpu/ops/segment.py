"""Segment reductions and masked-fanout aggregation primitives for GNN layers.

The reference's GNN aggregation is `index_add_`-based segmented sums over CSR
offsets plus a CUDA-only segment-max for GAT softmax (nn/layers/layer_helpers.cpp
:11-66, src/cuda/segment_csr_cuda.cu). On TPU we provide two layouts:

  * dense padded-fanout (n, F, d) with a (n, F) mask — the primary layout; all
    reductions are plain masked jnp ops that fuse into the surrounding matmuls
    (no scatter at all), and

  * flat segment ops over `segment_ids` for ragged/CSR paths, built on
    jax.ops.segment_* with static num_segments.

Unlike the reference, segment-max here works on every backend and is
differentiable (JAX derives the scatter-by-argmax backward automatically).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Dense padded-fanout layout (primary TPU layout)
# ---------------------------------------------------------------------------


def masked_sum(nbr: Array, mask: Array) -> Array:
    """(n, F, d), (n, F) -> (n, d) sum over valid fanout slots."""
    return jnp.einsum("nfd,nf->nd", nbr, mask.astype(nbr.dtype))


def masked_mean(nbr: Array, mask: Array) -> Array:
    """Mean over valid fanout slots; all-masked rows yield zeros."""
    m = mask.astype(nbr.dtype)
    total = jnp.einsum("nfd,nf->nd", nbr, m)
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    return total / denom


def masked_max(nbr: Array, mask: Array, neg_fill: float = -1e9) -> Array:
    filled = jnp.where(mask[..., None], nbr, neg_fill)
    return jnp.max(filled, axis=1)


def masked_softmax(logits: Array, mask: Array, axis: int = 1) -> Array:
    """Numerically stable softmax over the fanout axis with invalid slots at 0
    probability; fully-masked rows return all zeros (GAT attention_softmax,
    layer_helpers.cpp:44-66, without the CUDA segment-max dependency)."""
    neg = jnp.finfo(logits.dtype).min
    masked_logits = jnp.where(mask, logits, neg)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    e = jnp.exp(masked_logits - jax.lax.stop_gradient(m)) * mask.astype(logits.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)


# ---------------------------------------------------------------------------
# Flat segment ops (CSR-style fallback paths)
# ---------------------------------------------------------------------------


def segment_ids_from_offsets(offsets: Array, total: int) -> Array:
    """CSR offsets (n+1,) -> segment ids (total,) (layer_helpers.cpp:11-17)."""
    ids = jnp.zeros((total,), jnp.int32)
    ids = ids.at[offsets[1:-1]].add(1)
    return jnp.cumsum(ids)


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: Array, segment_ids: Array, num_segments: int) -> Array:
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[:1], data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(counts, 1.0)[:, None]


def segment_max(data: Array, segment_ids: Array, num_segments: int) -> Array:
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(logits: Array, segment_ids: Array, num_segments: int,
                    mask: Optional[Array] = None) -> Array:
    """Per-segment softmax over a flat logits vector (GAT CSR path)."""
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - jax.lax.stop_gradient(seg_max)[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = e * mask.astype(e.dtype)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    return e / jnp.maximum(denom, 1e-16)[segment_ids]
