"""Norm regularization over embedding batches.

Parity with the reference Regularizer (nn/regularizer.cpp:6): coefficient *
mean of the p-th power of row norms, addable to any loss. Like the reference,
it is not wired into the main training path by default; pass the result into
your loss when composing models via the Python API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def norm_regularizer(embeddings: Array, p: int = 2,
                     coefficient: float = 1.0) -> Array:
    """coefficient * mean_i ||e_i||_p^p (NormRegularizer::operator())."""
    return coefficient * jnp.mean(jnp.sum(jnp.abs(embeddings) ** p, axis=-1))
