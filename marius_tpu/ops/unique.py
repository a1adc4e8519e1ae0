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
