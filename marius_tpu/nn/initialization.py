"""Tensor initialization distributions.

Behavioral parity with the reference's nn/initialization.cpp:7-119 (compute_fans,
glorot_{uniform,normal}, uniform/normal/constant/zeros/ones), re-expressed with
JAX PRNG keys so initialization is reproducible and shardable: large embedding
tables are initialized directly on device (optionally shard-by-shard), replacing
the reference's chunked host-file initialization (storage/io.cpp:167-188).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class InitConfig:
    """Mirrors the reference InitConfig (configuration/config.h + marius_config.py:130)."""

    distribution: str = "GLOROT_UNIFORM"  # ZEROS|ONES|CONSTANT|UNIFORM|NORMAL|GLOROT_UNIFORM|GLOROT_NORMAL
    constant: float = 0.0
    scale_factor: float = 0.001
    mean: float = 0.0
    std: float = 1.0


def compute_fans(shape: Sequence[int]) -> Tuple[int, int]:
    """Fan computation identical to initialization.cpp:7-24."""
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    # 2D: (fan_in, fan_out) = (shape[0], shape[1]); >2D uses the last two dims.
    return shape[-2], shape[-1]


def initialize_tensor(
    key: jax.Array,
    config: InitConfig,
    shape: Sequence[int],
    dtype=jnp.float32,
    fans: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Draw a tensor from the configured distribution.

    ``fans`` overrides the fan computation — used to initialize a sub-block of a
    larger tensor with the full tensor's scaling (initialize_subtensor,
    initialization.cpp:101-119).
    """
    dist = config.distribution.upper()
    shape = tuple(int(s) for s in shape)

    if dist == "ZEROS":
        return jnp.zeros(shape, dtype)
    if dist == "ONES":
        return jnp.ones(shape, dtype)
    if dist == "CONSTANT":
        return jnp.full(shape, config.constant, dtype)
    if dist == "UNIFORM":
        return config.scale_factor * jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
    if dist == "NORMAL":
        return config.mean + config.std * jax.random.normal(key, shape, dtype)

    fan_in, fan_out = fans if fans is not None else compute_fans(shape)
    if dist == "GLOROT_UNIFORM":
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)
    if dist == "GLOROT_NORMAL":
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)
    raise ValueError(f"Unknown initialization distribution: {config.distribution}")
