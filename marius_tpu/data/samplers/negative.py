"""Corrupt-node negative sampling, executed on-device inside the jitted step.

Behavioral parity with CorruptNodeNegativeSampler (data/samplers/negative.cpp:
313-366): per chunk, `num_uniform = num_negatives*(1-degree_fraction)` node ids
drawn uniformly from [0, num_nodes) plus `num_batch` ids taken from the batch's
own edge endpoints (batch_sample, :7-19). Filtered mode scores against ALL
nodes (num_chunks=1), handled by the evaluator with edge-key filters instead of
materializing per-edge negative lists.

The reference samples with torch RNG on the GPU inside the dataloader thread;
here sampling is a pure function of a threaded PRNG key, so it runs inside the
compiled lax.scan epoch with zero host involvement and is exactly reproducible.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NegativeSamplingConfig:
    """Mirrors NegativeSamplingConfig (marius_config.py:607)."""

    num_chunks: int = 10
    negatives_per_positive: int = 500
    degree_fraction: float = 0.0
    filtered: bool = False


class NegativeSample(NamedTuple):
    ids: Array                      # (num_chunks, num_negatives) int32 node ids
    deg_sample_indices: Optional[Array]  # (num_chunks, num_batch) batch-edge rows or None


def sample_negatives(
    key: jax.Array,
    config: NegativeSamplingConfig,
    edges: Array,        # (B, 2|3) int32 — batch edges (padded rows allowed)
    num_nodes: int,
    inverse: bool,       # True -> corrupt src (sample from src column), else dst
    valid_rows=None,     # int scalar: only sample in-batch rows < valid_rows
                         # (the reference's ragged final batch has no padded
                         # rows to over-draw, negative.cpp batch_sample :7-19)
) -> NegativeSample:
    """Draw one direction's negatives for a batch.

    The degree-based portion takes endpoint ids from uniformly-sampled batch
    edges (negative.cpp batch_sample :7-19) — sampling frequency proportional
    to in-batch degree.
    """
    c = config.num_chunks
    n = config.negatives_per_positive
    num_batch = int(n * config.degree_fraction)
    num_uni = n - num_batch

    k_uni, k_deg = jax.random.split(key)
    uni = jax.random.randint(k_uni, (c, num_uni), 0, num_nodes, dtype=jnp.int32)

    if num_batch == 0:
        return NegativeSample(uni, None)

    b = edges.shape[0] if valid_rows is None else valid_rows
    rows = jax.random.randint(k_deg, (c, num_batch), 0, b, dtype=jnp.int32)
    col = 0 if inverse else edges.shape[1] - 1
    deg = edges[:, col][rows]
    # deg-sampled negatives come first, matching torch::cat({deg_sample, uniform})
    # in negative.cpp:344 so downstream local filters index the same slots.
    return NegativeSample(jnp.concatenate([deg, uni], axis=1), rows)
