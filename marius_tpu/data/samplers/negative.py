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
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NegativeSamplingConfig:
    """Mirrors NegativeSamplingConfig (marius_config.py:607)."""

    num_chunks: int = 10
    negatives_per_positive: int = 500
    degree_fraction: float = 0.0
    filtered: bool = False
    # DEG (default, negative.cpp:21 deg_negative_local_filter) masks the
    # degree-sampled negative slots that reproduce their own source edge;
    # NONE disables the local filter (options.h:84 LocalFilterMode)
    local_filter_mode: str = "DEG"


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


def deg_local_filter_mask(deg_rows: Array, batch_size: int,
                          num_negatives: int) -> Array:
    """(B, num_negatives) bool score filter, True = mask to -1e9.

    Parity with deg_negative_local_filter (data/samplers/negative.cpp:21-48):
    degree-sampled negative slot ``t`` of chunk ``c`` is an endpoint of batch
    edge ``r = deg_rows[c, t]``; when ``r`` itself falls in chunk ``c``,
    scoring edge ``r`` against slot ``t`` reproduces edge ``r`` — a guaranteed
    false negative. Slots are the FIRST ``deg_rows.shape[1]`` columns of the
    per-chunk negative list (the concat order in sample_negatives)."""
    c, nb = deg_rows.shape
    chunk_size = -(-batch_size // c)
    own = (deg_rows // chunk_size) == jnp.arange(c, dtype=jnp.int32)[:, None]
    rows = jnp.where(own, deg_rows, batch_size)       # miss -> dropped row
    cols = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None, :], (c, nb))
    mask = jnp.zeros((batch_size + 1, num_negatives), bool)
    mask = mask.at[rows.reshape(-1), cols.reshape(-1)].set(True, mode="drop")
    return mask[:batch_size]


def local_all_filter_mask(edges: Array, edge_mask: Array, negs: Array,
                          inverse: bool) -> Array:
    """(B, num_negatives) bool filter for LocalFilterMode::ALL
    (negative.cpp:50-197 with global=false): mask any negative that forms a
    TRUE edge of the current batch with the positive's kept endpoint. The
    batch's own edges become an in-jit sorted key set; membership is the same
    lexicographic binary search the global filter uses."""
    from marius_tpu.ops.edge_keys import EdgeKeySet, filter_mask_sampled

    has_rel = edges.shape[1] == 3
    big = jnp.int32(np.iinfo(np.int32).max)
    src = jnp.where(edge_mask, edges[:, 0], big)
    dst = jnp.where(edge_mask, edges[:, -1], big)
    rel = (jnp.where(edge_mask, edges[:, 1], big) if has_rel
           else jnp.zeros_like(src))
    anchor, other = (dst, src) if inverse else (src, dst)
    order = jnp.lexsort((other, rel, anchor))
    keys = EdgeKeySet(anchor=anchor[order], rel=rel[order], other=other[order])
    return filter_mask_sampled(keys, anchor, rel if has_rel else None, negs)


def local_filter_masks(cfg: NegativeSamplingConfig, edges: Array,
                       edge_mask: Array, dst_ns: NegativeSample,
                       src_ns: Optional[NegativeSample]):
    """(dst_filter, src_filter) for unfiltered training/eval per
    cfg.local_filter_mode (getNegatives, negative.cpp:328-366): DEG masks
    deg-sampled self-collisions; ALL masks any in-batch true edge; either
    may be None when nothing applies."""
    dst_f = local_filter_mask_dir(cfg, edges, edge_mask, dst_ns, False)
    src_f = (local_filter_mask_dir(cfg, edges, edge_mask, src_ns, True)
             if src_ns is not None else None)
    return dst_f, src_f


def local_filters_active(cfg: NegativeSamplingConfig) -> bool:
    """True when local_filter_masks will produce a non-None mask for this
    config (used to size static shard_map specs before tracing)."""
    mode = (cfg.local_filter_mode or "DEG").upper()
    if mode == "DEG":
        return int(cfg.negatives_per_positive * cfg.degree_fraction) > 0
    return mode == "ALL"


def local_filter_mask_dir(cfg: NegativeSamplingConfig, edges: Array,
                          edge_mask: Array, ns: NegativeSample,
                          inverse: bool) -> Optional[Array]:
    """One direction's local filter (see local_filter_masks); None when the
    configured mode has nothing to mask."""
    mode = (cfg.local_filter_mode or "DEG").upper()
    if mode == "DEG":
        if ns.deg_sample_indices is None:
            return None
        return deg_local_filter_mask(ns.deg_sample_indices, edges.shape[0],
                                     cfg.negatives_per_positive)
    if mode == "ALL":
        return local_all_filter_mask(edges, edge_mask, ns.ids, inverse)
    return None
