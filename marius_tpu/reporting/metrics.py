"""Evaluation metrics: ranking (MRR / Hits@k / MeanRank) and classification accuracy.

Behavioral parity with reporting/reporting.cpp: computeRanks (:55-57) defines
rank = (neg_scores >= pos_score).sum(1) + 1; metric classes Hits@k (:11),
MeanRank (:19), MRR (:26), CategoricalAccuracy (:33). Written as masked device
functions that reduce to streaming (sum, count) pairs so the whole evaluation
runs as one jitted scan with static shapes — no host-side rank concatenation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def compute_ranks(pos_scores: Array, neg_scores: Array,
                  neg_mask: Optional[Array] = None) -> Array:
    """rank_i = |{j : neg_ij >= pos_i}| + 1 (reporting.cpp:55-57).

    ``neg_mask (B, N)`` marks valid negative slots; padded slots never count.
    """
    ge = neg_scores >= pos_scores[:, None]
    if neg_mask is not None:
        ge = ge & neg_mask
    return jnp.sum(ge, axis=1).astype(jnp.int32) + 1


def rank_statistics(ranks: Array, mask: Optional[Array] = None,
                    hits_ks=(1, 3, 5, 10, 50, 100)) -> Dict[str, Array]:
    """Streaming-accumulable sums: {count, rr_sum, rank_sum, hits{k}_sum}."""
    r = ranks.astype(jnp.float32)
    m = jnp.ones_like(r) if mask is None else mask.astype(jnp.float32)
    out = {
        "count": jnp.sum(m),
        "rr_sum": jnp.sum(m / r),
        "rank_sum": jnp.sum(m * r),
    }
    for k in hits_ks:
        out[f"hits{k}_sum"] = jnp.sum(m * (r <= k))
    return out


def finalize_rank_statistics(acc: Dict[str, Array]) -> Dict[str, float]:
    """Turn accumulated sums into MRR / MeanRank / Hits@k."""
    count = max(float(acc["count"]), 1.0)
    out = {
        "num_evaluated": float(acc["count"]),
        "mrr": float(acc["rr_sum"]) / count,
        "mean_rank": float(acc["rank_sum"]) / count,
    }
    for key, val in acc.items():
        if key.startswith("hits") and key.endswith("_sum"):
            out["hits@" + key[4:-4]] = float(val) / count
    return out


def categorical_accuracy_statistics(logits: Array, labels: Array,
                                    mask: Optional[Array] = None) -> Dict[str, Array]:
    """Streaming (correct, count) for NC accuracy (reporting.cpp:33)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels.astype(pred.dtype)).astype(jnp.float32)
    m = jnp.ones_like(correct) if mask is None else mask.astype(jnp.float32)
    return {"correct": jnp.sum(correct * m), "count": jnp.sum(m)}
