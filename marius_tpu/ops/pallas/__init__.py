"""Pallas TPU kernels for the framework's hot ops.

Measured on TPU v5e (bench_kernels.py): the DMA-streaming row gather beats
XLA's gather once the table exceeds ~0.5M rows (27us -> 15us at 1M x 128);
below that XLA ties or wins, and XLA's scatter beats the row-DMA Adagrad
kernel at every size measured, so `sparse_adagrad_update_pallas` is kept as a
reference implementation but not selected by default.

`gather_rows_auto` routes per call: Pallas when (TPU backend, lane-aligned
rows, big table), else jnp.take.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from marius_tpu.ops.pallas.adagrad import sparse_adagrad_update_pallas  # noqa: F401
from marius_tpu.ops.pallas.gather import BLOCK, gather_rows_pallas  # noqa: F401
from marius_tpu.ops.pallas.nbr_sum import gather_sum_pallas  # noqa: F401

PALLAS_GATHER_MIN_ROWS = 500_000
# fused bucketed gather-sum (full-graph neighbor aggregation): measured on
# v5e (bench_kernels.bench_gather_sum + end-to-end bench_nc_full) XLA's
# gather+reduce ties or wins at every arxiv-scale bucket shape, and routing
# the full-graph epoch through the kernel REGRESSED end-to-end throughput
# 22.4k -> 14.1k nodes/s. Kernel kept as a reference implementation;
# opt back in with MARIUS_TPU_PALLAS_GATHER_SUM=1 after re-measuring.
PALLAS_GATHER_SUM_MIN_SLOTS = 200_000
_GATHER_SUM_OPT_IN = os.environ.get("MARIUS_TPU_PALLAS_GATHER_SUM") == "1"


def pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def gather_sum_opt_in() -> bool:
    """True when the env opts the full-graph neighbor sum into the Pallas
    row-DMA kernel. The default is the transposed-gather XLA pipeline
    (data/full_graph.py transpose_buckets), which measured 3.9 ns/slot vs the
    kernel's ~11 ns/slot on v5e at arxiv scale."""
    return (os.environ.get("MARIUS_TPU_PALLAS_GATHER_SUM") == "1"
            and pallas_supported())


def gather_rows_auto(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows, choosing the faster backend. ids must be pre-clamped;
    any id count accepted (pads to the kernel block internally)."""
    n, d = table.shape
    if (pallas_supported() and d % 128 == 0
            and n >= PALLAS_GATHER_MIN_ROWS):
        k = ids.shape[0]
        pad = (-k) % BLOCK
        if pad:
            ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        return gather_rows_pallas(table, ids)[:k]
    return jnp.take(table, ids, axis=0)


def gather_sum_auto(x_pad: jax.Array, ids: jax.Array) -> jax.Array:
    """Fused bucketed gather-sum, choosing the faster backend: the Pallas
    row-streaming kernel avoids materializing the (slots, d) gathered block
    in HBM; XLA's gather+reduce wins on small buckets."""
    n, cap = ids.shape
    d = x_pad.shape[1]
    if (_GATHER_SUM_OPT_IN and pallas_supported() and d % 128 == 0
            and n * cap >= PALLAS_GATHER_SUM_MIN_SLOTS):
        return gather_sum_pallas(x_pad, ids)
    return jnp.sum(jnp.take(x_pad, ids, axis=0), axis=1)
