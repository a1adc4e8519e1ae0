"""Pallas TPU kernel: embedding row gather with double-buffered DMA.

The hot op of every batch is gathering O(10k) embedding rows from the
HBM-resident table (the reference's `index_select`, dataloader.cpp:508-546).
XLA lowers this to its generic gather; this kernel instead streams rows with
explicit per-row DMAs, double-buffered so the next row's fetch overlaps the
current row's copy-out (pallas_guide.md "Patterns: Double Buffering" +
PrefetchScalarGridSpec for the index-dependent source offsets).

Use `gather_rows_pallas(table, ids)`; ids must be pre-clamped to [0, N).
`marius_tpu.ops.pallas.tune.gather_backend()` picks kernel vs jnp.take from a
measured benchmark (bench_kernels.py) — XLA wins at small row counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024     # ids per grid program — must match XLA's int32
                 # tiling T(1024), or Mosaic rejects the SMEM block layout
N_BUF = 4        # in-flight DMAs


def _gather_kernel(ids_ref, table_ref, out_ref, sems):
    def get_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[i]],
            out_ref.at[i],
            sems.at[slot],
        )

    for w in range(N_BUF - 1):
        get_dma(w, w).start()

    def body(i, _):
        @pl.when(i + N_BUF - 1 < BLOCK)
        def _():
            get_dma((i + N_BUF - 1) % N_BUF, i + N_BUF - 1).start()

        get_dma(i % N_BUF, i).wait()
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(table: jax.Array, ids: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """(K, d) rows of `table` at `ids`; K must be a multiple of BLOCK
    (pad ids with any valid row id). ids must be in [0, num_rows)."""
    k = ids.shape[0]
    assert k % BLOCK == 0, f"pad ids to a multiple of {BLOCK}"
    d = table.shape[1]
    assert d % 128 == 0, \
        "row DMA needs lane-aligned rows (Mosaic tiling); pad dim to 128"
    return pl.pallas_call(
        _gather_kernel,
        grid=(k // BLOCK,),
        in_specs=[
            # ids blocked per program into SMEM (whole-array scalar prefetch
            # would overflow SMEM past ~250k ids)
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # table stays in HBM
        ],
        out_specs=pl.BlockSpec((BLOCK, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, d), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_BUF,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(ids, table)
