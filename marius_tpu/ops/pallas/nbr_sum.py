"""Pallas TPU kernel: fused bucketed gather-sum (full-graph neighbor sum).

The hot op of full-graph GNN training (data/full_graph.py make_nbr_sums) is
``x_pad[nbr].sum(axis=1)`` per degree bucket — XLA materializes the gathered
(slots, d) block in HBM and reduces it in a second pass, paying write+read
of the whole block on top of the random-row reads. This kernel streams each
neighbor row from HBM with double-buffered per-row DMAs (the proven pattern
of ops/pallas/gather.py) and accumulates in VMEM, so HBM traffic is ONE
random read per slot plus the (n, d) output write.

Accumulation runs in f32 regardless of input dtype (bf16 sums over
thousand-degree hubs would lose mass), matching XLA's reduce semantics.

Use via ``gather_sum_auto`` or pass ``use_pallas`` to
data/full_graph.make_nbr_sums; selection follows the measured win/loss
policy of ops/pallas/__init__ (TPU backend + lane-aligned rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BUF = 8            # in-flight row DMAs
TARGET_SLOTS = 2048  # ids per grid program (rows*cap), sized for SMEM


def _kernel(ids_ref, x_ref, out_ref, scratch, sems, *, rows: int, cap: int):
    total = rows * cap

    def dma(slot, k):
        return pltpu.make_async_copy(
            x_ref.at[ids_ref[k // cap, k % cap]],
            scratch.at[slot],
            sems.at[slot],
        )

    for w in range(min(N_BUF - 1, total)):
        dma(w, w).start()

    d = out_ref.shape[-1]

    def body(k, acc):
        @pl.when(k + N_BUF - 1 < total)
        def _():
            dma((k + N_BUF - 1) % N_BUF, k + N_BUF - 1).start()

        dma(k % N_BUF, k).wait()
        acc = acc + scratch[pl.ds(k % N_BUF, 1), :].astype(jnp.float32)
        row_done = (k % cap) == (cap - 1)

        @pl.when(row_done)
        def _():
            out_ref[pl.ds(k // cap, 1), :] = acc.astype(out_ref.dtype)

        return jnp.where(row_done, jnp.zeros_like(acc), acc)

    jax.lax.fori_loop(0, total, body, jnp.zeros((1, d), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_sum_pallas(x_pad: jax.Array, ids: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """out[r] = sum_t x_pad[ids[r, t]] for ids (n, cap) int32.

    ``x_pad`` must already carry the zero sentinel row that padding ids point
    at (the make_nbr_sums convention); rows need d % 128 == 0 for lane-aligned
    row DMAs. Grid rows are padded internally and sliced off."""
    n, cap = ids.shape
    d = x_pad.shape[1]
    assert d % 128 == 0, \
        "row DMA needs lane-aligned rows (Mosaic tiling); pad dim to 128"
    rows = max(1, TARGET_SLOTS // cap)
    n_pad = -(-n // rows) * rows
    if n_pad != n:
        ids = jnp.pad(ids, ((0, n_pad - n), (0, 0)),
                      constant_values=x_pad.shape[0] - 1)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, cap=cap),
        grid=(n_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, cap), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, d), x_pad.dtype),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(ids, x_pad)
    return out[:n]
