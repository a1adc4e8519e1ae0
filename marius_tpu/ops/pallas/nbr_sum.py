"""Pallas TPU kernel: fused bucketed gather-sum (full-graph neighbor sum).

The hot op of full-graph GNN training (data/full_graph.py make_nbr_sums) is
``x_pad[nbr].sum(axis=1)`` per degree bucket — XLA materializes the gathered
(slots, d) block in HBM and reduces it in a second pass, paying write+read
of the whole block on top of the random-row reads. This kernel streams
neighbor rows from HBM with grouped double-buffered DMAs (the proven
per-row-DMA pattern of ops/pallas/gather.py) and accumulates in VMEM, so
HBM traffic is ONE random read per slot plus the (n, d) output write.

Per pipeline stage it issues GROUP row DMAs into a (GROUP, d) scratch tile
and folds them with one VPU reduction — (8, 128)-shaped adds instead of
per-slot (1, d) adds — while the next group's DMAs are in flight.

Accumulation runs in f32 regardless of input dtype (bf16 sums over
thousand-degree hubs would lose mass), matching XLA's reduce semantics.

Use via ``gather_sum_auto``; selection follows the measured win/loss policy
of ops/pallas/__init__ (TPU backend + lane-aligned rows + slot threshold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8            # rows per DMA group = one VPU reduction tile
N_BUF = 2            # groups in flight (2*GROUP row DMAs)
TARGET_SLOTS = 2048  # ids per grid program (rows*cap), sized for SMEM
MAX_CAP = 256        # widest row per kernel call: keeps rows >= 8 (Mosaic
                     # needs 8-aligned SMEM row blocks); wider rows are
                     # reshaped into MAX_CAP-slot virtual rows + a tiny
                     # final reduce (see gather_sum_pallas)


def _kernel(ids_ref, x_ref, out_ref, scratch, sems, *, rows: int, cap: int):
    gpr = cap // GROUP            # groups per output row
    total = rows * gpr

    def dma(buf, t, g):
        r, c = g // gpr, (g % gpr) * GROUP + t
        return pltpu.make_async_copy(
            x_ref.at[ids_ref[r, c]],
            scratch.at[buf, t],
            sems.at[buf, t],
        )

    def start_group(g):
        for t in range(GROUP):
            dma(g % N_BUF, t, g).start()

    for w in range(min(N_BUF - 1, total)):
        start_group(w)

    d = out_ref.shape[-1]

    def body(g, acc):
        @pl.when(g + N_BUF - 1 < total)
        def _():
            start_group(g + N_BUF - 1)

        for t in range(GROUP):
            dma(g % N_BUF, t, g).wait()
        acc = acc + jnp.sum(
            scratch[g % N_BUF].astype(jnp.float32), axis=0, keepdims=True)
        row_done = (g % gpr) == (gpr - 1)

        @pl.when(row_done)
        def _():
            # out is always f32 (cast happens outside): Mosaic can't prove
            # 16-row alignment for single-row bf16 vector stores
            out_ref[pl.ds(g // gpr, 1), :] = acc

        return jnp.where(row_done, jnp.zeros_like(acc), acc)

    jax.lax.fori_loop(0, total, body, jnp.zeros((1, d), jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_sum_pallas(x_pad: jax.Array, ids: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """out[r] = sum_t x_pad[ids[r, t]] for ids (n, cap) int32.

    ``x_pad`` must already carry the zero sentinel row that padding ids point
    at (the make_nbr_sums convention); rows need d % 128 == 0 for lane-aligned
    row DMAs. cap is padded to a GROUP multiple and grid rows to a block
    multiple internally (extra slots read the zero sentinel)."""
    n, cap = ids.shape
    d = x_pad.shape[1]
    assert d % 128 == 0, \
        "row DMA needs lane-aligned rows (Mosaic tiling); pad dim to 128"
    sentinel = x_pad.shape[0] - 1
    if cap > MAX_CAP:
        # hub buckets: split each wide row into MAX_CAP-slot virtual rows
        # (padding reads the zero sentinel), sum those with the same kernel,
        # then fold the per-row chunks with one small XLA reduce
        chunks = -(-cap // MAX_CAP)
        ids = jnp.pad(ids, ((0, 0), (0, chunks * MAX_CAP - cap)),
                      constant_values=sentinel)
        part = gather_sum_pallas(x_pad, ids.reshape(n * chunks, MAX_CAP),
                                 interpret=interpret)
        return jnp.sum(part.reshape(n, chunks, d).astype(jnp.float32),
                       axis=1).astype(x_pad.dtype)
    cap_pad = -(-cap // GROUP) * GROUP
    rows = max(GROUP, TARGET_SLOTS // cap_pad // GROUP * GROUP)
    n_pad = -(-n // rows) * rows
    if cap_pad != cap or n_pad != n:
        ids = jnp.pad(ids, ((0, n_pad - n), (0, cap_pad - cap)),
                      constant_values=sentinel)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, cap=cap_pad),
        grid=(n_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, cap_pad), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, GROUP, d), x_pad.dtype),
            pltpu.SemaphoreType.DMA((N_BUF, GROUP)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(ids, x_pad)
    return out[:n]
