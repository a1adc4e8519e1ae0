"""Pallas TPU kernel: fused row-sparse Adagrad update, in place.

The reference applies the rule on gathered rows then indexAdds back
(batch.cpp:62-79 + buffer.cpp:460); XLA expresses that as two scatters (values
.add, state .set), each a serialized row walk over the table. This kernel
fuses the whole read-modify-write per row — DMA the (values, state) rows in,
apply `state += g^2; values -= lr*g/(sqrt(state)+eps)` on the VPU, DMA back —
with the table aliased in-place (input_output_aliases) so nothing is copied.

ids must be UNIQUE (duplicate rows would race, same requirement as the
reference's indexAdd) and pre-clamped; rows whose grad is all-zero are still
written back unchanged (harmless).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marius_tpu.parallel.embedding_table import ADAGRAD_EPS

BLOCK = 256


def _adagrad_kernel(ids_ref, lr_ref, grads_ref, values_hbm, state_hbm,
                    values_out, state_out, vrow, srow, sems):
    pid = pl.program_id(0)
    lr = lr_ref[0, 0]

    def body(i, _):
        rid = ids_ref[pid * BLOCK + i]
        in_v = pltpu.make_async_copy(values_hbm.at[rid], vrow.at[0], sems.at[0])
        in_s = pltpu.make_async_copy(state_hbm.at[rid], srow.at[0], sems.at[1])
        in_v.start()
        in_s.start()
        in_v.wait()
        in_s.wait()
        g = grads_ref[i, :]
        new_s = srow[0, :] + g * g
        new_v = vrow[0, :] - lr * g / (jnp.sqrt(new_s) + ADAGRAD_EPS)
        srow[0, :] = new_s
        vrow[0, :] = new_v
        out_v = pltpu.make_async_copy(vrow.at[0], values_out.at[rid], sems.at[2])
        out_s = pltpu.make_async_copy(srow.at[0], state_out.at[rid], sems.at[3])
        out_v.start()
        out_s.start()
        out_v.wait()
        out_s.wait()
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def sparse_adagrad_update_pallas(values: jax.Array, state: jax.Array,
                                 ids: jax.Array, grads: jax.Array, lr,
                                 interpret: bool = False):
    """In-place `state[ids] += g^2; values[ids] -= lr*g/(sqrt(state)+eps)`.
    ids unique, clamped to [0, N), padded with a dedicated scratch row id
    whose grads are zero. Returns (values, state)."""
    k = ids.shape[0]
    assert k % BLOCK == 0
    d = values.shape[1]
    assert d % 128 == 0, \
        "row DMA needs lane-aligned rows (Mosaic tiling); pad dim to 128"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, ids: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK, d), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((1, d), values.dtype),
            pltpu.VMEM((1, d), state.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    lr_arr = jnp.asarray([[lr]], values.dtype)
    return pl.pallas_call(
        _adagrad_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(values.shape, values.dtype),
                   jax.ShapeDtypeStruct(state.shape, state.dtype)),
        input_output_aliases={3: 0, 4: 1},  # +1 for the scalar-prefetch arg
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, lr_arr, grads, values, state)
