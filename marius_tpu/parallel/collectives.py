"""Explicit collectives for row-sharded embedding tables under shard_map.

The GSPMD path (mesh.py + with_sharding_constraint) lets XLA infer the
collectives; these primitives express them explicitly for full control over
the communication pattern — the TPU equivalent of the reference's NCCL
all_reduce + hogwild host table (SURVEY §2.3): the table is range-sharded
over the `node` mesh axis, each chip owns rows [i*S, (i+1)*S).

- sharded_gather: every chip contributes the requested rows it owns; one
  psum over ICI assembles the full (K, d) block on all chips.
- sharded_scatter_add / sharded_adagrad_update: updates are applied only by
  the owning chip — no communication at all when the per-row grads are
  already replicated (they are, because the loss consumes psum'd gathers).

Use inside jax.shard_map with the table spec P("node", None).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from marius_tpu.parallel.embedding_table import ADAGRAD_EPS

Array = jax.Array


def sharded_gather(table_shard: Array, ids: Array, axis_name: str) -> Array:
    """Gather global rows `ids` (replicated across the axis) from a
    row-sharded table. Returns the full (K, d) block, replicated.

    Each chip masks out rows it does not own and a single psum combines —
    K*d elements over ICI, independent of table size.
    """
    shard_size = table_shard.shape[0]
    me = jax.lax.axis_index(axis_name)
    local = ids - me * shard_size
    mine = (local >= 0) & (local < shard_size)
    rows = jnp.take(table_shard, jnp.clip(local, 0, shard_size - 1), axis=0)
    rows = jnp.where(mine[:, None], rows, 0)
    # Gradient note (context matters!):
    # * differentiating OUTSIDE the shard_map (jax.grad of a function that
    #   contains it): plain psum is exact — shard_map divides the replicated
    #   output's cotangent by the axis size and psum's transpose multiplies
    #   by it, cancelling.
    # * differentiating INSIDE the shard_map body: psum's transpose psums the
    #   per-shard cotangents, overcounting by the axis size — use
    #   sharded_gather_inner_grad there instead (identity backward, since
    #   d(sum_j rows_j)/d(rows_i) = I locally).
    # Both verified against the dense reference in tests/test_collectives.py.
    return jax.lax.psum(rows, axis_name)


def sharded_gather_inner_grad(table_shard: Array, ids: Array,
                              axis_name: str) -> Array:
    """sharded_gather for use where the grad is taken INSIDE the shard_map
    body (e.g. make_sharded_lp_step): forward psum, identity backward."""
    shard_size = table_shard.shape[0]
    me = jax.lax.axis_index(axis_name)
    local = ids - me * shard_size
    mine = (local >= 0) & (local < shard_size)
    rows = jnp.take(table_shard, jnp.clip(local, 0, shard_size - 1), axis=0)
    rows = jnp.where(mine[:, None], rows, 0)
    summed = jax.lax.psum(rows, axis_name)
    return rows + jax.lax.stop_gradient(summed - rows)


def sharded_scatter_add(table_shard: Array, ids: Array, values: Array,
                        axis_name: str) -> Array:
    """Scatter-add replicated (K, d) `values` into the owning shards.
    Duplicate ids accumulate. Zero communication."""
    shard_size = table_shard.shape[0]
    me = jax.lax.axis_index(axis_name)
    local = ids - me * shard_size
    mine = (local >= 0) & (local < shard_size)
    safe = jnp.where(mine, local, shard_size)  # out-of-bounds rows drop
    return table_shard.at[safe].add(
        jnp.where(mine[:, None], values, 0), mode="drop")


def sharded_adagrad_update(values_shard: Array, state_shard: Array,
                           ids: Array, grads: Array, lr: float,
                           axis_name: str) -> Tuple[Array, Array]:
    """Row-sparse Adagrad on a sharded table via a dense local accumulator:
    G_local = scatter-add of owned per-occurrence grads; then the elementwise
    rule on the shard (G == 0 rows are no-ops) — the sharded twin of
    sparse_adagrad_update_dense_accum. ids need NOT be unique."""
    shard_size = values_shard.shape[0]
    me = jax.lax.axis_index(axis_name)
    local = ids - me * shard_size
    mine = (local >= 0) & (local < shard_size)
    safe = jnp.where(mine, local, shard_size)
    G = jnp.zeros_like(values_shard).at[safe].add(
        jnp.where(mine[:, None], grads, 0), mode="drop")
    new_state = state_shard + G * G
    new_values = values_shard - lr * G / (jnp.sqrt(new_state) + ADAGRAD_EPS)
    return new_values, new_state


def make_sharded_lp_step(model, mesh, num_nodes_padded: int, axis_name: str = "node"):
    """A shard_map link-prediction train step over a row-sharded table.

    Returns step(values_shard, state_shard, params, edges, negs, mask) jitted
    over `mesh`: gathers ride psum over ICI, sparse updates stay owner-local,
    dense decoder grads psum across chips (the NCCL all_reduce analogue,
    model.cpp:136-159).
    """
    from jax.sharding import PartitionSpec as P

    from marius_tpu.nn.model import lp_batch_loss_direct

    n_shards = mesh.shape[axis_name]
    assert num_nodes_padded % n_shards == 0

    def step(values, state, params, edges, dst_negs, src_negs, mask):
        b = edges.shape[0]
        c, nneg = dst_negs.shape
        rel = edges[:, 1] if edges.shape[1] == 3 else None
        ids = jnp.concatenate([edges[:, 0], edges[:, -1],
                               dst_negs.reshape(-1), src_negs.reshape(-1)])

        def loss_fn(v_shard, dense_params):
            x = sharded_gather_inner_grad(v_shard, ids, axis_name)
            d = x.shape[-1]
            loss, _ = lp_batch_loss_direct(
                model, dense_params, x[:b], x[b:2 * b], rel,
                x[2 * b:2 * b + c * nneg].reshape(c, nneg, d),
                x[2 * b + c * nneg:].reshape(c, nneg, d)
                if (model.decoder.use_inverse_relations and rel is not None)
                else None,
                mask, None, None)
            return loss

        loss, (G, gdense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            values, params)
        # G = dL/dshard through the psum-gather: exact per-owned-row grads
        # (see the gradient note in sharded_gather; regression-tested against
        # the dense reference). Dense grads are identical across shards
        # (replicated batch) — with a data axis, psum them here (the NCCL
        # all_reduce analogue).
        acc = state + G * G
        new_values = values - model.sparse_lr * G / (jnp.sqrt(acc) + ADAGRAD_EPS)
        return new_values, acc, gdense, loss

    in_specs = (P(axis_name, None), P(axis_name, None), P(), P(), P(), P(), P())
    out_specs = (P(axis_name, None), P(axis_name, None), P(), P())
    return jax.jit(jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False))
