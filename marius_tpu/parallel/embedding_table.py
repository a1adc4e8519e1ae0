"""Learnable node-embedding table with fused sparse Adagrad, HBM-resident.

The reference keeps the table in (pinned) host memory or GPU memory and applies
the Adagrad rule inline on gathered rows before an indexAdd writeback
(data/batch.cpp:62-79 accumulateGradients + storage indexAdd, buffer.cpp:460).
Here the table and its Adagrad accumulator are jax.Arrays living in HBM (and
sharded over a mesh axis when scaling out — see sharding.py); gather and the
row-sparse update are part of the compiled train step, so there is no
host↔device traffic per batch at all.

Update rule parity (batch.cpp:68-71):
    state[ids] += sum_grad**2
    values[ids] -= lr * sum_grad / (sqrt(state[ids]) + 1e-10)
``ids`` must be unique (the reference requires the same, buffer.cpp:459);
padding rows carry id == num_nodes and are dropped by the scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from marius_tpu.nn.initialization import InitConfig, initialize_tensor

Array = jax.Array

ADAGRAD_EPS = 1e-10  # batch.cpp:70


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmbeddingTable:
    values: Array  # (num_nodes, dim)
    state: Array   # (num_nodes, dim) Adagrad accumulator (zeros at init, io.cpp:182)

    @property
    def num_nodes(self) -> int:
        return self.values.shape[0]

    @property
    def dim(self) -> int:
        return self.values.shape[1]


def init_embedding_table(key: jax.Array, num_nodes: int, dim: int,
                         init_config: Optional[InitConfig] = None,
                         dtype=jnp.float32) -> EmbeddingTable:
    """Glorot-uniform by default with fans of the FULL (N, d) shape, matching
    the reference's chunked init (io.cpp:167-188 + initialization.cpp:101-119)."""
    cfg = init_config or InitConfig("GLOROT_UNIFORM")
    values = initialize_tensor(key, cfg, (num_nodes, dim), dtype,
                               fans=(num_nodes, dim))
    return EmbeddingTable(values=values, state=jnp.zeros((num_nodes, dim), dtype))


def gather_rows(table_values: Array, ids: Array) -> Array:
    """Clamped gather — padding ids (== num_nodes) read the last row, whose
    value is never used downstream."""
    return jnp.take(table_values, jnp.minimum(ids, table_values.shape[0] - 1), axis=0)


def sparse_adagrad_update(table: EmbeddingTable, unique_ids: Array,
                          grads: Array, lr: float) -> EmbeddingTable:
    """Apply the fused Adagrad row update. ``unique_ids`` (U,) must be unique,
    padded with num_nodes (out-of-range scatters are dropped)."""
    safe = jnp.minimum(unique_ids, table.num_nodes - 1)
    new_state_rows = jnp.take(table.state, safe, axis=0) + grads * grads
    delta = -lr * grads / (jnp.sqrt(new_state_rows) + ADAGRAD_EPS)
    values = table.values.at[unique_ids].add(delta, mode="drop")
    state = table.state.at[unique_ids].set(new_state_rows, mode="drop")
    return EmbeddingTable(values=values, state=state)


def sparse_adagrad_update_dense_accum(table: EmbeddingTable, ids: Array,
                                      grads: Array, lr: float) -> EmbeddingTable:
    """Same math as sparse_adagrad_update but WITHOUT requiring unique ids.

    Scatter-adds per-occurrence grads into a table-shaped accumulator G (so
    duplicate ids sum, exactly like autograd summing into a unique row), then
    applies the Adagrad rule as full-table elementwise ops — rows with G == 0
    are exact no-ops. Profiling shows jnp.unique's sort/inverse chains cost
    ~40% of a small-table epoch; this path removes them. Use when num_nodes *
    dim is small enough that a full-table elementwise pass (~5 R/W) is cheaper
    than sort-based dedup (see LinkPredictionTrainer's `dense_accum` switch).
    """
    G = jnp.zeros_like(table.values).at[ids].add(grads, mode="drop")
    new_state = table.state + G * G
    values = table.values - lr * G / (jnp.sqrt(new_state) + ADAGRAD_EPS)
    return EmbeddingTable(values=values, state=new_state)
