"""Device mesh construction for data / node-shard parallelism.

The reference's only scale-out is single-node multi-GPU data parallelism with
NCCL all_reduce (nn/model.cpp:136-159) plus host-RAM staleness for embeddings.
Here scaling is expressed once, declaratively: a jax.sharding.Mesh with a
``data`` axis (batch parallelism; dense grads psum over it) and a ``node`` axis
(embedding-table row sharding; gathers/updates ride ICI collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
NODE_AXIS = "node"


def make_mesh(num_data: Optional[int] = None, num_node: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_node
    assert num_data * num_node == len(devices), \
        f"mesh {num_data}x{num_node} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(num_data, num_node)
    return Mesh(arr, (DATA_AXIS, NODE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = NODE_AXIS) -> NamedSharding:
    """Shard dim 0 (table rows) over an axis."""
    return NamedSharding(mesh, P(axis, None))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def put_global(data, sharding: NamedSharding):
    """device_put that also works when the mesh spans PROCESSES (multi-host):
    every process passes the SAME full array and receives the one logical
    jax.Array, with only its addressable shards materialized locally.
    Single-process this is exactly jax.device_put."""
    if jax.process_count() == 1:
        return jax.device_put(data, sharding)
    if hasattr(data, "dtype") and jnp_issubdtype_prng(data.dtype):
        raw = jax.make_array_from_callback(
            jax.random.key_data(data).shape, sharding,
            lambda idx: np.asarray(jax.random.key_data(data))[idx])
        return jax.random.wrap_key_data(raw)
    arr = np.asarray(data)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def jnp_issubdtype_prng(dtype) -> bool:
    import jax.numpy as jnp
    try:
        return jnp.issubdtype(dtype, jax.dtypes.prng_key)
    except TypeError:
        return False


def put_arg(arr, sharding: Optional[NamedSharding] = None):
    """Placement for per-call jit ARGUMENTS (batch blocks, index vectors):
    multi-controller passes plain numpy (replicated at the jit boundary — a
    committed process-local array would not be addressable everywhere);
    single-controller keeps the early async device transfer. Large host
    arrays stream in chunks (single big puts collapse on remote-attached
    runtimes — storage/transfer.py)."""
    import jax.numpy as jnp
    import numpy as _np
    if jax.process_count() > 1:
        return _np.asarray(arr)
    if sharding is not None:
        return jax.device_put(_np.asarray(arr), sharding)
    a = _np.asarray(arr)
    from marius_tpu.storage import transfer
    if a.nbytes > transfer.DIRECT_BYTES and a.ndim >= 1 and a.shape[0] > 1:
        return transfer.write_rows(jnp.zeros(a.shape, a.dtype), a, 0)
    return jnp.asarray(a)


_ALL_DEVICE_REPL = None


def put_closure(arr):
    """Placement for arrays CLOSED OVER by jitted code (not passed as
    arguments): these must be jax.Arrays at trace time — multi-controller
    makes them global, replicated over ALL devices (no mesh needed)."""
    import jax.numpy as jnp
    import numpy as _np
    if jax.process_count() == 1:
        return jnp.asarray(arr)
    global _ALL_DEVICE_REPL
    if _ALL_DEVICE_REPL is None:
        m = Mesh(_np.asarray(jax.devices()).reshape(-1), ("_repl",))
        _ALL_DEVICE_REPL = NamedSharding(m, P())
    return put_global(_np.asarray(arr), _ALL_DEVICE_REPL)


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf of a pytree as ONE mesh-replicated global array
    (multi-controller-safe; PRNG key leaves handled). Used by trainers to
    make params/opt-state/keys global when the mesh spans processes."""
    repl = replicated(mesh)
    return jax.tree.map(lambda a: put_global(a, repl), tree)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on a mesh: embedding table + Adagrad state row-sharded
    over NODE_AXIS (replicated over DATA_AXIS), dense params/opt replicated.

    This is the TPU replacement for the reference's scale-out: instead of
    replicating the model per GPU and hogwild-updating a host-RAM table
    (model.cpp:361-379 broadcast + buffer.cpp:460 indexAdd), the table is ONE
    logical jax.Array whose rows live across chips; gathers and row-sparse
    updates become XLA collectives over ICI.
    """
    rows = row_sharded(mesh)
    repl = replicated(mesh)

    def place(path, leaf):
        names = {getattr(p, "name", None) for p in path}
        if {"table"} & names and hasattr(leaf, "ndim") and leaf.ndim == 2:
            return put_global(leaf, rows)
        return put_global(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, state)
