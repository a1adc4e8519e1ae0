"""Multi-host initialization and mesh construction.

The final piece of the Tier-3 scaling story (docs/scaling.md): bring up
jax.distributed across hosts, then build the global (data, node) mesh over all
chips. Every trainer and collective in this package is axis-name-generic, so
nothing else changes between one host and many — the reference has no
multi-node support at all (SURVEY §2.3).

Usage on every host of a multi-host TPU slice (or a GPU/CPU cluster with a
coordinator):

    from marius_tpu.parallel.launch import initialize_distributed, global_mesh
    initialize_distributed()            # env-driven on TPU pods
    mesh = global_mesh(num_node=8)      # (data, node) over ALL chips
"""

from __future__ import annotations

from typing import Optional

import jax

from marius_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On TPU pods all arguments come from the
    environment; on other platforms pass them explicitly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(num_node: int = 1, num_data: Optional[int] = None):
    """A (data, node) mesh over every chip in the job — ICI within a slice,
    DCN across hosts for the data (replica) axis."""
    return make_mesh(num_data=num_data, num_node=num_node,
                     devices=jax.devices())


def process_shard(n: int) -> slice:
    """This host's contiguous slice of an n-element dataset — per-host data
    sharding for multi-host input pipelines."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n // p)
    return slice(i * per, min(n, (i + 1) * per))
