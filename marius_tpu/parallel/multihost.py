"""Multi-host (multi-process) training initialization.

The reference has NO multi-node path — its only scale-out is single-process
multi-GPU NCCL all_reduce (/root/reference/src/cpp/src/nn/model.cpp:136-159).
SURVEY §2.3 names the cross-host tier a first-class TPU requirement: within a
slice collectives ride ICI, across slices DCN. In JAX that is the
multi-controller model — one process per host, all launching the SAME
program over one global ``jax.sharding.Mesh``; XLA routes collectives over
ICI/DCN automatically.

The framework is multi-controller-ready by construction: trainers express
parallelism as shardings on one logical mesh, and every host->mesh transfer
routes through ``parallel.mesh.put_global`` (each process provides the same
full host array; only the process's addressable shards materialize). This
module just wraps the one extra step: joining the coordination service.

Usage (same script on every host):

    from marius_tpu.parallel import multihost, mesh
    multihost.initialize("host0:1234", num_processes=4, process_id=i)
    m = mesh.make_mesh(num_data=..., num_node=...)   # global devices
    trainer = LinkPredictionTrainer(..., mesh=m)     # identical args
    trainer.train(epochs)                             # collective epochs

Validated by tests/test_multihost.py: two coordinated CPU processes
(4 virtual devices each) reproduce the single-process 8-device loss
trajectory exactly.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_ids: Optional[list] = None) -> None:
    """Join the JAX coordination service (jax.distributed). Call before any
    other JAX operation. After this, jax.devices() returns the GLOBAL device
    list and meshes may span processes."""
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1
