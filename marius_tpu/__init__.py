"""marius_tpu — a TPU-native graph-embedding and GNN training framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of Marius/MariusGNN
(reference: marius-team/marius): shallow KG embeddings (DistMult/ComplEx/TransE)
with chunked negative sampling, sampled GNNs (GraphSAGE/GCN/GAT/RGCN), link
prediction and node classification, out-of-core-scale embedding tables, and
multi-chip scaling via jax.sharding meshes.

Architecture (TPU-first, not a port):
  * the entire training hot loop — shuffling, negative sampling, neighbor
    sampling, forward/backward, sparse Adagrad updates — runs on-device inside
    a single jitted `lax.scan` epoch (the reference hides host latency with a
    5-stage thread pipeline; we remove the host from the hot path instead),
  * all shapes are static (padded + masked) so XLA compiles once,
  * embedding tables are sharded jax.Arrays over a device mesh; gathers and
    gradient application ride ICI collectives instead of NCCL/hogwild host RAM.
"""

__version__ = "0.1.0"

from marius_tpu import (  # noqa: F401
    config,
    data,
    manager,
    native,
    nn,
    ops,
    parallel,
    reporting,
    storage,
    tools,
    train,
)
from marius_tpu.manager import (  # noqa: F401
    encode_and_export,
    marius_eval,
    marius_init,
    marius_train,
)
