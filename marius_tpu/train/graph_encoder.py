"""Full-graph inference: encode every node with the trained encoder.

Parity with GraphEncoder (pipeline/graph_encoder.cpp + encode_and_export,
marius.cpp:13-36): batches all node ids through the encoder (with neighbor
sampling for GNN stages) and materializes the encoded table. Used for
GNN link-prediction evaluation against all-node corruption and for
embedding export (marius_postprocess parity).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.graph import DeviceGraph
from marius_tpu.data.samplers.neighbor import (
    NeighborSamplingConfig,
    estimate_hop_caps,
    sample_neighbor_batch,
)
from marius_tpu.nn.encoder import encoder_forward
from marius_tpu.nn.model import Model
from marius_tpu.parallel.embedding_table import gather_rows

Array = jax.Array


def encode_all_nodes(
    model: Model,
    params,
    table_values: Optional[Array],
    graph: Optional[DeviceGraph] = None,
    nbr_configs: Sequence[NeighborSamplingConfig] = (),
    features: Optional[Array] = None,     # (N+1, F) with sentinel row
    batch_size: int = 1000,
    hop_caps: Optional[Sequence[int]] = None,
    seed: int = 13,
) -> Array:
    """Encoded representations (num_nodes, d_out) for every node."""
    if not nbr_configs:
        # shallow encoder: single pass over the raw table/features
        return encoder_forward(model.encoder, params["encoder"], table_values,
                               None if features is None else features[:-1])

    assert graph is not None
    num_nodes = graph.num_nodes
    caps = tuple(hop_caps or estimate_hop_caps(batch_size, nbr_configs, num_nodes))
    nb = -(-num_nodes // batch_size)
    ids = jnp.concatenate([jnp.arange(num_nodes, dtype=jnp.int32),
                           jnp.full((nb * batch_size - num_nodes,), num_nodes, jnp.int32)])

    @jax.jit
    def encode(table_values, params, ids):
        def body(_, xs):
            seeds, idx = xs
            mask = seeds < num_nodes
            k = jax.random.fold_in(jax.random.key(seed), idx)
            batch = sample_neighbor_batch(k, graph, seeds, mask, nbr_configs, caps)
            outer = batch.node_ids[0]
            emb = None if table_values is None else gather_rows(table_values, outer)
            feats = None if features is None else features[jnp.minimum(outer, num_nodes)]
            out = encoder_forward(model.encoder, params["encoder"], emb, feats,
                                  batch, degrees=graph.degrees, train=False)
            return None, out

        _, outs = jax.lax.scan(body, None,
                               (ids.reshape(nb, batch_size), jnp.arange(nb)))
        return outs.reshape(nb * batch_size, -1)[:num_nodes]

    return encode(table_values, params, ids)
