"""Full-graph encoder forward: every stage over ALL nodes at once.

The exact-ALL twin of nn/encoder.py's sampled forward (GeneralEncoder,
encoder.cpp:195-258): instead of walking hop sets inward, each GNN stage
aggregates over the whole padded adjacency (data/full_graph.py), so a
node's final representation equals the sampled path's output under
unbounded ALL sampling — with zero dedup/remap work and a scatter-free
backward. Supports the aggregation-style layers (GraphSAGE GCN/MEAN, GCN);
attention/relational layers (GAT, RGCN) keep the sampled path.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from marius_tpu.data.full_graph import FullGraphAdjacency, make_nbr_sums
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import (
    LayerConfig,
    embedding_layer,
    feature_layer,
    post_hook,
    reduction_layer,
)

Array = jax.Array

SUPPORTED_GNN = {"GRAPH_SAGE", "GCN"}


def supports_full_graph(config: EncoderConfig) -> bool:
    return all(l.gnn_type.upper() in SUPPORTED_GNN
               for s in config.stages for l in s
               if l.layer_type.upper() == "GNN")


def _full_graph_sage(layer: LayerConfig, p, x, nbr_total, num_nbrs):
    """graph_sage_layer (layers.py) over the full adjacency."""
    if layer.aggregator.upper() == "GCN":
        a = (nbr_total + x) / (num_nbrs + 1.0)[:, None]
        out = a @ p["w1"]
    elif layer.aggregator.upper() == "MEAN":
        a = nbr_total / jnp.maximum(num_nbrs, 1.0)[:, None]
        out = x @ p["w1"] + a @ p["w2"]
    else:
        raise ValueError(f"Unknown GraphSAGE aggregator: {layer.aggregator}")
    return post_hook(layer, p, out)


def _full_graph_gcn(layer: LayerConfig, p, x_scaled_sum, x, num_nbrs):
    """gcn_layer (layers.py) over the full adjacency; neighbors pre-scaled by
    1/sqrt(global_degree+1) before summation."""
    a = x_scaled_sum + x / jnp.sqrt(num_nbrs + 1.0)[:, None]
    a = a / jnp.sqrt(num_nbrs + 1.0)[:, None]
    return post_hook(layer, p, a @ p["w"])


def full_graph_encoder_forward(
    config: EncoderConfig,
    params,
    embeddings: Optional[Array],   # (N, emb_dim) all-node block
    features: Optional[Array],     # (N, feat_dim) all-node block
    adj: FullGraphAdjacency,
    nbr_sums=None,                 # nbr_sum from make_nbr_sums
) -> Array:
    """Representations for ALL nodes: (N, d_out)."""
    nbr_sum = nbr_sums if nbr_sums is not None else make_nbr_sums(adj)
    num_nbrs = (adj.in_deg + adj.out_deg).astype(
        (embeddings if embeddings is not None else features).dtype)

    outputs: List[Array] = []
    current: Optional[Array] = None
    for i, stage in enumerate(config.stages):
        stage_outputs = []
        for j, layer in enumerate(stage):
            lt = layer.layer_type.upper()
            p = params[i][j]
            if lt == "EMBEDDING":
                stage_outputs.append(embedding_layer(layer, p, embeddings))
            elif lt == "FEATURE":
                stage_outputs.append(feature_layer(layer, p, features))
            elif lt == "REDUCTION":
                stage_outputs.append(reduction_layer(layer, p, outputs))
            elif lt == "GNN":
                g = layer.gnn_type.upper()
                if g == "GRAPH_SAGE":
                    stage_outputs.append(_full_graph_sage(
                        layer, p, current, nbr_sum(current), num_nbrs))
                elif g == "GCN":
                    scaled = current / jnp.sqrt(num_nbrs + 1.0)[:, None]
                    stage_outputs.append(_full_graph_gcn(
                        layer, p, nbr_sum(scaled), current, num_nbrs))
                else:
                    raise ValueError(
                        f"full-graph mode does not support {layer.gnn_type}; "
                        "use the sampled path")
            else:
                raise ValueError(f"Unknown layer type: {layer.layer_type}")
        outputs = stage_outputs
        current = (stage_outputs[0] if len(stage_outputs) == 1
                   else jnp.concatenate(stage_outputs, axis=1))
    return current
