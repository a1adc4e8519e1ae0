"""GeneralEncoder: a multi-stage stack of parallel layers over a sampled batch.

Behavioral parity with the reference GeneralEncoder (nn/encoders/encoder.cpp:
195-258): stages are lists of parallel layers (EMBEDDING/FEATURE/GNN/REDUCTION);
GNN stages move representations one hop inward. Where the reference truncates
ragged DENSEGraph tensors between stages (prepareForNextLayer), each hop here
is its own fixed-shape node set and the GNN layer's adjacency performs the
re-indexing — XLA sees a static chain of gathers, reductions, and matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from marius_tpu.data.batch import NeighborBatch
from marius_tpu.nn.layers import (
    LayerConfig,
    embedding_layer,
    feature_layer,
    gat_layer,
    gcn_layer,
    graph_sage_layer,
    init_layer_params,
    reduction_layer,
    rgcn_layer,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """stages[i] is a list of parallel LayerConfigs (encoder.cpp:29 ctor)."""

    stages: Tuple[Tuple[LayerConfig, ...], ...]

    @property
    def num_gnn_stages(self) -> int:
        return sum(1 for s in self.stages if any(l.layer_type.upper() == "GNN" for l in s))

    @property
    def has_embeddings(self) -> bool:
        return any(l.layer_type.upper() == "EMBEDDING" for s in self.stages for l in s)

    @property
    def has_features(self) -> bool:
        return any(l.layer_type.upper() == "FEATURE" for s in self.stages for l in s)

    @property
    def embedding_dim(self) -> int:
        """Total width of the raw node-embedding block consumed by EMBEDDING
        layers (Model::get_base_embedding_dim, model.cpp:220-240)."""
        dims = [l.offset + l.output_dim for s in self.stages for l in s
                if l.layer_type.upper() == "EMBEDDING"]
        return max(dims) if dims else 0

    @property
    def output_dim(self) -> int:
        return self.stages[-1][-1].output_dim


def init_encoder_params(key: jax.Array, config: EncoderConfig, dtype=jnp.float32):
    """Nested list-of-lists of per-layer param dicts."""
    params: List[List[Dict[str, Array]]] = []
    for i, stage in enumerate(config.stages):
        stage_params = []
        for j, layer in enumerate(stage):
            stage_params.append(init_layer_params(
                jax.random.fold_in(jax.random.fold_in(key, i), j), layer, dtype))
        params.append(stage_params)
    return params


def _apply_gnn(layer: LayerConfig, p, x, adj, degrees, node_ids_outer,
               train, dropout_key):
    g = layer.gnn_type.upper()
    if g == "GRAPH_SAGE":
        return graph_sage_layer(layer, p, x, adj)
    if g == "GCN":
        if degrees is not None:
            safe = lambda ids: degrees[jnp.minimum(ids, degrees.shape[0] - 1)]
            return gcn_layer(layer, p, x, adj,
                             nbr_degrees_in=safe(node_ids_outer)[adj.in_nbr_idx],
                             nbr_degrees_out=safe(node_ids_outer)[adj.out_nbr_idx],
                             self_degrees=None)
        return gcn_layer(layer, p, x, adj)
    if g == "GAT":
        return gat_layer(layer, p, x, adj, train=train, dropout_key=dropout_key)
    if g == "RGCN":
        return rgcn_layer(layer, p, x, adj)
    from marius_tpu.nn import registry
    custom = registry.gnn_layer(g)
    if custom is None:
        raise ValueError(f"Unknown GNN type: {layer.gnn_type}")
    return custom[1](layer, p, x, adj, degrees=degrees,
                     node_ids_outer=node_ids_outer, train=train,
                     dropout_key=dropout_key)


def encoder_forward(
    config: EncoderConfig,
    params,
    embeddings: Optional[Array],     # (n_outer, emb_dim) gathered for the OUTERMOST node set
    features: Optional[Array],       # (n_outer, feat_dim) likewise
    nbr_batch: Optional[NeighborBatch] = None,
    degrees: Optional[Array] = None,  # (num_nodes+1,) global degrees for GCN
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
) -> Array:
    """Run all stages; returns representations on the seed node set.

    GCN degree lookups use the hop's global node ids (the reference ships
    node_properties_ with the batch, gcn_layer.cpp:41).
    """
    gnn_seen = 0
    outputs: List[Array] = []
    current: Optional[Array] = None

    for i, stage in enumerate(config.stages):
        stage_outputs = []
        for j, layer in enumerate(stage):
            lt = layer.layer_type.upper()
            p = params[i][j]
            if lt == "EMBEDDING":
                assert embeddings is not None, "encoder has EMBEDDING layer but no embeddings"
                stage_outputs.append(embedding_layer(layer, p, embeddings))
            elif lt == "FEATURE":
                assert features is not None, "encoder has FEATURE layer but no features"
                stage_outputs.append(feature_layer(layer, p, features))
            elif lt == "REDUCTION":
                stage_outputs.append(reduction_layer(layer, p, outputs))
            elif lt == "GNN":
                assert nbr_batch is not None, "GNN stage requires a NeighborBatch"
                adj = nbr_batch.layers[gnn_seen]
                node_ids_outer = nbr_batch.node_ids[gnn_seen]
                stage_outputs.append(_apply_gnn(
                    layer, p, current, adj, degrees, node_ids_outer, train,
                    None if dropout_key is None else jax.random.fold_in(dropout_key, i)))
            else:
                from marius_tpu.nn import registry
                custom = registry.stage_layer(lt)
                if custom is None:
                    raise ValueError(f"Unknown layer type: {layer.layer_type}")
                stage_outputs.append(custom[1](layer, p, current,
                                               embeddings, features))
        if any(l.layer_type.upper() == "GNN" for l in stage):
            gnn_seen += 1
        outputs = stage_outputs
        if len(stage_outputs) == 1:
            current = stage_outputs[0]
        else:
            # parallel outputs concatenate as default reduction for the next
            # stage input (reference requires explicit REDUCTION; we allow both)
            current = jnp.concatenate(stage_outputs, axis=1)

    return current
