"""Batch pytrees — the static-shape TPU analogue of Batch/DENSEGraph.

The reference's Batch (data/batch.h:32-90) carries ragged tensors plus CUDA
transfer events; DENSEGraph (graph.h:108) carries per-hop ragged neighbor
lists. Here batches are pytrees of fixed-shape arrays with explicit validity
masks, so an epoch of batches stacks into leading-axis arrays consumable by
lax.scan and shardable with jax.sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeBatch:
    """A fixed-size slice of the (shuffled) edge list for link prediction."""

    edges: Array        # (B, 2|3) int32, padded rows arbitrary
    mask: Array         # (B,) bool — valid edges


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LayerAdjacency:
    """Sampled adjacency of one GNN hop in batch-local index space.

    Indices point into the *previous* (outer) layer's node array. The padded-
    fanout layout (n, F) means aggregation is a gather + masked reduce that
    XLA fuses with the layer matmul — no scatter, no raggedness (contrast
    DENSEGraph's per-hop offset lists, graph.cpp:238-406).
    """

    self_idx: Array       # (n,) int32 — position of each target node in the outer node array
    in_nbr_idx: Array     # (n, F_in) int32 positions of sampled incoming nbrs
    in_mask: Array        # (n, F_in) bool
    out_nbr_idx: Array    # (n, F_out) int32
    out_mask: Array       # (n, F_out) bool
    node_mask: Array      # (n,) bool — valid target nodes
    in_rel: Optional[Array] = None   # (n, F_in) int32 relation ids (RGCN) or None
    out_rel: Optional[Array] = None  # (n, F_out) int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborBatch:
    """Multi-hop sampled neighborhood (DENSE equivalent).

    node_ids[0] is the outermost (hop-L) node set; node_ids[-1] the seeds.
    layers[l] maps node set l+1's targets into node set l's index space, i.e.
    GNN layer l consumes representations on node set l and produces them on
    node set l+1 (the reference slices one hop off between layers via
    prepareForNextLayer, graph.cpp:290-320 — here each hop is its own array).
    """

    node_ids: Tuple[Array, ...]    # per-hop global node ids, padded with num_nodes
                                   # (frontier-prefix order: each hop's set is a
                                   # prefix of the next; sorted in the fallback path)
    node_masks: Tuple[Array, ...]  # per-hop validity
    layers: Tuple[LayerAdjacency, ...]  # len == num GNN layers
    # distinct NEW neighbor ids dropped by tight hop caps across all hops (0
    # under worst-case caps). The drop is id-ordered, not uniform: overflow
    # slots go to ascending ids (prefix_unique_padded), so it discards the
    # HIGHEST-id new neighbors first — under --sequential_deg_nodes /
    # sequential_train_nodes remaps (low ids = hubs/train nodes) the bias is
    # toward dropping low-degree nodes. Trainers log it.
    overflow: Optional[Array] = None

    @property
    def seed_ids(self) -> Array:
        return self.node_ids[-1]

    @property
    def seed_mask(self) -> Array:
        return self.node_masks[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NodeBatch:
    """A node-classification batch: seeds + labels (+ sampled neighborhood)."""

    seeds: Array          # (B,) int32 node ids
    labels: Array         # (B,) int32
    mask: Array           # (B,) bool
