"""Encoder layers: embedding/feature slicing, GNN layers, reductions.

Behavioral parity with the reference layer zoo (nn/layers/): EmbeddingLayer /
FeatureLayer narrow a column slice (embedding.cpp:17, feature.cpp:15);
GraphSAGE GCN/MEAN aggregators (graph_sage_layer.cpp:37-97); GCN with global-
degree sqrt normalization (gcn_layer.cpp); GAT multi-head attention with self
in the softmax (gat_layer.cpp:49-142 + layer_helpers.cpp:44-66); RGCN per-
relation matrices over outgoing neighbors (rgcn_layer.cpp); Concat/Linear
reductions (concat.cpp, linear.cpp); bias+activation post-hook (layer.cpp:9-16).

Re-designed for the padded-fanout batch layout: aggregation is gather + masked
reduce over an (n, F) block — no scatters, no CUDA segment-max. GAT's segment
softmax becomes a masked softmax over the fixed fanout axis, which works on
every backend and is trivially differentiable (the reference's GAT is GPU-only,
layer_helpers.cpp:32-42).

Matmul convention: weights are stored (d_in, d_out) and applied as x @ w, the
XLA-preferred layout (the reference stores (d_out, d_in) and transposes).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from marius_tpu.data.batch import LayerAdjacency
from marius_tpu.nn.initialization import InitConfig, initialize_tensor
from marius_tpu.ops.segment import masked_mean, masked_softmax, masked_sum

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LayerConfig:
    """One encoder layer (LayerConfig, configuration/config.h:16-170)."""

    layer_type: str                 # EMBEDDING | FEATURE | GNN | REDUCTION
    input_dim: int = -1
    output_dim: int = -1
    offset: int = 0                 # column offset for EMBEDDING/FEATURE slices
    gnn_type: str = "GRAPH_SAGE"    # GRAPH_SAGE | GCN | GAT | RGCN
    aggregator: str = "MEAN"        # GraphSAGE: GCN | MEAN
    reduction: str = "CONCAT"       # REDUCTION: CONCAT | LINEAR
    bias: bool = False
    activation: str = "NONE"        # RELU | SIGMOID | NONE
    init: InitConfig = dataclasses.field(default_factory=InitConfig)
    bias_init: InitConfig = dataclasses.field(default_factory=lambda: InitConfig("ZEROS"))
    # GAT options (datatypes.py:128-136)
    num_heads: int = 10
    average_heads: bool = True
    negative_slope: float = 0.2
    input_dropout: float = 0.0
    attention_dropout: float = 0.0
    # RGCN
    num_relations: int = 1


def apply_activation(name: str, x: Array) -> Array:
    """activation.cpp:7 — relu/sigmoid/none."""
    n = name.upper()
    if n == "RELU":
        return jax.nn.relu(x)
    if n == "SIGMOID":
        return jax.nn.sigmoid(x)
    if n == "NONE":
        return x
    raise ValueError(f"Unknown activation: {name}")


def post_hook(config: LayerConfig, params: Dict[str, Array], x: Array) -> Array:
    """bias + activation (layer.cpp:9-16)."""
    if config.bias:
        x = x + params["bias"]
    return apply_activation(config.activation, x)


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_layer_params(key: jax.Array, config: LayerConfig, dtype=jnp.float32) -> Dict[str, Array]:
    params: Dict[str, Array] = {}
    keys = jax.random.split(key, 8)
    lt = config.layer_type.upper()
    d_in, d_out = config.input_dim, config.output_dim

    if lt == "GNN":
        g = config.gnn_type.upper()
        if g == "GRAPH_SAGE":
            params["w1"] = initialize_tensor(keys[0], config.init, (d_in, d_out), dtype)
            if config.aggregator.upper() == "MEAN":
                params["w2"] = initialize_tensor(keys[1], config.init, (d_in, d_out), dtype)
        elif g == "GCN":
            params["w"] = initialize_tensor(keys[0], config.init, (d_in, d_out), dtype)
        elif g == "GAT":
            head_dim = d_out if config.average_heads else d_out // config.num_heads
            # fans match the reference's explicit overrides (gat_layer.cpp:33-38)
            params["w"] = initialize_tensor(
                keys[0], config.init, (d_in, config.num_heads * head_dim), dtype,
                fans=(d_in, head_dim))
            params["a_l"] = initialize_tensor(
                keys[1], config.init, (config.num_heads, head_dim), dtype, fans=(head_dim, 1))
            params["a_r"] = initialize_tensor(
                keys[2], config.init, (config.num_heads, head_dim), dtype, fans=(head_dim, 1))
        elif g == "RGCN":
            params["relation_matrices"] = initialize_tensor(
                keys[0], config.init, (config.num_relations, d_in, d_out), dtype)
            params["self_matrix"] = initialize_tensor(keys[1], config.init, (d_in, d_out), dtype)
        else:
            from marius_tpu.nn import registry
            custom = registry.gnn_layer(g)
            if custom is None:
                raise ValueError(f"Unknown GNN layer type: {config.gnn_type}")
            params.update(custom[0](keys[0], config, dtype))
    elif lt == "REDUCTION" and config.reduction.upper() == "LINEAR":
        params["w"] = initialize_tensor(keys[0], config.init, (d_in, d_out), dtype)
    elif lt in ("EMBEDDING", "FEATURE", "REDUCTION"):
        pass
    else:
        from marius_tpu.nn import registry
        custom = registry.stage_layer(lt)
        if custom is None:
            raise ValueError(f"Unknown layer type: {config.layer_type}")
        params.update(custom[0](keys[0], config, dtype))

    if config.bias:
        params["bias"] = initialize_tensor(keys[7], config.bias_init, (d_out,), dtype)
    return params


# ---------------------------------------------------------------------------
# Forward functions
# ---------------------------------------------------------------------------


def embedding_layer(config: LayerConfig, params, embeddings: Array) -> Array:
    """Column slice of the node-embedding block (embedding.cpp:17)."""
    return post_hook(config, params, jax.lax.dynamic_slice_in_dim(
        embeddings, config.offset, config.output_dim, axis=1))


def feature_layer(config: LayerConfig, params, features: Array) -> Array:
    """Column slice of the node-feature block (feature.cpp:15)."""
    return post_hook(config, params, jax.lax.dynamic_slice_in_dim(
        features, config.offset, config.output_dim, axis=1))


def _gather_neighbors(inputs: Array, adj: LayerAdjacency):
    """Gather self + in/out neighbor representations in the padded layout."""
    self_embs = inputs[adj.self_idx]
    in_embs = inputs[adj.in_nbr_idx]    # (n, F_in, d)
    out_embs = inputs[adj.out_nbr_idx]  # (n, F_out, d)
    return self_embs, in_embs, out_embs


def graph_sage_layer(config: LayerConfig, params, inputs: Array, adj: LayerAdjacency) -> Array:
    """GraphSAGE with GCN or MEAN aggregator (graph_sage_layer.cpp:37-97)."""
    self_embs, in_embs, out_embs = _gather_neighbors(inputs, adj)
    nbr_sum = masked_sum(in_embs, adj.in_mask) + masked_sum(out_embs, adj.out_mask)
    num_nbrs = (jnp.sum(adj.in_mask, axis=1) + jnp.sum(adj.out_mask, axis=1)).astype(inputs.dtype)

    if config.aggregator.upper() == "GCN":
        a = (nbr_sum + self_embs) / (num_nbrs + 1.0)[:, None]
        out = a @ params["w1"]
    elif config.aggregator.upper() == "MEAN":
        a = nbr_sum / jnp.maximum(num_nbrs, 1.0)[:, None]
        out = self_embs @ params["w1"] + a @ params["w2"]
    else:
        raise ValueError(f"Unknown GraphSAGE aggregator: {config.aggregator}")
    return post_hook(config, params, out)


def gcn_layer(config: LayerConfig, params, inputs: Array, adj: LayerAdjacency,
              nbr_degrees_in: Optional[Array] = None,
              nbr_degrees_out: Optional[Array] = None,
              self_degrees: Optional[Array] = None) -> Array:
    """GCN with sqrt(global_degree+1) normalization (gcn_layer.cpp forward).

    ``nbr_degrees_*`` are global degrees of the gathered neighbors (the
    reference's node_properties_); if None, sampled counts are used.
    """
    self_embs, in_embs, out_embs = _gather_neighbors(inputs, adj)
    num_nbrs = (jnp.sum(adj.in_mask, axis=1) + jnp.sum(adj.out_mask, axis=1)).astype(inputs.dtype)

    def norm(embs, degs, mask):
        d = degs.astype(embs.dtype) if degs is not None else jnp.sum(mask, 1, keepdims=True).astype(embs.dtype)
        return embs / jnp.sqrt(d + 1.0)[..., None]

    a = masked_sum(norm(in_embs, nbr_degrees_in, adj.in_mask), adj.in_mask) + \
        masked_sum(norm(out_embs, nbr_degrees_out, adj.out_mask), adj.out_mask)
    self_deg = (self_degrees.astype(inputs.dtype) if self_degrees is not None else num_nbrs)
    a = a + self_embs / jnp.sqrt(self_deg + 1.0)[:, None]
    a = a / jnp.sqrt(num_nbrs + 1.0)[:, None]
    return post_hook(config, params, a @ params["w"])


def gat_layer(config: LayerConfig, params, inputs: Array, adj: LayerAdjacency,
              train: bool = False, dropout_key: Optional[jax.Array] = None) -> Array:
    """Multi-head GAT; self node participates in the softmax (gat_layer.cpp:49-142).

    The reference's CUDA segment-max softmax becomes a masked softmax over the
    combined (F_in + F_out + 1) slot axis.
    """
    head_dim = config.output_dim if config.average_heads else config.output_dim // config.num_heads
    h = config.num_heads

    if train and config.input_dropout > 0 and dropout_key is not None:
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 0),
                                    1.0 - config.input_dropout, inputs.shape)
        inputs = jnp.where(keep, inputs / (1.0 - config.input_dropout), 0.0)

    # Two exact formulations, chosen by projected-row width (round-5 perf
    # rewrite — the old code gathered RAW d-dim slots then projected each
    # occurrence, an (n, S, h, k) einsum that made GAT the slowest family):
    #   B (h*k <= d): project each input row ONCE, gather projected rows —
    #     the per-slot projection einsum (S x the flops) disappears.
    #   A (h*k > d, e.g. average_heads where head_dim == output_dim):
    #     gather raw slots, softmax on per-slot SCALAR logits gathered from
    #     precomputed x @ (w a_r), aggregate raw features per head, and
    #     project the (n, h, d) aggregate — k x fewer flops and no
    #     (n, S, h, k) tensor. Linearity makes both identical to the
    #     reference math (gat_layer.cpp:49-142).
    d_in = inputs.shape[-1]
    w = params["w"].reshape(d_in, h, head_dim)
    n = adj.self_idx.shape[0]
    ones_h = jnp.ones((1, 1, h), bool)

    if h * head_dim <= d_in:
        t_all = jnp.einsum("nd,dhk->nhk", inputs, w)
        t_flat = t_all.reshape(inputs.shape[0], h * head_dim)
        self_t, in_t, out_t = _gather_neighbors(t_flat, adj)
        t = jnp.concatenate([in_t, out_t, self_t[:, None, :]], axis=1) \
            .reshape(n, -1, h, head_dim)                # (n, S+1, h, k)
        slot_mask = jnp.concatenate(
            [adj.in_mask, adj.out_mask,
             jnp.ones((n, 1), bool) & adj.node_mask[:, None]], axis=1)
        self_t = self_t.reshape(n, h, head_dim)
        logits = jnp.einsum("nhk,hk->nh", self_t, params["a_l"])[:, None, :] + \
            jnp.einsum("nshk,hk->nsh", t, params["a_r"])
        logits = jax.nn.leaky_relu(logits, config.negative_slope)
        alpha = masked_softmax(logits, slot_mask[:, :, None] & ones_h, axis=1)
        if train and config.attention_dropout > 0 and dropout_key is not None:
            keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 1),
                                        1.0 - config.attention_dropout, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - config.attention_dropout), 0.0)
        out = jnp.einsum("nsh,nshk->nhk", alpha, t)     # (n, h, k)
    else:
        # per-slot logits are scalars of precomputed projections:
        # a_r . (x W) = x . (W a_r)
        wal = jnp.einsum("dhk,hk->dh", w, params["a_l"])    # (d, h)
        war = jnp.einsum("dhk,hk->dh", w, params["a_r"])
        lr_all = inputs @ war                                # (n_prev, h)
        self_embs, in_embs, out_embs = _gather_neighbors(inputs, adj)
        self_lr, in_lr, out_lr = _gather_neighbors(lr_all, adj)
        slots = jnp.concatenate([in_embs, out_embs, self_embs[:, None, :]], axis=1)
        slot_mask = jnp.concatenate(
            [adj.in_mask, adj.out_mask,
             jnp.ones((n, 1), bool) & adj.node_mask[:, None]], axis=1)
        logit_l = self_embs @ wal                            # (n, h)
        logit_r = jnp.concatenate([in_lr, out_lr, self_lr[:, None, :]], axis=1)
        logits = jax.nn.leaky_relu(logit_l[:, None, :] + logit_r,
                                   config.negative_slope)
        alpha = masked_softmax(logits, slot_mask[:, :, None] & ones_h, axis=1)
        if train and config.attention_dropout > 0 and dropout_key is not None:
            keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 1),
                                        1.0 - config.attention_dropout, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - config.attention_dropout), 0.0)
        agg = jnp.einsum("nsh,nsd->nhd", alpha, slots)       # (n, h, d)
        out = jnp.einsum("nhd,dhk->nhk", agg, w)             # (n, h, k)
    if config.average_heads:
        out = jnp.mean(out, axis=1)
    else:
        out = out.reshape(n, h * head_dim)
    return post_hook(config, params, out)


def rgcn_layer(config: LayerConfig, params, inputs: Array, adj: LayerAdjacency) -> Array:
    """RGCN over outgoing neighbors with per-relation matrices (rgcn_layer.cpp).

    The reference bmm's one (d_out, d_in) matrix per neighbor. Two MXU
    formulations, chosen by relation count:
    - few relations (the typical NC RGCN): one masked MXU pass per relation
      over the flat slot block — O(n*F*d) memory, R x the matmul flops;
    - many relations: gather a (d_in, d_out) matrix per slot and contract —
      flop-minimal but materializes (n, F, d_in, d_out), which explodes at
      large sampled frontiers (30 GB at a 56k x 8-slot hop with d=128).
    """
    self_embs, _, out_embs = _gather_neighbors(inputs, adj)
    rel = adj.out_rel if adj.out_rel is not None else jnp.zeros_like(adj.out_nbr_idx)
    W = params["relation_matrices"]                      # (R, d_in, d_out)
    n, F, d_in = out_embs.shape
    if config.num_relations <= 64:
        flat = out_embs.reshape(n * F, d_in)
        relf = rel.reshape(n * F)
        acc = jnp.zeros((n * F, W.shape[-1]), out_embs.dtype)
        for r in range(config.num_relations):
            acc = acc + jnp.where((relf == r)[:, None],
                                  flat @ W[r].astype(out_embs.dtype), 0)
        transformed = acc.reshape(n, F, -1)
    else:
        rel_mats = W[rel]                                # (n, F, d_in, d_out)
        transformed = jnp.einsum("nfd,nfdo->nfo", out_embs, rel_mats)
    a = masked_mean(transformed, adj.out_mask)
    out = a + self_embs @ params["self_matrix"]
    return post_hook(config, params, out)


def reduction_layer(config: LayerConfig, params, stage_outputs) -> Array:
    """CONCAT (concat.cpp) or LINEAR = concat -> matmul (linear.cpp)."""
    x = jnp.concatenate(stage_outputs, axis=1)
    if config.reduction.upper() == "LINEAR":
        x = x @ params["w"]
    elif config.reduction.upper() != "CONCAT":
        raise ValueError(f"Unknown reduction: {config.reduction}")
    return post_hook(config, params, x)
