"""Full-graph encoder forward: every stage over ALL nodes at once.

The exact-ALL twin of nn/encoder.py's sampled forward (GeneralEncoder,
encoder.cpp:195-258): instead of walking hop sets inward, each GNN stage
aggregates over the whole padded adjacency (data/full_graph.py), so a
node's final representation equals the sampled path's output under
unbounded ALL sampling — with zero dedup/remap work and a scatter-free
backward. Supports GraphSAGE (GCN/MEAN), GCN, and GAT (gat_layer.cpp:49-142
semantics: self node participates in the softmax; per-bucket masked softmax
here, with the gather's vjp routed through the inverse occurrence map so
attention training never emits a row scatter), and RGCN (rgcn_layer.cpp
semantics via the relation-bucketed batched matmul in
data/full_graph_rel.py; requires build_full_graph_adjacency
with_relations=True).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.full_graph import (
    FullGraphAdjacency,
    build_inverse_map,
    make_gather_blocks,
    make_nbr_sums,
    make_permuters,
)
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import (
    LayerConfig,
    embedding_layer,
    feature_layer,
    post_hook,
    reduction_layer,
)
from marius_tpu.ops.segment import masked_softmax

Array = jax.Array

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AffineConst:
    """A precomputed first-stage aggregation that still depends on the live
    stage-0 FEATURE bias: resolve as base + count*bias (_const_first_agg).
    A pytree (no string tags) so const entries can ride jit ARGUMENTS in
    multi-controller mode."""

    base: Array
    count: Array


SUPPORTED_GNN = {"GRAPH_SAGE", "GCN", "GAT", "RGCN"}
# layer types the seed-restricted FINAL stage covers
SEED_GNN = {"GRAPH_SAGE", "GCN", "GAT", "RGCN"}
# _seed_rgcn materializes a (batch, R, d_in) per-(seed, relation) sum; cap
# R*d_in so that block stays a few hundred MB at batch 1000 — beyond it the
# all-N final stage is the better trade anyway
SEED_RGCN_MAX_R_DIN = 262_144


def supports_full_graph(config: EncoderConfig) -> bool:
    return all(l.gnn_type.upper() in SUPPORTED_GNN
               for s in config.stages for l in s
               if l.layer_type.upper() == "GNN")


def _has_gat(config: EncoderConfig) -> bool:
    return any(l.gnn_type.upper() == "GAT"
               for s in config.stages for l in s
               if l.layer_type.upper() == "GNN")


def encoder_has_rgcn(config: EncoderConfig) -> bool:
    """Callers use this to build the adjacency with its relational companion
    (build_full_graph_adjacency with_relations=True)."""
    return any(l.gnn_type.upper() == "RGCN"
               for s in config.stages for l in s
               if l.layer_type.upper() == "GNN")


def supports_seed_restrict(config: EncoderConfig) -> bool:
    """True when the FINAL stage is all seed-capable GNN layers, so training
    can compute it for the batch's seed rows only (see ``seed_restrict`` in
    full_graph_encoder_forward) instead of all N nodes."""
    if not supports_full_graph(config) or len(config.stages) == 0:
        return False
    last = config.stages[-1]
    if len(last) == 0 or any(
            l.layer_type.upper() != "GNN"
            or l.gnn_type.upper() not in SEED_GNN for l in last):
        return False
    return all(l.num_relations * l.input_dim <= SEED_RGCN_MAX_R_DIN
               for l in last if l.gnn_type.upper() == "RGCN")


def final_stage_has_rgcn(config: EncoderConfig) -> bool:
    """Callers use this to also build the directional relational flat lists
    the seed-restricted RGCN stage consumes."""
    if len(config.stages) == 0:
        return False
    return any(l.layer_type.upper() == "GNN"
               and l.gnn_type.upper() == "RGCN"
               for l in config.stages[-1])


def supports_sorted_space(config: EncoderConfig) -> bool:
    """True when the encoder can run internally in degree-SORTED row order
    (full_graph.make_nbr_sums sorted_space): SAGE/GCN aggregation only (GAT
    and RGCN carry their own order-coupled structures) and a pure-FEATURE
    input (an EMBEDDING table is live in original order — re-sorting it per
    step would re-introduce the permutation gather this mode removes)."""
    for s in config.stages:
        for l in s:
            lt = l.layer_type.upper()
            if lt == "EMBEDDING":
                return False
            if lt == "GNN" and l.gnn_type.upper() not in ("GRAPH_SAGE", "GCN"):
                return False
    return True


def prepare_full_graph(adj: FullGraphAdjacency, config: EncoderConfig,
                       features: Optional[Array] = None):
    """Build the closure ops the encoder needs for this adjacency+model.
    Returns (adj, ops): adj gains the inverse map when the encoder has GAT
    (whose backward needs it). With feature inputs, the first GNN stage's
    neighbor aggregation is precomputed once (see _const_first_agg).

    When the model qualifies (supports_sorted_space + feature inputs), the
    encoder runs internally in degree-SORTED row order: bucket gathers then
    read/write the sorted space directly and the per-pass inv_pos
    re-permutation gather + concat reorder disappear (~1 ms/pass at arxiv
    scale). Inputs/outputs at the API boundary stay in ORIGINAL order —
    full_graph_encoder_forward un-permutes all-N outputs once and relabels
    seed ids in-jit; seed flat lists must then hold sorted positions (the
    trainer relabels its device CSR, train/nc.py)."""
    if _has_gat(config):
        adj = build_inverse_map(adj)
    sorted_mode = (features is not None and adj.loc_perm is None
                   and supports_sorted_space(config))
    ops = {"nbr_sum": make_nbr_sums(adj, sorted_space=sorted_mode)}
    num_nbrs = None
    if sorted_mode:
        perm = jnp.asarray(np.argsort(np.asarray(adj.inv_pos),
                                      kind="stable").astype(np.int32))
        ops["sorted"] = True
        ops["inv_pos"] = adj.inv_pos
        features = features[perm]          # one-time device gather
        ops["feats_sorted"] = features
        num_nbrs = (adj.in_deg + adj.out_deg)[perm]
        ops["num_nbrs_sorted"] = num_nbrs
    if _has_gat(config):
        ops["gather_blocks"] = make_gather_blocks(adj)
        ops["to_sorted"], ops["to_orig"] = make_permuters(adj)
    if encoder_has_rgcn(config):
        from marius_tpu.data.full_graph_rel import make_rel_sum
        assert adj.rel is not None, \
            ("RGCN full-graph mode needs the relational companion: build "
             "the adjacency with with_relations=True")
        ops["rel_sum"] = make_rel_sum(adj.rel)
    ops["const_agg"] = _const_first_agg(adj, config, features,
                                        ops["nbr_sum"], ops,
                                        num_nbrs=num_nbrs)
    return adj, ops


class _ShardedAdjView:
    """Duck-typed FullGraphAdjacency stand-in for the node-sharded ring
    path: full_graph_encoder_forward's SAGE/GCN branches only read the
    degree vectors (padded to S*n_loc rows, sharded over the mesh axis)."""

    def __init__(self, in_deg, out_deg, num_nodes):
        self.in_deg = in_deg
        self.out_deg = out_deg
        self.num_nodes = num_nodes


def supports_sharded_full_graph(config: EncoderConfig) -> bool:
    """Ring-sharded mode covers GraphSAGE/GCN (plain neighbor-sum ring),
    GAT (two-pass attention ring, make_gat_ring), and RGCN (two-schedule
    relational ring, make_rel_sum_sharded)."""
    return all(l.gnn_type.upper() in ("GRAPH_SAGE", "GCN", "GAT", "RGCN")
               for s in config.stages for l in s
               if l.layer_type.upper() == "GNN")


def prepare_sharded_full_graph(sharded_graph, config: EncoderConfig,
                               in_deg, out_deg, mesh, axis: str,
                               features=None, rel_sharded=None,
                               const_agg=None):
    """(adj_view, ops) for full_graph_encoder_forward over a node-sharded
    mesh: nbr_sum is the collective-permute ring
    (data/full_graph_sharded.py); degree vectors are (S*n_loc,) padded +
    sharded. ``features``: the (S*n_loc, d) sharded block, enabling the
    same constant first-stage aggregation as the single-device path.
    ``rel_sharded``: a ShardedRelGraph, required when the encoder has RGCN
    stages."""
    from marius_tpu.data.full_graph_sharded import (
        make_gat_ring,
        make_nbr_sum_sharded,
    )

    assert supports_sharded_full_graph(config), \
        "sharded full-graph mode supports GraphSAGE/GCN/GAT/RGCN stages only"
    adj = _ShardedAdjView(in_deg, out_deg, sharded_graph.num_nodes)
    ops = {"nbr_sum": make_nbr_sum_sharded(sharded_graph, mesh, axis)}
    if _has_gat(config):
        ops["gat_ring_max"], ops["gat_ring_sum"] = make_gat_ring(
            sharded_graph, mesh, axis)
    if encoder_has_rgcn(config):
        from marius_tpu.data.full_graph_rel import make_rel_sum_sharded
        assert rel_sharded is not None, \
            ("sharded RGCN needs a ShardedRelGraph: build with "
             "build_sharded_rel_graph")
        ops["rel_sum"] = make_rel_sum_sharded(rel_sharded, mesh, axis)
    # const_agg: pass precomputed entries through (multi-controller traces
    # the ops inside jit and must not re-run the eager aggregation there)
    ops["const_agg"] = (const_agg if const_agg is not None
                        else _const_first_agg(adj, config, features,
                                              ops["nbr_sum"], ops))
    return adj, ops


def _const_first_agg(adj, config: EncoderConfig, features, nbr_sum,
                     ops=None, num_nbrs=None):
    """{(stage, layer): precomputed aggregation} for the first GNN stage.

    When the encoder input is a view of the node FEATURES (a single FEATURE
    stage — features are constants, never differentiated), the first GNN
    stage's neighbor sum is precomputable: compute it once here and train
    with ZERO layer-1 gathers (forward uses the constant; backward needs no
    input grad). At arxiv scale this removes 2 of 6 full-graph gathers per
    batch. Exact — the same op on the same constant input.

    A FEATURE stage with a trained bias (and no nonlinearity) stays
    precomputable because aggregation is LINEAR in the bias:
    nbr_sum(x + b) = nbr_sum(x) + count·b, where count is each node's real
    (non-padding) slot tally. Such entries are stored as
    AffineConst(base, count) and combined with the live bias param at run
    time by _resolve_const — the heavy gather never re-runs."""
    if features is None or len(config.stages) < 2:
        return {}
    s0 = config.stages[0]
    if len(s0) != 1 or s0[0].layer_type.upper() != "FEATURE":
        return {}
    bias0 = bool(s0[0].bias)
    if bias0 and s0[0].activation.upper() not in ("", "NONE"):
        return {}  # nonlinear activation after a trained bias: not constant
    current0 = feature_layer(dataclasses.replace(s0[0], bias=False),
                             {}, features)
    if num_nbrs is None:
        num_nbrs = adj.in_deg + adj.out_deg
    num_nbrs = num_nbrs.astype(features.dtype)
    inv_sqrt = 1.0 / jnp.sqrt(num_nbrs + 1.0)
    const = {}
    rgcn_blocks = None
    for j, layer in enumerate(config.stages[1]):
        if layer.layer_type.upper() != "GNN":
            continue
        g = layer.gnn_type.upper()
        if g == "GRAPH_SAGE":
            base = nbr_sum(current0)
            const[(1, j)] = (AffineConst(base, num_nbrs) if bias0 else base)
        elif g == "GCN":
            base = nbr_sum(current0 * inv_sqrt[:, None])
            if bias0:
                count = nbr_sum(inv_sqrt[:, None])[:, 0]
                const[(1, j)] = AffineConst(base, count)
            else:
                const[(1, j)] = base
        elif g == "RGCN" and not bias0:
            # the relation transform needs the live W, but the big slot
            # gather of the constant input can run ONCE: cache the gathered
            # blocks, each step only pays the einsum + anchor sum. (With a
            # trained stage-0 bias the blocks are no longer constant per
            # valid slot vs padding slot; skipped.)
            rel_sum = None if ops is None else ops.get("rel_sum")
            if rel_sum is not None and hasattr(rel_sum, "gather_blocks"):
                if rgcn_blocks is None:
                    rgcn_blocks = tuple(
                        jax.lax.stop_gradient(b)
                        for b in rel_sum.gather_blocks(current0))
                const[(1, j)] = ("rgcn_blocks", rgcn_blocks)
    return const


def _resolve_const(const, bias0, idx=None):
    """Materialize a const_agg entry; AffineConst entries fold in the live
    first-stage FEATURE bias (see _const_first_agg). ``idx`` restricts the
    result to the given rows without forming the full-N combination."""
    if isinstance(const, AffineConst):
        assert bias0 is not None, "affine const_agg needs the stage-0 bias"
        base, count = const.base, const.count
        if idx is not None:
            base, count = base[idx], count[idx]
        return base + count[:, None] * bias0
    return const if idx is None else const[idx]


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


def _full_graph_rgcn(layer: LayerConfig, p, x, ops, adj, const=None) -> Array:
    """rgcn_layer (layers.py) over ALL out-edges: mean over each node's
    out-neighbors of x[dst] @ W[rel], plus the self transform. ``rel_sum``
    (data/full_graph_rel.py) returns the per-node SUM; dividing by the real
    out-degree equals the sampled layer's masked_mean under unbounded ALL.
    ``const`` = ("rgcn_blocks", blocks): the constant input's slot gather,
    precomputed once (_const_first_agg) — only the transform runs live."""
    if const is not None:
        s = ops["rel_sum"].from_blocks(const[1], p["relation_matrices"])
    else:
        s = ops["rel_sum"](x, p["relation_matrices"])
    deg = jnp.maximum(adj.out_deg.astype(x.dtype), 1.0)
    out = s / deg[:, None] + x @ p["self_matrix"]
    return post_hook(layer, p, out)


def _sharded_gat(layer: LayerConfig, p, x, ops, train: bool,
                 dropout_key) -> Array:
    """GAT over the ring-sharded full graph (make_gat_ring): logits
    decompose as leaky(L_i + R_j), so per-node L/R/value vectors are
    computed globally (GSPMD row-sharded matmuls) and only R and the value
    block rotate. m is stop-gradiented — softmax shift invariance makes the
    computed gradient exact while skipping the max pass's backward."""
    h = layer.num_heads
    head_dim = (layer.output_dim if layer.average_heads
                else layer.output_dim // h)

    if train and layer.input_dropout > 0 and dropout_key is not None:
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 0),
                                    1.0 - layer.input_dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - layer.input_dropout), 0.0)

    w = p["w"].reshape(x.shape[-1], h, head_dim)
    t3 = jnp.einsum("nd,dhk->nhk", x, w)                   # (N', h, k)
    l_vec = jnp.einsum("nhk,hk->nh", t3, p["a_l"])
    r_vec = jnp.einsum("nhk,hk->nh", t3, p["a_r"])
    t = t3.reshape(x.shape[0], h * head_dim)

    slope = layer.negative_slope
    m_nbr = ops["gat_ring_max"](l_vec, r_vec, slope)
    self_logit = jax.nn.leaky_relu(l_vec + r_vec, slope)
    m = jax.lax.stop_gradient(jnp.maximum(m_nbr, self_logit))

    att_drop = (layer.attention_dropout
                if train and dropout_key is not None else 0.0)
    denom_nbr, numer_nbr = ops["gat_ring_sum"](
        l_vec, r_vec, t, m, slope, att_drop,
        jax.random.fold_in(dropout_key, 1) if att_drop > 0 else None)

    e_self = jnp.exp(self_logit - m)                       # (N', h)
    denom = denom_nbr + e_self
    alpha_self = e_self / denom
    if att_drop > 0:
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 2),
                                    1.0 - att_drop, alpha_self.shape)
        alpha_self = jnp.where(keep, alpha_self / (1.0 - att_drop), 0.0)
    out = (numer_nbr.reshape(-1, h, head_dim) / denom[:, :, None]
           + alpha_self[:, :, None] * t3)                  # (N', h, k)
    if layer.average_heads:
        y = jnp.mean(out, axis=1)
    else:
        y = out.reshape(out.shape[0], h * head_dim)
    return post_hook(layer, p, y)


def _full_graph_gat(layer: LayerConfig, p, x, adj, ops,
                    train: bool, dropout_key) -> Array:
    """gat_layer (layers.py) over the full adjacency, bucket by bucket.

    Each node's combined neighbor slots live in ONE bucket row, so the
    softmax (neighbors + self, exactly the sampled layer's slot set — the
    combined multiset equals in+out concatenation) is a per-bucket masked
    softmax. Gradients to neighbor inputs flow through gather_blocks'
    inverse-map vjp: no scatter anywhere."""
    h = layer.num_heads
    head_dim = (layer.output_dim if layer.average_heads
                else layer.output_dim // h)

    if train and layer.input_dropout > 0 and dropout_key is not None:
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 0),
                                    1.0 - layer.input_dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - layer.input_dropout), 0.0)

    # Round-5 perf restructure (same exact math, see gat_layer in
    # layers.py): never project per slot occurrence. Either project each
    # node ONCE and gather projected rows (h*k <= d_in), or softmax on
    # scalar logits gathered from x @ (w a_r) and project the per-head
    # weighted aggregate (h*k > d_in). The old per-bucket
    # (n, S, d_in) x (d_in, h, k) einsum made full-graph GAT the slowest
    # model family (PERF_RECORDS round 4: 2.47k nodes/s).
    d_in = x.shape[-1]
    w = p["w"].reshape(d_in, h, head_dim)
    project_first = h * head_dim <= d_in

    if project_first:
        t_flat = jnp.einsum("nd,dhk->nhk", x, w).reshape(x.shape[0], -1)
        blocks = ops["gather_blocks"](t_flat)  # per bucket (n_b, cap, h*k)
        t_sorted = ops["to_sorted"](t_flat)
        outs = []
        row0 = 0
        for b, blk in enumerate(blocks):
            n_b, cap = adj.nbrs[b].shape
            t = blk.reshape(n_b, cap, h, head_dim)
            t_self = jax.lax.dynamic_slice_in_dim(
                t_sorted, row0, n_b, 0).reshape(n_b, h, head_dim)
            row0 += n_b
            logit_l = jnp.einsum("nhk,hk->nh", t_self, p["a_l"])
            logit_r = jnp.einsum("nshk,hk->nsh", t, p["a_r"])
            self_r = jnp.einsum("nhk,hk->nh", t_self, p["a_r"])
            logits = jnp.concatenate(
                [logit_l[:, None, :] + logit_r,
                 (logit_l + self_r)[:, None, :]], axis=1)      # (n, S+1, h)
            logits = jax.nn.leaky_relu(logits, layer.negative_slope)
            mask = jnp.concatenate(
                [adj.nbrs[b] != adj.num_nodes, jnp.ones((n_b, 1), bool)],
                axis=1)
            alpha = masked_softmax(
                logits, mask[:, :, None] & jnp.ones((1, 1, h), bool), axis=1)
            if train and layer.attention_dropout > 0 and dropout_key is not None:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, 1000 + b),
                    1.0 - layer.attention_dropout, alpha.shape)
                alpha = jnp.where(keep,
                                  alpha / (1.0 - layer.attention_dropout), 0.0)
            out = jnp.einsum("nsh,nshk->nhk", alpha[:, :cap], t) + \
                alpha[:, cap][:, :, None] * t_self             # (n, h, k)
            out = (jnp.mean(out, axis=1) if layer.average_heads
                   else out.reshape(out.shape[0], h * head_dim))
            outs.append(out)
    else:
        # softmax on per-slot SCALAR logits gathered from the precomputed
        # (N, h) right-logit array (a_r . xW = x . (W a_r)); aggregate raw
        # features per head and project the (n, h, d) aggregate — the old
        # per-slot (n, S, d) x (d, h, k) projection einsum disappears.
        # (A transposed "fused" weighted-aggregation operator was tried and
        # reverted: its n8-batched (h, cap) x (cap, d) matmuls blew the
        # remote compile past 29 minutes at arxiv scale.)
        wal = jnp.einsum("dhk,hk->dh", w, p["a_l"])   # (d_in, h)
        war = jnp.einsum("dhk,hk->dh", w, p["a_r"])
        lr_all = x @ war                               # (N, h)
        blocks = ops["gather_blocks"](x)               # raw (n_b, cap, d_in)
        lr_blocks = ops["gather_blocks"](lr_all)       # (n_b, cap, h)
        x_sorted = ops["to_sorted"](x)
        ll_sorted = ops["to_sorted"](x @ wal)
        lr_sorted = ops["to_sorted"](lr_all)

        outs = []
        row0 = 0
        for b, blk in enumerate(blocks):
            n_b, cap = adj.nbrs[b].shape
            x_b = jax.lax.dynamic_slice_in_dim(x_sorted, row0, n_b, 0)
            logit_l = jax.lax.dynamic_slice_in_dim(ll_sorted, row0, n_b, 0)
            logit_r = lr_blocks[b]
            self_r = jax.lax.dynamic_slice_in_dim(lr_sorted, row0, n_b, 0)
            row0 += n_b
            logits = jnp.concatenate(
                [logit_l[:, None, :] + logit_r,
                 (logit_l + self_r)[:, None, :]], axis=1)      # (n, S+1, h)
            logits = jax.nn.leaky_relu(logits, layer.negative_slope)
            mask = jnp.concatenate(
                [adj.nbrs[b] != adj.num_nodes, jnp.ones((n_b, 1), bool)],
                axis=1)
            alpha = masked_softmax(
                logits, mask[:, :, None] & jnp.ones((1, 1, h), bool), axis=1)
            if train and layer.attention_dropout > 0 and dropout_key is not None:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, 1000 + b),
                    1.0 - layer.attention_dropout, alpha.shape)
                alpha = jnp.where(keep,
                                  alpha / (1.0 - layer.attention_dropout), 0.0)
            agg = jnp.einsum("nsh,nsd->nhd", alpha[:, :cap], blk) + \
                alpha[:, cap][:, :, None] * x_b[:, None, :]    # (n, h, d)
            out = jnp.einsum("nhd,dhk->nhk", agg, w)
            out = (jnp.mean(out, axis=1) if layer.average_heads
                   else out.reshape(out.shape[0], h * head_dim))
            outs.append(out)

    y_sorted = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
    y = ops["to_orig"](y_sorted)
    return post_hook(layer, p, y)


def _seed_gather(x: Array, flat_nbr: Array) -> Array:
    """Gather the (S, d) flat neighbor values; padding slots (id N) are out
    of range and read 0 (mode="fill" — no sentinel-row copy of x)."""
    return jnp.take(x, flat_nbr, axis=0, mode="fill", fill_value=0)


def _seed_sage(layer: LayerConfig, p, x, seeds, flat_nbr, flat_seg,
               num_nbrs, b: int, const_seed):
    """GraphSAGE final stage for the seed rows only: the neighbor sum is a
    segment_sum over the batch's flat CSR slots (~batch-degree-sum rows)
    instead of the full 2E-slot adjacency gather. ``const_seed`` is the
    precomputed aggregation already restricted to the seed rows."""
    x_seed = x[seeds]
    if const_seed is not None:
        agg = const_seed
    else:
        vals = _seed_gather(x, flat_nbr)
        agg = jax.ops.segment_sum(vals, flat_seg, num_segments=b + 1)[:b]
    return _full_graph_sage(layer, p, x_seed, agg, num_nbrs[seeds])


def _seed_gcn(layer: LayerConfig, p, x, seeds, flat_nbr, flat_seg,
              num_nbrs, b: int, const_seed):
    if const_seed is not None:
        agg = const_seed
    else:
        scaled = x / jnp.sqrt(num_nbrs + 1.0)[:, None]
        vals = _seed_gather(scaled, flat_nbr)
        agg = jax.ops.segment_sum(vals, flat_seg, num_segments=b + 1)[:b]
    return _full_graph_gcn(layer, p, agg, x[seeds], num_nbrs[seeds])


def _seed_rgcn(layer: LayerConfig, p, x, seeds, rel_flat, out_deg,
               b: int) -> Array:
    """RGCN final stage for the seed rows only. Aggregation is linear, so
    sum FIRST per (seed, relation) — one segment_sum over the batch's flat
    out-edge slots — then transform once per relation: a single
    (b, R, d_in) x (R, d_in, d_out) einsum on the MXU, instead of the
    reference's per-slot bmm (rgcn_layer.cpp) or an all-N stage."""
    flat_nbr, flat_rel, flat_seg = rel_flat
    r = layer.num_relations
    vals = _seed_gather(x, flat_nbr)                     # (S, d_in), pad -> 0
    key = jnp.minimum(flat_seg, b) * r + flat_rel        # pad -> [b*r, b*r+r)
    z = jax.ops.segment_sum(vals, key, num_segments=b * r + r)[:b * r]
    agg = jnp.einsum("bri,rio->bo", z.reshape(b, r, -1),
                     p["relation_matrices"])
    deg = jnp.maximum(out_deg[seeds].astype(x.dtype), 1.0)
    out = agg / deg[:, None] + x[seeds] @ p["self_matrix"]
    return post_hook(layer, p, out)


def _seed_gat(layer: LayerConfig, p, x, seeds, flat_nbr, flat_seg,
              b: int, num_nodes: int, train: bool, dropout_key) -> Array:
    """GAT final stage over the seeds' flat CSR slots: the softmax over
    neighbors+self becomes segment_max/segment_sum over ~batch-degree-sum
    rows (same math as _full_graph_gat's per-bucket masked softmax)."""
    h = layer.num_heads
    head_dim = (layer.output_dim if layer.average_heads
                else layer.output_dim // h)

    if train and layer.input_dropout > 0 and dropout_key is not None:
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 0),
                                    1.0 - layer.input_dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - layer.input_dropout), 0.0)

    w = p["w"].reshape(x.shape[-1], h, head_dim)
    vals = _seed_gather(x, flat_nbr)                       # (S, d_in)
    t = jnp.einsum("sd,dhk->shk", vals, w)                 # (S, h, k)
    t_self = jnp.einsum("nd,dhk->nhk", x[seeds], w)        # (b, h, k)
    logit_l = jnp.einsum("nhk,hk->nh", t_self, p["a_l"])   # (b, h)
    self_r = jnp.einsum("nhk,hk->nh", t_self, p["a_r"])
    logit_r = jnp.einsum("shk,hk->sh", t, p["a_r"])        # (S, h)
    logit_l_pad = jnp.concatenate(
        [logit_l, jnp.zeros((1, h), logit_l.dtype)], 0)
    slot_logits = jax.nn.leaky_relu(
        logit_l_pad[flat_seg] + logit_r, layer.negative_slope)
    self_logits = jax.nn.leaky_relu(logit_l + self_r, layer.negative_slope)

    mask = (flat_nbr != num_nodes)[:, None]
    neg_big = jnp.asarray(-1e30, slot_logits.dtype)
    m_nbr = jax.ops.segment_max(
        jnp.where(mask, slot_logits, neg_big), flat_seg,
        num_segments=b + 1)[:b]
    m = jnp.maximum(m_nbr, self_logits)                    # (b, h)
    m_pad = jnp.concatenate([m, jnp.zeros((1, h), m.dtype)], 0)
    e_slot = jnp.where(mask, jnp.exp(slot_logits - m_pad[flat_seg]), 0.0)
    e_self = jnp.exp(self_logits - m)
    denom = jax.ops.segment_sum(e_slot, flat_seg,
                                num_segments=b + 1)[:b] + e_self
    denom_pad = jnp.concatenate(
        [denom, jnp.ones((1, h), denom.dtype)], 0)
    alpha_slot = e_slot / denom_pad[flat_seg]
    alpha_self = e_self / denom
    if train and layer.attention_dropout > 0 and dropout_key is not None:
        q = 1.0 - layer.attention_dropout
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 1),
                                    q, alpha_slot.shape)
        alpha_slot = jnp.where(keep, alpha_slot / q, 0.0)
        keep = jax.random.bernoulli(jax.random.fold_in(dropout_key, 2),
                                    q, alpha_self.shape)
        alpha_self = jnp.where(keep, alpha_self / q, 0.0)
    out = jax.ops.segment_sum(alpha_slot[:, :, None] * t, flat_seg,
                              num_segments=b + 1)[:b] \
        + alpha_self[:, :, None] * t_self                  # (b, h, k)
    if layer.average_heads:
        y = jnp.mean(out, axis=1)
    else:
        y = out.reshape(out.shape[0], h * head_dim)
    return post_hook(layer, p, y)


def full_graph_encoder_forward(
    config: EncoderConfig,
    params,
    embeddings: Optional[Array],   # (N, emb_dim) all-node block
    features: Optional[Array],     # (N, feat_dim) all-node block
    adj: FullGraphAdjacency,
    ops=None,                      # from prepare_full_graph
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    seed_restrict=None,            # (seeds (b,), flat_nbr (S,), flat_seg (S,))
) -> Array:
    """Representations for ALL nodes: (N, d_out). With ``seed_restrict``
    (requires supports_seed_restrict(config)), the FINAL stage is computed
    only for the given seed rows — returns (b, d_out) — replacing its
    full-adjacency gather (and the matching backward gather) with flat
    segment ops over the batch's own neighbor slots."""
    if ops is None:
        adj, ops = prepare_full_graph(adj, config)
    nbr_sum = ops["nbr_sum"]
    sorted_mode = bool(ops.get("sorted"))
    if sorted_mode:
        # internal degree-SORTED row space (prepare_full_graph): constants
        # are pre-sorted; seed ids relabel in-jit; all-N outputs un-permute
        # once at the bottom. Seed flat lists must already hold sorted
        # positions (the trainer relabels its device CSR).
        features = ops["feats_sorted"]
        num_nbrs = ops["num_nbrs_sorted"].astype(features.dtype)
    else:
        num_nbrs = (adj.in_deg + adj.out_deg).astype(
            (embeddings if embeddings is not None else features).dtype)
    if seed_restrict is not None:
        seeds, flat_nbr, flat_seg = seed_restrict[:3]
        # optional 4th element: (flat_nbr, flat_rel, flat_seg) over the
        # DIRECTED out-edges, consumed by RGCN final-stage layers
        rel_flat = seed_restrict[3] if len(seed_restrict) > 3 else None
        nseeds = seeds.shape[0]
        if sorted_mode:
            seeds = ops["inv_pos"][seeds]

    outputs: List[Array] = []
    current: Optional[Array] = None
    for i, stage in enumerate(config.stages):
        seed_stage = seed_restrict is not None and i == len(config.stages) - 1
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
                const = ops.get("const_agg", {}).get((i, j))
                bias0 = params[0][0].get("bias") if const is not None else None
                if seed_stage:
                    k_d = (None if dropout_key is None
                           else jax.random.fold_in(dropout_key, i * 101 + j))
                    # "rgcn_blocks" consts cache the FULL-graph slot gather;
                    # the seed stage aggregates only the batch's own
                    # out-edges, so there is nothing to restrict — skip
                    rgcn_const = (isinstance(const, tuple) and len(const)
                                  and const[0] == "rgcn_blocks")
                    c_seed = (None if const is None or rgcn_const
                              else _resolve_const(const, bias0, idx=seeds))
                    if g == "GRAPH_SAGE":
                        stage_outputs.append(_seed_sage(
                            layer, p, current, seeds, flat_nbr, flat_seg,
                            num_nbrs, nseeds, c_seed))
                    elif g == "GCN":
                        stage_outputs.append(_seed_gcn(
                            layer, p, current, seeds, flat_nbr, flat_seg,
                            num_nbrs, nseeds, c_seed))
                    elif g == "GAT":
                        stage_outputs.append(_seed_gat(
                            layer, p, current, seeds, flat_nbr, flat_seg,
                            nseeds, adj.num_nodes, train, k_d))
                    elif g == "RGCN":
                        assert rel_flat is not None, \
                            ("seed-restricted RGCN needs the relational "
                             "flat lists (device_seed_flat_lists_rel)")
                        stage_outputs.append(_seed_rgcn(
                            layer, p, current, seeds, rel_flat,
                            adj.out_deg, nseeds))
                    else:
                        raise ValueError(
                            f"seed-restricted mode does not support "
                            f"{layer.gnn_type}")
                elif g == "GRAPH_SAGE":
                    agg = (_resolve_const(const, bias0) if const is not None
                           else nbr_sum(current))
                    stage_outputs.append(_full_graph_sage(
                        layer, p, current, agg, num_nbrs))
                elif g == "GCN":
                    if const is None:
                        x_scaled_sum = nbr_sum(
                            current / jnp.sqrt(num_nbrs + 1.0)[:, None])
                    else:
                        x_scaled_sum = _resolve_const(const, bias0)
                    stage_outputs.append(_full_graph_gcn(
                        layer, p, x_scaled_sum, current, num_nbrs))
                elif g == "GAT":
                    k_gat = (None if dropout_key is None
                             else jax.random.fold_in(dropout_key, i * 101 + j))
                    if "gat_ring_max" in ops:
                        stage_outputs.append(_sharded_gat(
                            layer, p, current, ops, train, k_gat))
                    else:
                        stage_outputs.append(_full_graph_gat(
                            layer, p, current, adj, ops, train, k_gat))
                elif g == "RGCN":
                    stage_outputs.append(_full_graph_rgcn(
                        layer, p, current, ops, adj, const=const))
                else:
                    raise ValueError(
                        f"full-graph mode does not support {layer.gnn_type}; "
                        "use the sampled path")
            else:
                raise ValueError(f"Unknown layer type: {layer.layer_type}")
        outputs = stage_outputs
        current = (stage_outputs[0] if len(stage_outputs) == 1
                   else jnp.concatenate(stage_outputs, axis=1))
    if sorted_mode and seed_restrict is None:
        return current[ops["inv_pos"]]     # back to original node order
    return current
