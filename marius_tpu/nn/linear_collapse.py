"""Exact linear-GNN collapse for full-graph training (TPU-first).

The reference's flagship NC config (ogbn_arxiv.yaml: FEATURE + 3x GraphSAGE
MEAN, bias only — the default activation is NONE,
/root/reference/src/python/tools/configuration/marius_config.py:199) is a
LINEAR network in its input. For such encoders the full-graph forward
factors EXACTLY:

    H_k = C_k @ M_k(params)

where C_k is a CONSTANT (N, K_k) matrix — polynomial-of-adjacency features
built ONCE at setup (a handful of bucketed gather passes) — and M_k a small
(K_k, d) matrix-valued function of the live layer weights. One batch's
logits become

    logits = C_final[seeds] @ M_final(params)

i.e. a (batch, K) row gather plus tiny matmuls: the per-step full-graph
gather passes (the HBM/VPU bottleneck of GNN training, ~12 ms/batch at
arxiv scale on v5e) disappear entirely. Because M_final is the SAME
function of the SAME parameters as the layerwise network, autodiff through
this form yields mathematically identical gradients — the optimizer
trajectory matches the layerwise full-graph path up to float associativity
(which already differs between the sampled and full-graph paths).

Per-stage constant/weight recurrences (matching nn/full_graph_encoder.py's
layer semantics, themselves parity-tested against the reference's
graph_sage_layer.cpp:37-97 / gcn_layer.cpp):

- FEATURE (+bias b0, activation NONE):  C = [F | 1],  M = [I ; b0^T]
- SAGE MEAN  (out = x w1 + (Ax / max(deg,1)) w2 + b):
      C' = [C | (A C) / max(deg,1) | 1],  M' = [M w1 ; M w2 ; b^T]
- SAGE GCN   (out = ((Ax + x) / (deg+1)) w1 + b):
      C' = [(A C + C) / (deg+1) | 1],     M' = [M w1 ; b^T]
- GCN        (out = ((A(x/s) + x/s) / s) w  + b, s = sqrt(deg+1)):
      C' = [(A (C/s) + C/s) / s | 1],     M' = [M w ; b^T]

A is the symmetric combined (in+out) neighbor-sum operator
(data/full_graph.py make_nbr_sums). K grows by K+1 per SAGE-MEAN stage and
by 1 otherwise; eligibility caps K (MAX_K) so pathological depth/width
falls back to the general gather path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.full_graph import FullGraphAdjacency, make_nbr_sums
from marius_tpu.nn.encoder import EncoderConfig

Array = jax.Array

MAX_K = 4096  # widest collapsed feature matrix we are willing to hold


def _gnn_kind(layer) -> Optional[str]:
    """'sage_mean' | 'sage_gcn' | 'gcn' for collapsible GNN layers."""
    g = layer.gnn_type.upper()
    if g == "GRAPH_SAGE":
        return ("sage_gcn" if layer.aggregator.upper() == "GCN"
                else "sage_mean")
    if g == "GCN":
        return "gcn"
    return None


def linear_collapse_eligible(config: EncoderConfig,
                             has_features: bool) -> bool:
    """True when the encoder is a single-FEATURE input followed by LINEAR
    (activation NONE) single-layer SAGE/GCN stages — the exact shape the
    reference's arxiv config has. Anything else (EMBEDDING inputs, GAT,
    RGCN, activations, reductions, parallel stage layers) uses the general
    full-graph path."""
    if not has_features or len(config.stages) < 2:
        return False
    s0 = config.stages[0]
    if len(s0) != 1 or s0[0].layer_type.upper() != "FEATURE":
        return False
    act0 = s0[0].activation.upper() not in ("", "NONE")
    if act0 and s0[0].bias:
        return False  # act(F + b0) is affine in b0 only without the act
    k = s0[0].output_dim + (1 if s0[0].bias else 0)
    for stage in config.stages[1:]:
        if len(stage) != 1 or stage[0].layer_type.upper() != "GNN":
            return False
        layer = stage[0]
        if layer.activation.upper() not in ("", "NONE"):
            return False
        kind = _gnn_kind(layer)
        if kind is None:
            return False
        k = (2 * k + 1) if kind == "sage_mean" else (k + 1)
        if k > MAX_K:
            return False
    return True


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearCollapse:
    """phi: (N, K) constant collapsed features; ``sections``/``kinds`` are
    the static recipe for rebuilding M_final from live params in-jit."""

    phi: Array
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    feat_dim: int = dataclasses.field(metadata=dict(static=True))
    bias0: bool = dataclasses.field(metadata=dict(static=True))
    kinds: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))

    def m_final(self, enc_params) -> Array:
        """(K, d_out) live matrix from encoder params — the same function of
        the same parameters as the layerwise network, so autodiff through it
        reproduces the layerwise gradients exactly."""
        p0 = enc_params[0][0]
        d_f = self.feat_dim
        m = jnp.eye(d_f, dtype=self.phi.dtype)
        if self.bias0:
            m = jnp.concatenate([m, p0["bias"][None, :]], 0)
        for i, kind in enumerate(self.kinds):
            p = enc_params[i + 1][0]
            if kind == "sage_mean":
                rows = [m @ p["w1"], m @ p["w2"]]
            elif kind == "sage_gcn":
                rows = [m @ p["w1"]]
            else:  # gcn
                rows = [m @ p["w"]]
            b = p.get("bias")
            if b is None:
                b = jnp.zeros((rows[0].shape[1],), self.phi.dtype)
            m = jnp.concatenate(rows + [b[None, :]], 0)
        return m

    def logits(self, enc_params, rows: Array) -> Array:
        """(len(rows), d_out) — one batch: gather K-wide collapsed feature
        rows, one small matmul."""
        return self.phi[rows] @ self.m_final(enc_params)

    def logits_all(self, enc_params) -> Array:
        return self.phi @ self.m_final(enc_params)


def build_linear_collapse(adj: FullGraphAdjacency, config: EncoderConfig,
                          features: Array, dtype=None) -> LinearCollapse:
    """One-time setup: propagate the constant feature matrix through the
    stage recurrences (a few bucketed gather passes), return the collapsed
    structure. ``features``: (N, >=feat_dim) WITHOUT the sentinel row."""
    assert linear_collapse_eligible(config, True)
    nbr_sum = make_nbr_sums(adj)
    dtype = dtype or features.dtype
    s0 = config.stages[0][0]
    n = adj.num_nodes
    kinds = tuple(_gnn_kind(stage[0]) for stage in config.stages[1:])

    @jax.jit  # ONE compile for the whole propagation (eager per-bucket
    def _build(feats):  # dispatch through a remote-compile tunnel is slow)
        f = feats[:, s0.offset:s0.offset + s0.output_dim].astype(dtype)
        if s0.activation.upper() not in ("", "NONE"):
            from marius_tpu.nn.layers import apply_activation
            f = apply_activation(s0.activation, f)
        ones = jnp.ones((n, 1), dtype)
        deg = (adj.in_deg + adj.out_deg).astype(dtype)
        c = jnp.concatenate([f, ones], 1) if s0.bias else f
        for kind in kinds:
            if kind == "sage_mean":
                d = nbr_sum(c) / jnp.maximum(deg, 1.0)[:, None]
                c = jnp.concatenate([c, d, ones], 1)
            elif kind == "sage_gcn":
                a = (nbr_sum(c) + c) / (deg + 1.0)[:, None]
                c = jnp.concatenate([a, ones], 1)
            else:  # gcn
                s = jnp.sqrt(deg + 1.0)[:, None]
                scaled = c / s
                a = (nbr_sum(scaled) + scaled) / s
                c = jnp.concatenate([a, ones], 1)
        return c

    return LinearCollapse(phi=jax.block_until_ready(_build(features)),
                          num_nodes=n,
                          feat_dim=int(s0.output_dim), bias0=bool(s0.bias),
                          kinds=kinds)
