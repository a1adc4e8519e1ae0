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
    full_graph=None,    # FullGraphAdjacency: exact-ALL one-pass encoding
    fg_ops=None,        # prepared ops from prepare_full_graph (optional)
) -> Array:
    """Encoded representations (num_nodes, d_out) for every node."""
    if not nbr_configs:
        # shallow encoder: single pass over the raw table/features
        return encoder_forward(model.encoder, params["encoder"], table_values,
                               None if features is None else features[:-1])

    if full_graph is not None:
        # exact unbounded-ALL encoding in ONE full-graph pass (every GNN
        # layer over all nodes, data/full_graph.py) — replaces per-batch
        # frontier sampling AND the all_cap_limit truncation; callers gate
        # on all eval samplers being ALL
        from marius_tpu.nn.full_graph_encoder import (
            full_graph_encoder_forward,
            prepare_full_graph,
        )
        feats = None if features is None else features[:-1]
        if fg_ops is None:
            full_graph, fg_ops = prepare_full_graph(
                full_graph, model.encoder, feats)

        # feats/adjacency ride as ARGUMENTS (closure constants get
        # serialized into the compiled module by remote compilers); fg_ops
        # holds callables and stays a closure — its large const arrays are
        # device-resident jax.Arrays the callables reference at trace time
        @jax.jit
        def enc_fg(table_values, params, feats_a, fg_a):
            return full_graph_encoder_forward(
                model.encoder, params["encoder"], table_values, feats_a,
                fg_a, ops=fg_ops, train=False)

        return enc_fg(table_values, params, feats, full_graph)

    assert graph is not None
    num_nodes = graph.num_nodes
    caps = tuple(hop_caps or estimate_hop_caps(batch_size, nbr_configs, num_nodes))
    nb = -(-num_nodes // batch_size)
    ids = jnp.concatenate([jnp.arange(num_nodes, dtype=jnp.int32),
                           jnp.full((nb * batch_size - num_nodes,), num_nodes, jnp.int32)])

    @jax.jit
    def encode(table_values, params, ids, graph_a, features_a):
        # graph/features ride as ARGUMENTS — closure constants get
        # serialized into the compiled module (multi-hundred-MB feature
        # tables exceed remote-compile request limits)
        def body(_, xs):
            seeds, idx = xs
            mask = seeds < num_nodes
            k = jax.random.fold_in(jax.random.key(seed), idx)
            batch = sample_neighbor_batch(k, graph_a, seeds, mask, nbr_configs, caps)
            outer = batch.node_ids[0]
            emb = None if table_values is None else gather_rows(table_values, outer)
            feats = None if features_a is None else \
                features_a[jnp.minimum(outer, num_nodes)]
            out = encoder_forward(model.encoder, params["encoder"], emb, feats,
                                  batch, degrees=graph_a.degrees, train=False)
            return None, out

        _, outs = jax.lax.scan(body, None,
                               (ids.reshape(nb, batch_size), jnp.arange(nb)))
        return outs.reshape(nb * batch_size, -1)[:num_nodes]

    return encode(table_values, params, ids, graph, features)


def encode_all_nodes_host(
    model: Model,
    params,
    host_values: Optional["np.ndarray"],  # (N, emb_dim) host table, or None
    graph: Optional[DeviceGraph] = None,
    nbr_configs: Sequence[NeighborSamplingConfig] = (),
    features_host: Optional["np.ndarray"] = None,  # (N, F) or (N+1, F) host
    batch_size: int = 1000,
    hop_caps: Optional[Sequence[int]] = None,
    seed: int = 13,
) -> "np.ndarray":
    """``encode_all_nodes`` for tables that do NOT fit in HBM.

    The embedding/feature tables stay in host RAM; only one node tile's
    gathered neighborhood rows (O(hop_cap * d)) plus the graph CSR ever live
    on the device. Works for ANY encoder — identity, transformed, and GNN —
    closing the reference's full-graph eval for buffer-backed storage
    (graph_storage.cpp:31-51 reads an InMemory mirror; here nothing is
    mirrored).

    Sampling uses the same seed/fold-in/cap scheme as ``encode_all_nodes``,
    so with equal ``batch_size`` the two produce identical encodings.
    Returns the full (num_nodes, d_out) encoded table as host numpy.
    """
    if host_values is not None:
        host_values = np.asarray(host_values)
    num_nodes = (graph.num_nodes if graph is not None
                 else len(host_values) if host_values is not None
                 else len(features_host))
    feats_padded = None
    if features_host is not None:
        feats_padded = np.asarray(features_host)
        if len(feats_padded) == num_nodes:      # add the sentinel row
            feats_padded = np.concatenate(
                [feats_padded, np.zeros((1, feats_padded.shape[1]),
                                        feats_padded.dtype)])

    nb = -(-num_nodes // batch_size)
    out_host: Optional[np.ndarray] = None

    if not nbr_configs:
        # shallow (possibly transformed) encoder: stream raw rows through it
        @jax.jit
        def encode_tile(emb, feats):
            return encoder_forward(model.encoder, params["encoder"], emb, feats)

        for i in range(nb):
            lo, hi = i * batch_size, min((i + 1) * batch_size, num_nodes)
            idx = np.minimum(np.arange(lo, lo + batch_size), num_nodes - 1)
            emb = None if host_values is None else jnp.asarray(host_values[idx])
            feats = (None if feats_padded is None
                     else jnp.asarray(feats_padded[np.minimum(idx, num_nodes)]))
            out = np.asarray(encode_tile(emb, feats))
            if out_host is None:
                out_host = np.empty((num_nodes, out.shape[1]), out.dtype)
            out_host[lo:hi] = out[:hi - lo]
        return out_host

    assert graph is not None, "GNN host encoding needs the graph CSR"
    caps = tuple(hop_caps or estimate_hop_caps(batch_size, nbr_configs, num_nodes))

    @jax.jit
    def sample_tile(idx, seeds, graph_a):
        # graph rides as an ARGUMENT: a freebase86m-scale CSR (~2.7 GB) as a
        # closure constant would exceed remote-compile request limits
        mask = seeds < num_nodes
        k = jax.random.fold_in(jax.random.key(seed), idx)
        return sample_neighbor_batch(k, graph_a, seeds, mask, nbr_configs, caps)

    @jax.jit
    def encode_tile(batch, emb, feats, degrees_a):
        return encoder_forward(model.encoder, params["encoder"], emb, feats,
                               batch, degrees=degrees_a, train=False)

    for i in range(nb):
        lo, hi = i * batch_size, min((i + 1) * batch_size, num_nodes)
        seeds = np.full((batch_size,), num_nodes, np.int32)
        seeds[:hi - lo] = np.arange(lo, hi, dtype=np.int32)
        batch = sample_tile(jnp.asarray(i, jnp.int32), jnp.asarray(seeds), graph)
        # host-side gather of the outermost hop's rows (the only table access)
        outer = np.asarray(batch.node_ids[0])
        emb = (None if host_values is None
               else jnp.asarray(host_values[np.minimum(outer, num_nodes - 1)]))
        feats = (None if feats_padded is None
                 else jnp.asarray(feats_padded[np.minimum(outer, num_nodes)]))
        out = np.asarray(encode_tile(batch, emb, feats, graph.degrees))
        if out_host is None:
            out_host = np.empty((num_nodes, out.shape[1]), out.dtype)
        out_host[lo:hi] = out[:hi - lo]
    return out_host
