"""No captured device arrays (jaxpr consts) in donating hot functions.

Round-5 finding: on the TPU runtime, a donating jit that CAPTURES any
pre-existing jax.Array (a jaxpr const — even a 1.6 KB relation table) loses
input-output buffer aliasing for its donated arguments: every call then
copies the donated buffers in full. On the out-of-core trainer that is the
whole resident buffer pair per BATCH (~14 ms at freebase86m shape — a
measured ~1000x slowdown of the update, the round-4 'column-major scatter
floor' in PERF_RECORDS.md, now root-caused). Large read-only arrays must
ride the argument pytree (trainer._data_args / state_fn args), never the
closure. These tests trace the compiled hot functions and fail on ANY
const, so a future capture cannot silently reintroduce the copies.
"""

import jax
import numpy as np
import pytest

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model
from marius_tpu.ops.edge_keys import build_edge_key_set


def _assert_no_consts(traced, what):
    consts = traced.jaxpr.consts
    shapes = [(np.shape(c), str(getattr(c, "dtype", type(c)))) for c in consts]
    assert not consts, (
        f"{what} captures {len(consts)} device arrays as jaxpr consts "
        f"{shapes} — captured arrays break donation (full buffer copies "
        f"per call); pass them as arguments instead")


def _lp_edges(n=200, r=4, e=1000, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                     rng.integers(0, n, e)], 1).astype(np.int32)


def _lp_model(r=4, d=16):
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    return Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, d))


@pytest.mark.parametrize("filtered", [False, True])
def test_lp_epoch_fn_no_captures(filtered):
    from marius_tpu.train.trainer import LinkPredictionTrainer

    n, r = 200, 4
    edges = _lp_edges(n, r)
    keys = ((build_edge_key_set(edges, True), build_edge_key_set(edges, False))
            if filtered else None)
    tr = LinkPredictionTrainer(_lp_model(r), n, r, edges,
                               NegativeSamplingConfig(2, 8), batch_size=100,
                               train_filter_keys=keys)
    traced = tr._epoch_fn.trace(tr.state, tr.edges, tr._data_args())
    _assert_no_consts(traced, f"LP epoch fn (filtered={filtered})")


def test_lp_gnn_epoch_fn_no_captures():
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.train.trainer import LinkPredictionTrainer

    n, r = 200, 4
    edges = _lp_edges(n, r)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=16),),
        (LayerConfig(layer_type="GNN", input_dim=16, output_dim=16,
                     gnn_type="GRAPH_SAGE"),)))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, 16))
    graph = build_device_graph(edges, n, r)
    tr = LinkPredictionTrainer(
        model, n, r, edges, NegativeSamplingConfig(2, 8), batch_size=100,
        graph=graph,
        nbr_configs=(NeighborSamplingConfig("UNIFORM", max_neighbors=4),))
    traced = tr._epoch_fn.trace(tr.state, tr.edges, tr._data_args())
    _assert_no_consts(traced, "LP GNN epoch fn")


def test_lp_chunk_fn_no_captures():
    from marius_tpu.train.trainer import LinkPredictionTrainer

    n, r = 200, 4
    edges = _lp_edges(n, r)
    tr = LinkPredictionTrainer(_lp_model(r), n, r, edges,
                               NegativeSamplingConfig(2, 8), batch_size=100,
                               edges_backend="HOST_MEMORY")
    ce = tr.chunk_batches * tr.batch_size
    chunk = jax.numpy.zeros((ce, 3), jax.numpy.int32)
    masks = jax.numpy.ones((ce,), bool)
    traced = tr._chunk_fn.trace(tr.state, chunk, masks, tr._data_args())
    _assert_no_consts(traced, "LP chunk fn")


@pytest.mark.parametrize("filtered", [False, True])
def test_buffer_state_fn_no_captures(filtered):
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    n, r = 4000, 8
    edges = _lp_edges(n, r, e=40_000, seed=1)
    keys = ((build_edge_key_set(edges, True), build_edge_key_set(edges, False))
            if filtered else None)
    tr = PartitionBufferLPTrainer(
        _lp_model(r), n, r, edges,
        NegativeSamplingConfig(4, 16, degree_fraction=0.5), batch_size=500,
        num_partitions=4, buffer_capacity=2, seed=0, train_filter_keys=keys)

    recorded = {}
    orig_build = tr._build_state_fn

    def build(num_batches):
        fn = orig_build(num_batches)

        def wrapper(*args):
            recorded.setdefault("args", args)
            recorded.setdefault("fn", fn)
            return fn(*args)
        return wrapper

    tr._build_state_fn = build
    tr.train_epoch(max_states=1, final_flush=False)
    traced = recorded["fn"].trace(*recorded["args"])
    _assert_no_consts(traced, f"buffer state fn (filtered={filtered})")


def test_lp_eval_fn_no_captures():
    """The filtered evaluator's compiled scan must take the key sets as
    arguments — closing over them embeds the FULL sorted edge set as
    compiled-module constants (gigabytes in the remote compile request at
    freebase86m scale)."""
    from marius_tpu.train.evaluator import LinkPredictionEvaluator
    from marius_tpu.train.trainer import LinkPredictionTrainer

    n, r = 200, 4
    edges = _lp_edges(n, r)
    tr = LinkPredictionTrainer(_lp_model(r), n, r, edges,
                               NegativeSamplingConfig(2, 8), batch_size=100)
    ev = LinkPredictionEvaluator(_lp_model(r), n, r, edges[:100],
                                 all_edges=edges, batch_size=50,
                                 filtered=True)
    encoded = tr.state.table.values
    traced = ev._eval_fn.trace(encoded, tr.state.params, ev.edges,
                               ev._key_args())
    _assert_no_consts(traced, "LP filtered eval fn")


def test_nc_epoch_fn_no_captures():
    from marius_tpu.train.nc import NodeClassificationTrainer
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig

    rng = np.random.default_rng(0)
    n, e, classes, f = 300, 1500, 5, 8
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)], 1).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", input_dim=f, output_dim=classes,
                     gnn_type="GRAPH_SAGE"),)))
    model = Model("NODE_CLASSIFICATION", enc)
    from marius_tpu.data.graph import build_device_graph
    graph = build_device_graph(edges, n, 1)
    tr = NodeClassificationTrainer(
        model, graph, feats, labels, np.arange(200, dtype=np.int32),
        (NeighborSamplingConfig("UNIFORM", max_neighbors=4),),
        batch_size=100)
    traced = tr._epoch_fn.trace(tr.state, tr.train_nodes, tr._fg_struct,
                                None if tr.full_graph is not None
                                else tr._data_args())
    _assert_no_consts(traced, "NC epoch fn")
