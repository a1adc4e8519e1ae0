"""Link prediction with a GNN encoder (embedding + GraphSAGE stages), matching
the reference's gs_1_layer / gs_3_layer e2e config fragments (SURVEY §4)."""

import numpy as np
import pytest

from marius_tpu.data.graph import build_device_graph
from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.trainer import LinkPredictionTrainer
from tests.test_lp_e2e import generate_random_lp_dataset, NUM_NODES, NUM_RELS

DIM = 16


def _gnn_lp_model():
    encoder = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=DIM),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE", aggregator="MEAN",
                     input_dim=DIM, output_dim=DIM, bias=True),),
    ))
    return Model(
        learning_task="LINK_PREDICTION",
        encoder=encoder,
        decoder=EdgeDecoder("DISTMULT", NUM_RELS, DIM),
        loss_type="SOFTMAX_CE",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.05),
        sparse_lr=0.1,
    )


def test_gnn_lp_trains_and_evaluates():
    train, valid, test = generate_random_lp_dataset()
    graph = build_device_graph(train, NUM_NODES, NUM_RELS)
    nbr = [NeighborSamplingConfig("UNIFORM", max_neighbors=5)]
    trainer = LinkPredictionTrainer(
        _gnn_lp_model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0, graph=graph, nbr_configs=nbr)
    stats = trainer.train(4)
    assert np.isfinite(stats[-1]["loss"])
    assert stats[-1]["loss"] < stats[0]["loss"]

    all_edges = np.concatenate([train, valid, test])
    ev = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, train[:100],
        all_edges=all_edges, batch_size=100, filtered=True,
        graph=graph, nbr_configs=nbr)
    res = ev.evaluate(trainer.state)
    random_mrr = sum(1.0 / r for r in range(1, NUM_NODES + 1)) / NUM_NODES
    assert res["mrr"] > 2 * random_mrr, f"GNN LP MRR too low: {res['mrr']}"


@pytest.mark.slow
def test_gnn_host_tiled_eval_matches_device_eval():
    """evaluate_from_host_table with a GNN encoder: the raw table stays in
    host RAM (simulating a >HBM table), node tiles are encoded through the
    device with sampled neighborhoods, and the filtered metrics must match
    the in-HBM path (same batch_size => identical sampling)."""
    train, valid, test = generate_random_lp_dataset()
    graph = build_device_graph(train, NUM_NODES, NUM_RELS)
    nbr = [NeighborSamplingConfig("UNIFORM", max_neighbors=5)]
    trainer = LinkPredictionTrainer(
        _gnn_lp_model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0, graph=graph, nbr_configs=nbr)
    trainer.train(2)

    all_edges = np.concatenate([train, valid, test])
    ev = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, test,
        all_edges=all_edges, batch_size=50, filtered=True,
        graph=graph, nbr_configs=nbr)
    res_dev = ev.evaluate(trainer.state)
    host = np.asarray(trainer.state.table.values)
    res_host = ev.evaluate_from_host_table(
        host, trainer.state.params, edge_slice=32, node_tile=16)
    assert abs(res_dev["mrr"] - res_host["mrr"]) < 1e-5
    assert abs(res_dev["mean_rank"] - res_host["mean_rank"]) < 1e-3


def test_transformed_encoder_host_tiled_eval():
    """Non-identity (bias+activation) shallow encoder through the host-tiled
    path — previously rejected by an identity-only assertion."""
    from marius_tpu.nn.model import Model
    train, valid, test = generate_random_lp_dataset()
    encoder = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=DIM, bias=True,
                     activation="RELU"),),
    ))
    model = Model(
        learning_task="LINK_PREDICTION",
        encoder=encoder,
        decoder=EdgeDecoder("DISTMULT", NUM_RELS, DIM),
        loss_type="SOFTMAX_CE",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.05),
        sparse_lr=0.1,
    )
    trainer = LinkPredictionTrainer(
        model, NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0)
    trainer.train(2)
    all_edges = np.concatenate([train, valid, test])
    ev = LinkPredictionEvaluator(
        model, NUM_NODES, NUM_RELS, test,
        all_edges=all_edges, batch_size=50, filtered=True)
    res_dev = ev.evaluate(trainer.state)
    host = np.asarray(trainer.state.table.values)
    res_host = ev.evaluate_from_host_table(
        host, trainer.state.params, edge_slice=32, node_tile=16)
    assert abs(res_dev["mrr"] - res_host["mrr"]) < 1e-5


def test_all_cap_truncation_warning():
    """Hubs above all_cap_limit must trigger a loud warning with the
    truncated-node count and neighbor-mass fraction (never silent)."""
    import logging
    from marius_tpu.data.samplers.neighbor import (
        resolve_all_caps_from_edges)

    class _Capture(logging.Handler):
        def __init__(self):
            super().__init__(logging.WARNING)
            self.records = []

        def emit(self, record):
            self.records.append(record)

    # own handler: get_logger() elsewhere may disable propagation, which
    # would make pytest's caplog order-dependent
    log = logging.getLogger("marius_tpu")
    cap = _Capture()
    log.addHandler(cap)
    old_level = log.level
    log.setLevel(logging.WARNING)
    try:
        # star graph: node 0 has 100 outgoing edges, cap at 10
        edges = np.stack([np.zeros(100, np.int32),
                          np.zeros(100, np.int32),
                          np.arange(1, 101, dtype=np.int32)], axis=1)
        cfgs = [NeighborSamplingConfig("ALL")]
        out = resolve_all_caps_from_edges(cfgs, edges, 101, cap_limit=10)
        assert out[0].max_neighbors == 10
        assert any("uniformly truncated" in r.getMessage()
                   for r in cap.records), cap.records
        # under the cap: no warning
        cap.records.clear()
        resolve_all_caps_from_edges(cfgs, edges, 101, cap_limit=128)
        assert not cap.records
    finally:
        log.removeHandler(cap)
        log.setLevel(old_level)


def test_full_graph_eval_matches_sampled_all():
    """LP evaluation with an exact-ALL full-graph encode (one pass over all
    nodes) must reproduce sampled-ALL evaluation (cap >= max degree) — same
    encoder math, no frontier machinery, no cap truncation."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    train, valid, test = generate_random_lp_dataset()
    graph = build_device_graph(train, NUM_NODES, NUM_RELS)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr_all = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)]
    trainer = LinkPredictionTrainer(
        _gnn_lp_model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0, graph=graph, nbr_configs=nbr_all)
    trainer.train(2)

    all_edges = np.concatenate([train, valid, test])
    kw = dict(all_edges=all_edges, batch_size=100, filtered=True,
              graph=graph, nbr_configs=nbr_all)
    ev_sampled = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, train[:100], **kw)
    ev_fg = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, train[:100],
        full_graph=build_full_graph_adjacency(train, NUM_NODES), **kw)
    a = ev_sampled.evaluate(trainer.state)
    b = ev_fg.evaluate(trainer.state)
    assert abs(a["mrr"] - b["mrr"]) < 1e-4, (a["mrr"], b["mrr"])
    assert abs(a["hits@10"] - b["hits@10"]) < 1e-6


@pytest.mark.slow
def test_full_graph_eval_rgcn_matches_sampled_all():
    """Same full-graph-vs-sampled-ALL eval parity with an RGCN encoder
    (relation-bucketed full-graph path, data/full_graph_rel.py)."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    encoder = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=DIM),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=DIM,
                     output_dim=DIM, bias=True, num_relations=NUM_RELS),),
    ))
    model = Model(
        learning_task="LINK_PREDICTION", encoder=encoder,
        decoder=EdgeDecoder("DISTMULT", NUM_RELS, DIM),
        loss_type="SOFTMAX_CE", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.05),
        sparse_lr=0.1)

    train, valid, test = generate_random_lp_dataset()
    graph = build_device_graph(train, NUM_NODES, NUM_RELS)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr_all = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)]
    trainer = LinkPredictionTrainer(
        model, NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0, graph=graph, nbr_configs=nbr_all)
    trainer.train(2)

    all_edges = np.concatenate([train, valid, test])
    kw = dict(all_edges=all_edges, batch_size=100, filtered=True,
              graph=graph, nbr_configs=nbr_all)
    ev_sampled = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, train[:100], **kw)
    ev_fg = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, train[:100],
        full_graph=build_full_graph_adjacency(
            train, NUM_NODES, with_relations=True), **kw)
    a = ev_sampled.evaluate(trainer.state)
    b = ev_fg.evaluate(trainer.state)
    assert abs(a["mrr"] - b["mrr"]) < 1e-4, (a["mrr"], b["mrr"])
    assert abs(a["hits@10"] - b["hits@10"]) < 1e-6


def test_shallow_feature_lp_trains_and_evaluates():
    """Shallow FEATURE encoders without GNN stages (the reference's
    distmult_feat family, test configs lp/model/distmult_feat.yaml): both
    EMBEDDING+FEATURE concat and pure-FEATURE variants must train and
    evaluate. Regression for the gap where the general batch step only
    gathered features under a GNN encoder."""
    train, valid, test = generate_random_lp_dataset(3)
    rng = np.random.default_rng(3)
    f = 6
    feats = rng.standard_normal((NUM_NODES, f)).astype(np.float32)
    all_edges = np.concatenate([train, valid, test])

    for stages, dec_dim in (
        ((  # EMBEDDING + FEATURE concat
            (LayerConfig(layer_type="EMBEDDING", output_dim=8),
             LayerConfig(layer_type="FEATURE", output_dim=f)),
        ), 8 + f),
        ((  # pure FEATURE (no learnable table)
            (LayerConfig(layer_type="FEATURE", output_dim=f),),
        ), f),
    ):
        model = Model(
            "LINK_PREDICTION",
            EncoderConfig(stages=stages),
            EdgeDecoder("DISTMULT", NUM_RELS, dec_dim))
        trainer = LinkPredictionTrainer(
            model, NUM_NODES, NUM_RELS, train,
            NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
            batch_size=100, seed=0, features=feats)
        stats = trainer.train(3)
        losses = [s["loss"] for s in stats]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        ev = LinkPredictionEvaluator(
            model, NUM_NODES, NUM_RELS, test, all_edges=all_edges,
            batch_size=100, filtered=True, features=trainer.features)
        m = ev.evaluate(trainer.state)
        assert 0.0 < m["mrr"] <= 1.0
