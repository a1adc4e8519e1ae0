"""Pinned accuracy regressions on deterministic synthetic datasets.

The reference's published numbers (FB15K-237 filtered MRR 0.2553 @10 epochs,
ogbn-arxiv 68.08% — BASELINE.md; docs/examples/config/lp_fb15k237.rst:223,
nc_ogbn_arxiv.rst:266) require downloading the real datasets, which this
environment cannot (zero egress). These tests are the committed evidence
that the training/eval math reaches pinned, non-trivial metric values on
datasets with known learnable structure — two-sided bands, so silent
degradation OR suspicious inflation both fail. BASELINE.md records exactly
which claims are and are not covered by this.

LP: a DistMult-REALIZABLE knowledge graph — edges are the top-k scoring
pairs under a random ground-truth factorization, so held-out edges are
recoverable only by learning the factor structure (not by memorization).
NC: the community graph of test_nc_e2e (intra-class edges + noisy label
features), fully learnable by 2-layer GraphSAGE.
"""

import numpy as np
import pytest

from marius_tpu.config.schema import NegativeSamplingConfig
from marius_tpu.data.graph import build_device_graph
from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.nc import NodeClassificationEvaluator, NodeClassificationTrainer
from marius_tpu.train.trainer import LinkPredictionTrainer

from tests.test_nc_e2e import NUM_NODES as NC_NODES
from tests.test_nc_e2e import _gs_model, community_graph

pytestmark = pytest.mark.slow  # see pyproject [tool.pytest.ini_options]


def make_realizable_kg(n=500, d=8, r=10, per=4, seed=0):
    """Edges = top-``per`` DistMult scores per (node, relation) under a
    random ground-truth factorization: exactly representable, so test MRR
    measures structure recovery, not chance."""
    rng = np.random.default_rng(seed)
    E = rng.normal(0, 1, (n, d))
    R = rng.normal(0, 1, (r, d))
    edges = []
    for rel in range(r):
        scores = (E * R[rel]) @ E.T
        np.fill_diagonal(scores, -np.inf)
        top = np.argsort(-scores, axis=1)[:, :per]
        for u in range(n):
            for v in top[u]:
                edges.append((u, rel, v))
    edges = np.array(edges, np.int32)
    rng.shuffle(edges)
    return edges


def test_lp_distmult_pinned_mrr():
    """DistMult on the realizable KG: filtered test MRR pinned at
    0.391 ± band (measured 2026-08; CPU float32, seed 0)."""
    edges = make_realizable_kg()
    tr, va = int(0.9 * len(edges)), int(0.95 * len(edges))
    train, test = edges[:tr], edges[va:]

    model = Model(
        LINK_PREDICTION,
        EncoderConfig(stages=(
            (LayerConfig(layer_type="EMBEDDING", output_dim=32),),)),
        EdgeDecoder("DISTMULT", num_relations=10, embedding_dim=32),
        loss_type="SOFTMAX_CE", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAGRAD", learning_rate=0.1),
        sparse_lr=0.1)
    neg = NegativeSamplingConfig(num_chunks=4, negatives_per_positive=128)
    trainer = LinkPredictionTrainer(model, 500, 10, train, neg,
                                    batch_size=500, seed=0)
    for _ in range(60):
        trainer.train_epoch()
    ev = LinkPredictionEvaluator(model, 500, 10, test, all_edges=edges,
                                 batch_size=500, filtered=True)
    res = ev.evaluate(trainer.state)
    assert 0.34 <= res["mrr"] <= 0.45, \
        f"filtered MRR {res['mrr']:.4f} outside pinned band [0.34, 0.45]"
    assert res["hits@10"] >= 0.60, f"hits@10 {res['hits@10']:.4f} < 0.60"


def make_complex_kg(n=500, d2=8, r=10, per=4, seed=0):
    """Edges = top-``per`` ComplEx scores per (node, relation) under a random
    complex ground-truth factorization (Re<e_s, w_r, conj(e_o)>) — exactly
    representable by the COMPLEX decoder (complex.cpp semantics)."""
    rng = np.random.default_rng(seed)
    e_re, e_im = rng.normal(0, 1, (n, d2)), rng.normal(0, 1, (n, d2))
    r_re, r_im = rng.normal(0, 1, (r, d2)), rng.normal(0, 1, (r, d2))
    edges = []
    for rel in range(r):
        s_re = e_re * r_re[rel] - e_im * r_im[rel]
        s_im = e_re * r_im[rel] + e_im * r_re[rel]
        scores = s_re @ e_re.T + s_im @ e_im.T
        np.fill_diagonal(scores, -np.inf)
        top = np.argsort(-scores, 1)[:, :per]
        for u in range(n):
            for v in top[u]:
                edges.append((u, rel, v))
    edges = np.array(edges, np.int32)
    rng.shuffle(edges)
    return edges


def make_transe_kg(n=500, d=16, r=10, per=4, seed=1):
    """Edges = the ``per`` nearest neighbors of e_u + t_rel under L2 — exactly
    representable by the TRANSE decoder (transe.cpp Translation + L2)."""
    rng = np.random.default_rng(seed)
    e = rng.normal(0, 1, (n, d))
    t = rng.normal(0, 0.3, (r, d))
    edges = []
    for rel in range(r):
        dist = np.linalg.norm((e[:, None, :] + t[rel]) - e[None, :, :], axis=2)
        np.fill_diagonal(dist, np.inf)
        top = np.argsort(dist, 1)[:, :per]
        for u in range(n):
            for v in top[u]:
                edges.append((u, rel, v))
    edges = np.array(edges, np.int32)
    rng.shuffle(edges)
    return edges


def _run_lp(edges, decoder_type, dim, epochs=60, n=500, r=10):
    tr, va = int(0.9 * len(edges)), int(0.95 * len(edges))
    train, test = edges[:tr], edges[va:]
    model = Model(
        LINK_PREDICTION,
        EncoderConfig(stages=(
            (LayerConfig(layer_type="EMBEDDING", output_dim=dim),),)),
        EdgeDecoder(decoder_type, num_relations=r, embedding_dim=dim),
        loss_type="SOFTMAX_CE", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAGRAD", learning_rate=0.1),
        sparse_lr=0.1)
    neg = NegativeSamplingConfig(num_chunks=4, negatives_per_positive=128)
    trainer = LinkPredictionTrainer(model, n, r, train, neg,
                                    batch_size=500, seed=0)
    for _ in range(epochs):
        trainer.train_epoch()
    ev = LinkPredictionEvaluator(model, n, r, test, all_edges=edges,
                                 batch_size=500, filtered=True)
    return ev.evaluate(trainer.state)


def test_lp_complex_pinned_mrr():
    """ComplEx on its realizable KG: filtered test MRR pinned at 0.288 ± band
    (measured 2026-08; CPU float32, seed 0). Chance MRR over 500 nodes is
    ~0.013 — two-sided band catches degradation AND inflation."""
    res = _run_lp(make_complex_kg(), "COMPLEX", dim=32)
    assert 0.23 <= res["mrr"] <= 0.35, \
        f"filtered MRR {res['mrr']:.4f} outside pinned band [0.23, 0.35]"
    assert res["hits@10"] >= 0.45, f"hits@10 {res['hits@10']:.4f} < 0.45"


def test_lp_transe_pinned_mrr():
    """TransE on its realizable KG: filtered test MRR pinned at 0.203 ± band
    (measured 2026-08; CPU float32, seed 0)."""
    res = _run_lp(make_transe_kg(), "TRANSE", dim=16)
    assert 0.15 <= res["mrr"] <= 0.27, \
        f"filtered MRR {res['mrr']:.4f} outside pinned band [0.15, 0.27]"
    assert res["hits@10"] >= 0.28, f"hits@10 {res['hits@10']:.4f} < 0.28"


def test_nc_gat_pinned_accuracy():
    """2-layer GAT on the community graph: test accuracy pinned at 1.00
    (measured 2026-08; the graph is fully separable)."""
    from marius_tpu.nn.model import Model as _Model

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(NC_NODES)
    graph = build_device_graph(edges, NC_NODES)
    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=8),),
        (LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=8,
                     output_dim=16, bias=True, num_heads=2,
                     activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=16,
                     output_dim=4, bias=True, num_heads=2),),
    )
    model = _Model(learning_task="NODE_CLASSIFICATION",
                   encoder=EncoderConfig(stages=stages), decoder=None,
                   loss_type="CROSS_ENTROPY", loss_reduction="SUM",
                   dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    nbr = [NeighborSamplingConfig("UNIFORM", max_neighbors=8)] * 2
    trainer = NodeClassificationTrainer(
        model, graph, feats, labels, perm[:300], nbr, batch_size=100, seed=0)
    trainer.train(30)
    res = NodeClassificationEvaluator(trainer, perm[300:]).evaluate(
        trainer.state)
    assert res["accuracy"] >= 0.95, \
        f"GAT accuracy {res['accuracy']:.4f} below pinned 0.95"


def test_nc_rgcn_pinned_accuracy():
    """2-layer RGCN on a relationally-structured synthetic (relation r
    connects class c to class (c+r) mod C, features only weakly label-
    informative): accuracy pinned at 0.85 ± band (measured 2026-08) — the
    relational structure must be exploited to clear 0.72."""
    from marius_tpu.nn.model import Model as _Model

    rng = np.random.default_rng(2)
    n, c, r, f = 400, 4, 3, 8
    labels = rng.integers(0, c, n).astype(np.int32)
    edges = []
    for _ in range(n * 8):
        u = rng.integers(0, n)
        rel = rng.integers(0, r)
        cand = np.flatnonzero(labels == (labels[u] + rel) % c)
        edges.append((u, rel, cand[rng.integers(len(cand))]))
    edges = np.unique(np.array(edges, np.int32), axis=0)
    feats = rng.normal(0, 1.0, (n, f)).astype(np.float32)
    feats[np.arange(n), labels % f] += 0.5
    graph = build_device_graph(edges, n, num_relations=r)
    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=f,
                     output_dim=16, bias=True, num_relations=r,
                     activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=16,
                     output_dim=c, bias=True, num_relations=r),),
    )
    model = _Model(learning_task="NODE_CLASSIFICATION",
                   encoder=EncoderConfig(stages=stages), decoder=None,
                   loss_type="CROSS_ENTROPY", loss_reduction="SUM",
                   dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    nbr = [NeighborSamplingConfig("UNIFORM", max_neighbors=8)] * 2
    perm = rng.permutation(n)
    trainer = NodeClassificationTrainer(
        model, graph, feats, labels, perm[:300], nbr, batch_size=100, seed=0)
    trainer.train(30)
    res = NodeClassificationEvaluator(trainer, perm[300:]).evaluate(
        trainer.state)
    assert 0.72 <= res["accuracy"] <= 1.0, \
        f"RGCN accuracy {res['accuracy']:.4f} outside pinned band [0.72, 1.0]"


def test_nc_graphsage_pinned_accuracy():
    """2-layer GraphSAGE on the community graph: test accuracy pinned at
    1.00 (measured 2026-08; the graph is fully separable)."""
    edges, feats, labels = community_graph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(NC_NODES)
    graph = build_device_graph(edges, NC_NODES)
    nbr = [NeighborSamplingConfig("UNIFORM", max_neighbors=8)] * 2
    trainer = NodeClassificationTrainer(
        _gs_model(), graph, feats, labels, perm[:300], nbr,
        batch_size=100, seed=0)
    trainer.train(30)
    ev = NodeClassificationEvaluator(trainer, perm[300:])
    res = ev.evaluate(trainer.state)
    assert res["accuracy"] >= 0.95, \
        f"accuracy {res['accuracy']:.4f} below pinned 0.95"
