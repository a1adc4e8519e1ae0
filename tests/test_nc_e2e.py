"""End-to-end node classification on a synthetic community graph.

Mirrors the reference's e2e NC strategy (test_nc_basic.py with random graphs,
SURVEY §4) but on a graph with actual signal: communities with mostly
intra-community edges and noisy community features — a 2-layer GraphSAGE
should comfortably beat the feature-only baseline."""

import numpy as np
import pytest

from marius_tpu.data.graph import build_device_graph
from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.train.nc import NodeClassificationEvaluator, NodeClassificationTrainer

NUM_NODES = 400
NUM_CLASSES = 4
FEAT_DIM = 8


def community_graph(seed=0, intra=0.9):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, NUM_CLASSES, NUM_NODES).astype(np.int32)
    edges = []
    for _ in range(NUM_NODES * 8):
        u = rng.integers(0, NUM_NODES)
        if rng.random() < intra:
            same = np.flatnonzero(labels == labels[u])
            v = same[rng.integers(len(same))]
        else:
            v = rng.integers(0, NUM_NODES)
        edges.append((u, v))
    edges = np.unique(np.array(edges, np.int32), axis=0)
    # weak features: noisy one-hot of the label
    feats = rng.normal(0, 1.0, (NUM_NODES, FEAT_DIM)).astype(np.float32)
    feats[np.arange(NUM_NODES), labels] += 1.0
    return edges, feats, labels


def _gs_model(num_layers=2, hidden=16, feature_bias=False):
    stages = [(LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM,
                           bias=feature_bias),)]
    dims = [FEAT_DIM] + [hidden] * (num_layers - 1) + [NUM_CLASSES]
    for i in range(num_layers):
        stages.append((LayerConfig(
            layer_type="GNN", gnn_type="GRAPH_SAGE", aggregator="MEAN",
            input_dim=dims[i], output_dim=dims[i + 1], bias=True,
            activation="RELU" if i < num_layers - 1 else "NONE"),))
    return Model(
        learning_task="NODE_CLASSIFICATION",
        encoder=EncoderConfig(stages=tuple(stages)),
        decoder=None,
        loss_type="CROSS_ENTROPY",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01),
    )


def test_nc_graphsage_learns():
    edges, feats, labels = community_graph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(NUM_NODES)
    train_nodes, test_nodes = perm[:300], perm[300:]

    graph = build_device_graph(edges, NUM_NODES)
    nbr = [NeighborSamplingConfig("UNIFORM", max_neighbors=8)] * 2
    trainer = NodeClassificationTrainer(
        _gs_model(), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0)
    stats = trainer.train(30)
    assert stats[-1]["loss"] < stats[0]["loss"]

    ev = NodeClassificationEvaluator(trainer, test_nodes)
    res = ev.evaluate(trainer.state)
    assert res["num_evaluated"] == 100
    # 4 balanced classes -> chance 0.25; community graph + features is easy
    assert res["accuracy"] > 0.6, f"accuracy too low: {res['accuracy']}"


@pytest.mark.parametrize("gnn_type", ["GCN", "GAT", "RGCN"])
def test_nc_other_gnns_run(gnn_type):
    edges, feats, labels = community_graph()
    # RGCN consumes relation ids; give the graph a single relation column
    if gnn_type == "RGCN":
        edges = np.stack([edges[:, 0], np.zeros(len(edges), np.int32), edges[:, 1]], 1)
    graph = build_device_graph(edges, NUM_NODES,
                               num_relations=1 if gnn_type == "RGCN" else 0)
    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM),),
        (LayerConfig(layer_type="GNN", gnn_type=gnn_type,
                     input_dim=FEAT_DIM, output_dim=NUM_CLASSES, bias=True,
                     num_heads=2, num_relations=1),),
    )
    model = Model(
        learning_task="NODE_CLASSIFICATION",
        encoder=EncoderConfig(stages=stages), decoder=None,
        loss_type="CROSS_ENTROPY", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    trainer = NodeClassificationTrainer(
        model, graph, feats, labels, np.arange(200, dtype=np.int32),
        [NeighborSamplingConfig("UNIFORM", max_neighbors=5)],
        batch_size=50, seed=0)
    stats = trainer.train(2)
    assert np.isfinite(stats[-1]["loss"])
    assert stats[-1]["loss"] < stats[0]["loss"] * 1.5  # not diverging wildly


def test_nc_all_sampling_exact_below_cap():
    """ALL mode with a cap >= max degree gives every neighbor exactly once."""
    edges, feats, labels = community_graph()
    graph = build_device_graph(edges, NUM_NODES)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)]
    trainer = NodeClassificationTrainer(
        _gs_model(num_layers=1), graph, feats, labels,
        np.arange(100, dtype=np.int32), nbr, batch_size=50, seed=0)
    stats = trainer.train(1)
    assert np.isfinite(stats[0]["loss"])


@pytest.mark.slow
def test_full_graph_matches_sampled_all():
    """Full-graph ALL mode is bit-equal (up to summation order) to sampled
    ALL with a cap covering the max degree: same losses, same accuracy."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(NUM_NODES)
    train_nodes, test_nodes = perm[:300], perm[300:]
    graph = build_device_graph(edges, NUM_NODES)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)] * 2

    sampled = NodeClassificationTrainer(
        _gs_model(), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0)
    fg_adj = build_full_graph_adjacency(edges, NUM_NODES)
    assert fg_adj is not None
    full = NodeClassificationTrainer(
        _gs_model(), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0, full_graph=fg_adj)

    s_stats = sampled.train(3)
    f_stats = full.train(3)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0), \
            f"loss diverged: sampled {s['loss']} vs full-graph {f['loss']}"

    ev_s = NodeClassificationEvaluator(sampled, test_nodes)
    ev_f = NodeClassificationEvaluator(full, test_nodes)
    a, b = ev_s.evaluate(sampled.state), ev_f.evaluate(full.state)
    assert abs(a["accuracy"] - b["accuracy"]) < 1e-6
    pl_s = ev_s.predict_labels(sampled.state)
    pl_f = ev_f.predict_labels(full.state)
    assert pl_s.shape == pl_f.shape == (100,)
    assert (pl_s == pl_f).mean() > 0.99


def _linear_model(kinds=("sage_mean", "sage_mean"), hidden=16,
                  feature_bias=True):
    """Activation-free encoder (the reference arxiv shape — its default
    activation is NONE): eligible for the exact linear collapse."""
    stages = [(LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM,
                           bias=feature_bias),)]
    dims = [FEAT_DIM] + [hidden] * (len(kinds) - 1) + [NUM_CLASSES]
    for i, kind in enumerate(kinds):
        if kind == "gcn":
            cfg = LayerConfig(layer_type="GNN", gnn_type="GCN",
                              input_dim=dims[i], output_dim=dims[i + 1],
                              bias=True)
        else:
            cfg = LayerConfig(
                layer_type="GNN", gnn_type="GRAPH_SAGE",
                aggregator="GCN" if kind == "sage_gcn" else "MEAN",
                input_dim=dims[i], output_dim=dims[i + 1], bias=True)
        stages.append((cfg,))
    return Model(
        learning_task="NODE_CLASSIFICATION",
        encoder=EncoderConfig(stages=tuple(stages)), decoder=None,
        loss_type="CROSS_ENTROPY", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))


@pytest.mark.parametrize("kinds", [
    ("sage_mean", "sage_mean", "sage_mean"),
    ("sage_gcn", "sage_mean"),
    ("gcn", "gcn"),
])
@pytest.mark.slow
def test_linear_collapse_matches_general(kinds):
    """The exact collapsed form (nn/linear_collapse.py) reproduces the
    general full-graph path: same losses, same predictions, gradients flow
    through the same parametrization."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(NUM_NODES)
    train_nodes, test_nodes = perm[:300], perm[300:]
    graph = build_device_graph(edges, NUM_NODES)
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=1)] * len(kinds)
    adj = build_full_graph_adjacency(edges, NUM_NODES)

    col = NodeClassificationTrainer(
        _linear_model(kinds), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0, full_graph=adj, fg_linear_collapse=True)
    assert col._fg_collapse is not None
    gen = NodeClassificationTrainer(
        _linear_model(kinds), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0, full_graph=adj, fg_linear_collapse=False)
    assert gen._fg_collapse is None

    c_stats = col.train(3)
    g_stats = gen.train(3)
    for c, g in zip(c_stats, g_stats):
        assert abs(c["loss"] - g["loss"]) < 1e-2 * max(abs(g["loss"]), 1.0), \
            f"loss diverged: collapse {c['loss']} vs general {g['loss']}"

    ev_c = NodeClassificationEvaluator(col, test_nodes)
    ev_g = NodeClassificationEvaluator(gen, test_nodes)
    a = ev_c.evaluate(col.state)
    b = ev_g.evaluate(gen.state)
    assert abs(a["accuracy"] - b["accuracy"]) < 0.03
    pl_c = np.asarray(ev_c.predict_labels(col.state))
    pl_g = np.asarray(ev_g.predict_labels(gen.state))
    assert (pl_c == pl_g).mean() > 0.97


def test_linear_collapse_auto_and_ineligible():
    """Collapse auto-enables for activation-free feature encoders and stays
    off for RELU encoders (which must keep the general gather path)."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency
    from marius_tpu.nn.linear_collapse import linear_collapse_eligible

    edges, feats, labels = community_graph()
    graph = build_device_graph(edges, NUM_NODES)
    adj = build_full_graph_adjacency(edges, NUM_NODES)
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=1)] * 2

    assert linear_collapse_eligible(_linear_model().encoder, True)
    assert not linear_collapse_eligible(_gs_model().encoder, True)

    auto = NodeClassificationTrainer(
        _linear_model(), graph, feats, labels,
        np.arange(200, dtype=np.int32), nbr, batch_size=50, seed=0,
        full_graph=adj)
    assert auto._fg_collapse is not None
    stats = auto.train(2)
    assert np.isfinite(stats[-1]["loss"])

    relu = NodeClassificationTrainer(
        _gs_model(), graph, feats, labels,
        np.arange(200, dtype=np.int32), nbr, batch_size=50, seed=0,
        full_graph=adj)
    assert relu._fg_collapse is None


def test_nbr_sum_sorted_space_matches():
    """make_nbr_sums(sorted_space=True) over degree-sorted rows equals the
    original-order operator after un-permutation (the relabeled operator is
    P A P^T, still symmetric — data/full_graph.py)."""
    import jax
    import jax.numpy as jnp

    from marius_tpu.data.full_graph import (
        build_full_graph_adjacency,
        make_nbr_sums,
    )

    rng = np.random.default_rng(3)
    n, e = 97, 500
    edges = rng.integers(0, n, (e, 2)).astype(np.int32)
    adj = build_full_graph_adjacency(edges, n)
    x = rng.standard_normal((n, 16)).astype(np.float32)

    y_orig = np.asarray(make_nbr_sums(adj)(jnp.asarray(x)))
    inv_pos = np.asarray(adj.inv_pos)
    perm = np.argsort(inv_pos, kind="stable")
    y_sorted = np.asarray(
        make_nbr_sums(adj, sorted_space=True)(jnp.asarray(x[perm])))
    np.testing.assert_allclose(y_sorted[inv_pos], y_orig, rtol=1e-6)

    # vjp stays the same gather-sum (symmetry preserved under relabeling)
    f = make_nbr_sums(adj, sorted_space=True)
    u = rng.standard_normal((n, 16)).astype(np.float32)
    _, vjp = jax.vjp(f, jnp.asarray(x[perm]))
    g = np.asarray(vjp(jnp.asarray(u[perm]))[0])
    _, vjp_o = jax.vjp(make_nbr_sums(adj), jnp.asarray(x))
    g_o = np.asarray(vjp_o(jnp.asarray(u))[0])
    np.testing.assert_allclose(g[inv_pos], g_o, rtol=1e-6)


def test_full_graph_locality_reorder_matches():
    """RCM locality relabeling is internal to the gather source: same
    losses, same predictions as the unreordered adjacency; the seed flat
    CSR still emits ORIGINAL ids."""
    from marius_tpu.data.full_graph import (
        build_full_graph_adjacency,
        host_csr_from_adjacency,
    )

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(NUM_NODES)
    train_nodes, test_nodes = perm[:300], perm[300:]
    graph = build_device_graph(edges, NUM_NODES)

    adj_p = build_full_graph_adjacency(edges, NUM_NODES)
    adj_l = build_full_graph_adjacency(edges, NUM_NODES,
                                       locality_reorder=True)
    assert adj_l.loc_perm is not None

    # the CSR views agree exactly (original ids, per-node multisets)
    off_p, nb_p = host_csr_from_adjacency(adj_p)
    off_l, nb_l = host_csr_from_adjacency(adj_l)
    np.testing.assert_array_equal(off_p, off_l)
    for i in range(NUM_NODES):
        np.testing.assert_array_equal(np.sort(nb_p[off_p[i]:off_p[i + 1]]),
                                      np.sort(nb_l[off_l[i]:off_l[i + 1]]))

    losses = {}
    accs = {}
    for name, adj in (("plain", adj_p), ("locality", adj_l)):
        tr = NodeClassificationTrainer(
            _gs_model(), graph, feats, labels, train_nodes, [],
            batch_size=100, seed=0, full_graph=adj)
        losses[name] = [s["loss"] for s in tr.train(3)]
        ev = NodeClassificationEvaluator(tr, test_nodes)
        accs[name] = ev.evaluate(tr.state)["accuracy"]
    np.testing.assert_allclose(losses["plain"], losses["locality"],
                               rtol=2e-5)
    assert abs(accs["plain"] - accs["locality"]) < 1e-6


def test_full_graph_gcn_with_embeddings():
    """Full-graph mode with a GCN stage and a learnable embedding table:
    trains, matches the sampled-ALL trajectory (dense-accum Adagrad twin)."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency
    from marius_tpu.nn.optimizers import OptimizerConfig

    edges, feats, labels = community_graph()
    graph = build_device_graph(edges, NUM_NODES)
    max_deg = int(np.asarray(graph.degrees).max())
    emb_dim = 8
    stages = (
        (LayerConfig(layer_type="EMBEDDING", output_dim=emb_dim),),
        (LayerConfig(layer_type="GNN", gnn_type="GCN",
                     input_dim=emb_dim, output_dim=NUM_CLASSES, bias=True),),
    )
    def mk():
        return Model(
            learning_task="NODE_CLASSIFICATION",
            encoder=EncoderConfig(stages=stages), decoder=None,
            loss_type="CROSS_ENTROPY", loss_reduction="SUM",
            dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01),
            sparse_lr=0.1)

    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)]
    train_nodes = np.arange(200, dtype=np.int32)
    sampled = NodeClassificationTrainer(
        mk(), graph, None, labels, train_nodes, nbr, batch_size=50, seed=0)
    full = NodeClassificationTrainer(
        mk(), graph, None, labels, train_nodes, nbr, batch_size=50, seed=0,
        full_graph=build_full_graph_adjacency(edges, NUM_NODES))
    s_stats = sampled.train(3)
    f_stats = full.train(3)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0), \
            f"loss diverged: sampled {s['loss']} vs full-graph {f['loss']}"
    tv_s = np.asarray(sampled.state.table.values)
    tv_f = np.asarray(full.state.table.values)
    np.testing.assert_allclose(tv_s, tv_f, rtol=1e-3, atol=1e-4)


def test_manager_auto_full_graph(tmp_path):
    """ALL-everywhere config with a GraphSAGE encoder auto-enables the
    full-graph path in marius_init; training and eval run through it."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_nc

    ds_dir = str(tmp_path / "ds_nc_fg")
    generate_random_dataset_nc(ds_dir, num_nodes=60, num_edges=600,
                               num_classes=4, feature_dim=8)
    raw = {
        "model": {
            "learning_task": "NODE_CLASSIFICATION",
            "encoder": {
                "layers": [
                    [{"type": "FEATURE", "output_dim": 8}],
                    [{"type": "GNN", "input_dim": 8, "output_dim": 4,
                      "options": {"type": "GRAPH_SAGE", "aggregator": "MEAN"}}],
                ],
                "train_neighbor_sampling": [{"type": "ALL"}],
            },
            "loss": {"type": "CROSS_ENTROPY", "options": {"reduction": "SUM"}},
            "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.01}},
        },
        "storage": {"dataset": {"dataset_dir": ds_dir}, "save_model": False},
        "training": {"batch_size": 30, "num_epochs": 2},
        "evaluation": {"batch_size": 30},
    }
    result = marius_train(load_config(raw))
    assert result["runtime"].trainer.full_graph is not None
    assert len(result["epochs"]) == 2
    assert 0.0 <= result["test"]["accuracy"] <= 1.0


def test_manager_rgcn_full_graph(tmp_path):
    """ALL-everywhere RGCN config: marius_init builds the adjacency WITH its
    relational companion (with_relations wiring) and trains through the
    relation-bucketed full-graph path."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_nc

    ds_dir = str(tmp_path / "ds_nc_rgcn_fg")
    generate_random_dataset_nc(ds_dir, num_nodes=60, num_edges=600,
                               num_classes=4, feature_dim=8)
    raw = {
        "model": {
            "learning_task": "NODE_CLASSIFICATION",
            "encoder": {
                "layers": [
                    [{"type": "FEATURE", "output_dim": 8}],
                    [{"type": "GNN", "input_dim": 8, "output_dim": 4,
                      "options": {"type": "RGCN"}}],
                ],
                "train_neighbor_sampling": [{"type": "ALL"}],
                "full_graph": "ON",
            },
            "loss": {"type": "CROSS_ENTROPY", "options": {"reduction": "SUM"}},
            "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.01}},
        },
        "storage": {"dataset": {"dataset_dir": ds_dir}, "save_model": False},
        "training": {"batch_size": 30, "num_epochs": 2},
        "evaluation": {"batch_size": 30},
    }
    result = marius_train(load_config(raw))
    tr = result["runtime"].trainer
    assert tr.full_graph is not None and tr.full_graph.rel is not None
    assert len(result["epochs"]) == 2
    assert 0.0 <= result["test"]["accuracy"] <= 1.0


def test_encode_and_export_full_graph_exact(tmp_path):
    """encode_and_export on a full-graph trainer must ride the exact-ALL
    path: the trainer's nbr_configs stay UNRESOLVED in full-graph mode, so
    the sampled fallback would silently truncate hubs at the default cap."""
    import numpy as np

    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import encode_and_export, marius_init
    from marius_tpu.nn.full_graph_encoder import full_graph_encoder_forward
    from marius_tpu.tools.preprocess import generate_random_dataset_nc

    ds_dir = str(tmp_path / "ds_nc_exp")
    generate_random_dataset_nc(ds_dir, num_nodes=60, num_edges=1200,
                               num_classes=4, feature_dim=8)
    raw = {
        "model": {
            "learning_task": "NODE_CLASSIFICATION",
            "encoder": {
                "layers": [
                    [{"type": "FEATURE", "output_dim": 8}],
                    [{"type": "GNN", "input_dim": 8, "output_dim": 4,
                      "options": {"type": "GRAPH_SAGE", "aggregator": "MEAN"}}],
                ],
                "train_neighbor_sampling": [{"type": "ALL"}],
                "full_graph": "ON",
            },
            "loss": {"type": "CROSS_ENTROPY", "options": {"reduction": "SUM"}},
            "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.01}},
        },
        "storage": {"dataset": {"dataset_dir": ds_dir}, "save_model": False},
        "training": {"batch_size": 30, "num_epochs": 1},
        "evaluation": {"batch_size": 30},
    }
    rt = marius_init(load_config(raw))
    rt.trainer.train_epoch()
    enc = encode_and_export(rt, path=None)
    tr = rt.trainer
    exact = np.asarray(full_graph_encoder_forward(
        tr.model.encoder, tr.state.params["encoder"], None,
        tr.features[:-1], tr.full_graph, ops=tr._fg_ops))
    np.testing.assert_allclose(enc, exact, rtol=1e-6, atol=1e-6)


def test_nc_eval_batch_size_differs_from_train():
    """Regression: evaluator hop caps must follow ITS batch size, not the
    trainer's (undersized caps silently truncate hop sets)."""
    import numpy as np
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import Model, NODE_CLASSIFICATION
    from marius_tpu.train.nc import (
        NodeClassificationEvaluator,
        NodeClassificationTrainer,
    )

    rng = np.random.default_rng(0)
    n, classes, fd = 200, 4, 8
    labels = rng.integers(0, classes, n).astype(np.int32)
    feats = (np.eye(classes, fd)[labels]
             + 0.1 * rng.standard_normal((n, fd))).astype(np.float32)
    edges = np.stack([rng.integers(0, n, 2000),
                      rng.integers(0, n, 2000)], 1).astype(np.int32)
    graph = build_device_graph(edges, n)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=fd),),
        (LayerConfig(layer_type="GNN", input_dim=fd, output_dim=classes,
                     gnn_type="GRAPH_SAGE", aggregator="MEAN"),),
    ))
    model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY")
    tr = NodeClassificationTrainer(
        model, graph, feats, labels, np.arange(150, dtype=np.int32),
        [NeighborSamplingConfig(max_neighbors=4)], batch_size=25)
    tr.train(3)
    small = NodeClassificationEvaluator(tr, np.arange(150, 200, dtype=np.int32),
                                        batch_size=25)
    big = NodeClassificationEvaluator(tr, np.arange(150, 200, dtype=np.int32),
                                      batch_size=50)
    assert big.hop_caps[0] == 50 and small.hop_caps[0] == 25
    a, b = small.evaluate(tr.state), big.evaluate(tr.state)
    # same nodes, same model: accuracy must agree closely despite sampling RNG
    assert abs(a["accuracy"] - b["accuracy"]) < 0.25


def test_full_graph_hub_degrees():
    """Degree bucketing keeps full-graph exact on power-law graphs: a hub
    with degree far above everyone else costs one small bucket, and results
    still match sampled-ALL with a covering cap."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    rng = np.random.default_rng(7)
    n = 600
    labels = rng.integers(0, NUM_CLASSES, n).astype(np.int32)
    feats = rng.normal(0, 1, (n, FEAT_DIM)).astype(np.float32)
    feats[np.arange(n), labels] += 1.0
    # everyone connects to node 0 (hub degree ~n) + sparse random edges
    e_hub = np.stack([np.arange(1, n), np.zeros(n - 1, np.int64)], 1)
    e_rand = rng.integers(0, n, (2 * n, 2))
    edges = np.unique(np.concatenate([e_hub, e_rand]).astype(np.int32), axis=0)

    graph = build_device_graph(edges, n)
    max_deg = int(np.asarray(graph.degrees).max())
    assert max_deg > 500
    adj = build_full_graph_adjacency(edges, n)
    # bucketed padding is ~2E slots, nowhere near n * max_deg
    assert adj.total_slots < 6 * len(edges)
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)]
    train_nodes = np.arange(300, dtype=np.int32)
    sampled = NodeClassificationTrainer(
        _gs_model(num_layers=1), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0)
    full = NodeClassificationTrainer(
        _gs_model(num_layers=1), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0, full_graph=adj)
    s_stats = sampled.train(2)
    f_stats = full.train(2)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0)


@pytest.mark.parametrize("gnn_type", ["GRAPH_SAGE", "GCN", "GAT"])
@pytest.mark.slow
def test_full_graph_seed_restrict_matches_all_n(gnn_type):
    """The seed-restricted final stage (flat per-batch CSR segment ops) is
    the same math as computing the stage for all N nodes and slicing the
    seeds — trajectories must agree to float tolerance, and the seed path
    must be the one auto-selected."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(5)
    train_nodes = rng.permutation(NUM_NODES)[:300]
    graph = build_device_graph(edges, NUM_NODES)
    adj = build_full_graph_adjacency(edges, NUM_NODES)

    if gnn_type == "GRAPH_SAGE":
        mk = _gs_model
    else:
        def mk():
            stages = (
                (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM),),
                (LayerConfig(layer_type="GNN", gnn_type=gnn_type,
                             input_dim=FEAT_DIM, output_dim=16, num_heads=4,
                             average_heads=False, bias=True,
                             activation="RELU"),),
                (LayerConfig(layer_type="GNN", gnn_type=gnn_type,
                             input_dim=16, output_dim=NUM_CLASSES,
                             num_heads=2, average_heads=True, bias=True),),
            )
            return Model(
                learning_task="NODE_CLASSIFICATION",
                encoder=EncoderConfig(stages=stages), decoder=None,
                loss_type="CROSS_ENTROPY", loss_reduction="SUM",
                dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))

    nbr = [NeighborSamplingConfig("ALL")] * 2
    full = NodeClassificationTrainer(
        mk(), graph, feats, labels, train_nodes, nbr, batch_size=100, seed=0,
        full_graph=adj, fg_seed_restrict=False)
    restricted = NodeClassificationTrainer(
        mk(), graph, feats, labels, train_nodes, nbr, batch_size=100, seed=0,
        full_graph=adj)
    assert restricted._fg_seed_restrict and not full._fg_seed_restrict

    f_stats = full.train(3)
    r_stats = restricted.train(3)
    for f, r in zip(f_stats, r_stats):
        assert abs(f["loss"] - r["loss"]) < 5e-3 * max(abs(f["loss"]), 1.0), \
            f"loss diverged: all-N {f['loss']} vs seed-restricted {r['loss']}"


@pytest.mark.slow
def test_full_graph_gat_matches_sampled_all():
    """GAT in full-graph mode: per-bucket attention softmax + inverse-map
    backward must reproduce the sampled-ALL trajectory (softmax and weighted
    sums are order-invariant over the same slot multiset)."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(3)
    perm = rng.permutation(NUM_NODES)
    train_nodes, test_nodes = perm[:300], perm[300:]
    graph = build_device_graph(edges, NUM_NODES)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)] * 2

    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM),),
        (LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=FEAT_DIM,
                     output_dim=16, num_heads=4, average_heads=False,
                     bias=True, activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=16,
                     output_dim=NUM_CLASSES, num_heads=2, average_heads=True,
                     bias=True),),
    )

    def mk():
        return Model(
            learning_task="NODE_CLASSIFICATION",
            encoder=EncoderConfig(stages=stages), decoder=None,
            loss_type="CROSS_ENTROPY", loss_reduction="SUM",
            dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))

    sampled = NodeClassificationTrainer(
        mk(), graph, feats, labels, train_nodes, nbr, batch_size=100, seed=0)
    fg_adj = build_full_graph_adjacency(edges, NUM_NODES)
    full = NodeClassificationTrainer(
        mk(), graph, feats, labels, train_nodes, nbr, batch_size=100, seed=0,
        full_graph=fg_adj)
    assert full.full_graph.inv_map is not None  # GAT forces the inverse map

    s_stats = sampled.train(3)
    f_stats = full.train(3)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0), \
            f"loss diverged: sampled {s['loss']} vs full-graph {f['loss']}"

    ev_s = NodeClassificationEvaluator(sampled, test_nodes)
    ev_f = NodeClassificationEvaluator(full, test_nodes)
    a, b = ev_s.evaluate(sampled.state), ev_f.evaluate(full.state)
    assert abs(a["accuracy"] - b["accuracy"]) < 0.02


def test_full_graph_const_agg_with_feature_bias():
    """A trained FEATURE bias keeps the constant first-stage aggregation
    enabled (nbr_sum is linear in the bias: nbr_sum(x+b) = nbr_sum(x) +
    count*b — full_graph_encoder._const_first_agg affine entries). The
    trajectory must match sampled ALL exactly, and the bias must actually
    train (gradients flow through the affine term)."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(7)
    train_nodes = rng.permutation(NUM_NODES)[:300]
    graph = build_device_graph(edges, NUM_NODES)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)] * 2
    adj = build_full_graph_adjacency(edges, NUM_NODES)

    sampled = NodeClassificationTrainer(
        _gs_model(feature_bias=True), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0)
    full = NodeClassificationTrainer(
        _gs_model(feature_bias=True), graph, feats, labels, train_nodes, nbr,
        batch_size=100, seed=0, full_graph=adj)

    # the const path must be ACTIVE despite the bias, as an affine entry
    const = full._fg_ops["const_agg"]
    assert const, "bias FEATURE stage must not disable const_agg"
    from marius_tpu.nn.full_graph_encoder import AffineConst
    assert all(isinstance(v, AffineConst) for v in const.values())

    bias_before = np.asarray(full.state.params["encoder"][0][0]["bias"]).copy()
    s_stats = sampled.train(3)
    f_stats = full.train(3)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0), \
            f"loss diverged: sampled {s['loss']} vs full-graph {f['loss']}"
    bias_after = np.asarray(full.state.params["encoder"][0][0]["bias"])
    assert not np.allclose(bias_before, bias_after), \
        "FEATURE bias did not train through the affine const term"

    # GCN variant: the count vector differs (degree-scaled)
    gcn_stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM, bias=True),),
        (LayerConfig(layer_type="GNN", gnn_type="GCN", input_dim=FEAT_DIM,
                     output_dim=NUM_CLASSES, bias=True),),
    )
    gcn_model = Model(
        learning_task="NODE_CLASSIFICATION",
        encoder=EncoderConfig(stages=gcn_stages), decoder=None,
        loss_type="CROSS_ENTROPY", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    gcn_sampled = NodeClassificationTrainer(
        gcn_model, graph, feats, labels, train_nodes,
        [NeighborSamplingConfig("ALL", max_neighbors=max_deg)],
        batch_size=100, seed=0)
    gcn_full = NodeClassificationTrainer(
        gcn_model, graph, feats, labels, train_nodes,
        [NeighborSamplingConfig("ALL", max_neighbors=max_deg)],
        batch_size=100, seed=0, full_graph=adj,
        fg_linear_collapse=False)  # this test exercises const_agg internals
    assert gcn_full._fg_ops["const_agg"]
    s_stats = gcn_sampled.train(2)
    f_stats = gcn_full.train(2)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0)


def test_full_graph_bias_nonlinear_activation_disables_const():
    """FEATURE bias + nonlinear activation cannot be precomputed — the
    const map must be empty (correctness over speed), and training must
    still match sampled ALL."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency

    edges, feats, labels = community_graph()
    rng = np.random.default_rng(8)
    train_nodes = rng.permutation(NUM_NODES)[:200]
    graph = build_device_graph(edges, NUM_NODES)
    max_deg = int(np.asarray(graph.degrees).max())
    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM, bias=True,
                     activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE",
                     aggregator="MEAN", input_dim=FEAT_DIM,
                     output_dim=NUM_CLASSES, bias=True),),
    )
    model = Model(
        learning_task="NODE_CLASSIFICATION",
        encoder=EncoderConfig(stages=stages), decoder=None,
        loss_type="CROSS_ENTROPY", loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)]
    adj = build_full_graph_adjacency(edges, NUM_NODES)
    sampled = NodeClassificationTrainer(
        model, graph, feats, labels, train_nodes, nbr, batch_size=100, seed=0)
    full = NodeClassificationTrainer(
        model, graph, feats, labels, train_nodes, nbr, batch_size=100, seed=0,
        full_graph=adj)
    assert full._fg_ops["const_agg"] == {}
    s_stats = sampled.train(2)
    f_stats = full.train(2)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0)
