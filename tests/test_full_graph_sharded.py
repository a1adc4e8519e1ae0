"""Ring-sharded full-graph aggregation vs the single-device bucketed op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marius_tpu.parallel.mesh import NODE_AXIS, make_mesh

pytestmark = pytest.mark.slow  # see pyproject [tool.pytest.ini_options]

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def _graph(rng, n, e):
    return np.stack([rng.integers(0, n, e), rng.integers(0, n, e)],
                    1).astype(np.int32)


@needs8
@pytest.mark.parametrize("n,e,s", [(97, 600, 4), (256, 2000, 8), (40, 80, 8)])
def test_ring_nbr_sum_matches_bucketed(n, e, s):
    from marius_tpu.data.full_graph import (
        build_full_graph_adjacency,
        make_nbr_sums,
    )
    from marius_tpu.data.full_graph_sharded import (
        build_sharded_full_graph,
        make_nbr_sum_sharded,
        shard_rows,
    )

    rng = np.random.default_rng(n + e)
    edges = _graph(rng, n, e)
    x = rng.standard_normal((n, 16)).astype(np.float32)

    adj = build_full_graph_adjacency(edges, n)
    ref = jax.jit(make_nbr_sums(adj))(jnp.asarray(x))

    mesh = make_mesh(num_data=1, num_node=s,
                     devices=jax.devices()[:s])
    sg = build_sharded_full_graph(edges, n, s)
    x_sh = shard_rows(x, sg, mesh, NODE_AXIS)
    out = jax.jit(make_nbr_sum_sharded(sg, mesh, NODE_AXIS))(x_sh)
    got = np.asarray(out)[:n]
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-5, atol=2e-5)
    # padding rows stay zero
    np.testing.assert_array_equal(np.asarray(out)[n:], 0.0)


@needs8
def test_ring_nbr_sum_vjp_is_ring():
    """Symmetric operator: grad of sum(w * A x) wrt x equals A w."""
    from marius_tpu.data.full_graph_sharded import (
        build_sharded_full_graph,
        make_nbr_sum_sharded,
        shard_rows,
    )

    rng = np.random.default_rng(7)
    n, e, s = 64, 400, 4
    edges = _graph(rng, n, e)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    w = rng.standard_normal((n, 8)).astype(np.float32)

    mesh = make_mesh(num_data=1, num_node=s, devices=jax.devices()[:s])
    sg = build_sharded_full_graph(edges, n, s)
    nbr_sum = make_nbr_sum_sharded(sg, mesh, NODE_AXIS)
    x_sh = shard_rows(x, sg, mesh, NODE_AXIS)
    w_sh = shard_rows(w, sg, mesh, NODE_AXIS)

    g = jax.jit(jax.grad(lambda x: jnp.vdot(w_sh, nbr_sum(x))))(x_sh)
    want = jax.jit(nbr_sum)(w_sh)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # and against brute-force autodiff through a dense reference
    dense = np.zeros((n, n), np.float32)
    for a, b in edges[:, [0, -1]]:
        dense[b, a] += 1.0
        dense[a, b] += 1.0
    np.testing.assert_allclose(np.asarray(g)[:n], dense @ w,
                               rtol=2e-4, atol=2e-4)


def _nc_model(f, c):
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model

    def gnn(din, dout, g="GRAPH_SAGE"):
        return LayerConfig(layer_type="GNN", input_dim=din, output_dim=dout,
                           gnn_type=g, aggregator="MEAN", bias=True)

    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (gnn(f, 12),), (gnn(12, c, "GCN"),),
    ))
    return Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                 loss_reduction="SUM")


@needs8
def test_sharded_full_graph_trainer_matches_single_device():
    """Full-graph mode is sampling-free, so the ring-sharded trainer must
    reproduce the single-device full-graph loss trajectory exactly (same
    permutation), modulo float reassociation in the ring partial sums."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.train.nc import NodeClassificationTrainer

    rng = np.random.default_rng(11)
    n, e, f, c = 140, 900, 8, 4
    edges = _graph(rng, n, e)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    train_nodes = rng.permutation(n).astype(np.int32)[:100]
    model = _nc_model(f, c)
    graph = build_device_graph(edges, n)
    adj = build_full_graph_adjacency(edges, n)

    mesh = make_mesh(num_data=1, num_node=8)
    tr_m = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                     [], batch_size=25, seed=0,
                                     full_graph=adj, mesh=mesh,
                                     fg_linear_collapse=False)  # pin the ring
    assert tr_m._fg_sharded
    losses_m = [s["loss"] for s in tr_m.train(4)]

    tr_1 = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                     [], batch_size=25, seed=0,
                                     full_graph=adj, fg_seed_restrict=False)
    losses_1 = [s["loss"] for s in tr_1.train(4)]
    np.testing.assert_allclose(losses_m, losses_1, rtol=2e-4)
    assert losses_m[-1] < losses_m[0]

    # evaluator rides the same sharded forward
    from marius_tpu.train.nc import NodeClassificationEvaluator
    ev_m = NodeClassificationEvaluator(tr_m, np.arange(n, dtype=np.int32)[:40])
    ev_1 = NodeClassificationEvaluator(tr_1, np.arange(n, dtype=np.int32)[:40])
    am = ev_m.evaluate(tr_m.state)["accuracy"]
    a1 = ev_1.evaluate(tr_1.state)["accuracy"]
    assert abs(am - a1) < 1e-6


@needs8
def test_sharded_full_graph_from_config(tmp_path):
    """training.mesh + full_graph ON from YAML engages the ring path."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_nc

    ds_dir = str(tmp_path / "ds_fg_mesh")
    generate_random_dataset_nc(ds_dir, num_nodes=80, num_edges=700,
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
            "dense_optimizer": {"type": "ADAM",
                                "options": {"learning_rate": 0.01}},
        },
        "storage": {"dataset": {"dataset_dir": ds_dir}, "save_model": False},
        "training": {"batch_size": 20, "num_epochs": 2,
                     "mesh": {"data": 1, "node": 8}},
        "evaluation": {"batch_size": 20},
    }
    result = marius_train(load_config(raw))
    assert len(result["epochs"]) == 2
    assert 0.0 <= result["test"]["accuracy"] <= 1.0


@needs8
def test_sharded_gat_matches_single_device():
    """Ring-sharded GAT (two-pass attention ring, make_gat_ring) must
    reproduce the single-device bucketed full-graph GAT trajectory —
    same permutation, exact math up to float reassociation."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
    from marius_tpu.train.nc import (
        NodeClassificationEvaluator,
        NodeClassificationTrainer,
    )

    rng = np.random.default_rng(13)
    n, e, f, c = 120, 700, 8, 4
    edges = _graph(rng, n, e)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    train_nodes = rng.permutation(n).astype(np.int32)[:80]

    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=f,
                     output_dim=12, num_heads=3, average_heads=False,
                     bias=True, activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=12,
                     output_dim=c, num_heads=2, average_heads=True),),
    ))
    model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM")
    graph = build_device_graph(edges, n)
    adj = build_full_graph_adjacency(edges, n)

    mesh = make_mesh(num_data=1, num_node=8)
    tr_m = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                     [], batch_size=20, seed=0,
                                     full_graph=adj, mesh=mesh)
    assert tr_m._fg_sharded and "gat_ring_max" in tr_m._fg_ops
    losses_m = [s["loss"] for s in tr_m.train(3)]

    tr_1 = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                     [], batch_size=20, seed=0,
                                     full_graph=adj, fg_seed_restrict=False)
    losses_1 = [s["loss"] for s in tr_1.train(3)]
    np.testing.assert_allclose(losses_m, losses_1, rtol=5e-4)
    assert losses_m[-1] < losses_m[0]

    ev_m = NodeClassificationEvaluator(tr_m, np.arange(40, dtype=np.int32))
    ev_1 = NodeClassificationEvaluator(tr_1, np.arange(40, dtype=np.int32))
    assert abs(ev_m.evaluate(tr_m.state)["accuracy"]
               - ev_1.evaluate(tr_1.state)["accuracy"]) < 1e-6
