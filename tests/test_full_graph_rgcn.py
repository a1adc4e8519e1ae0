"""Full-graph RGCN (data/full_graph_rel.py + full_graph_encoder RGCN branch).

Parity model: the sampled rgcn_layer under unbounded ALL (reference
rgcn_layer.cpp semantics — mean over out-neighbors of x[dst] @ W[rel] plus
the self transform). The custom-vjp gathers are checked against a naive
scatter-based implementation's autodiff on a small graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marius_tpu.data.full_graph import build_full_graph_adjacency
from marius_tpu.data.full_graph_rel import build_rel_full_graph, make_rel_sum


def random_kg(seed=0, n=60, e=500, r=5, d=8):
    rng = np.random.default_rng(seed)
    edges = np.stack([
        rng.integers(0, n, e),
        rng.integers(0, r, e),
        rng.integers(0, n, e),
    ], 1).astype(np.int32)
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    w = rng.normal(0, 0.3, (r, d, d)).astype(np.float32)
    return edges, x, w


def naive_rel_sum(edges, x, w):
    """Scatter-based reference: sum over out-edges of x[dst] @ W[rel]."""
    t = jnp.einsum("ed,edo->eo", x[edges[:, 2]], w[edges[:, 1]])
    return jnp.zeros((x.shape[0], w.shape[-1]), x.dtype).at[edges[:, 0]].add(t)


def test_rel_sum_matches_naive_forward_and_grads():
    edges, x, w = random_kg()
    rg = build_rel_full_graph(edges, x.shape[0])
    rel_sum = make_rel_sum(rg)

    out = rel_sum(jnp.asarray(x), jnp.asarray(w))
    ref = naive_rel_sum(edges, jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # grads through a scalar loss with a fixed cotangent pattern
    cot = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, out.shape).astype(np.float32))

    gx, gw = jax.grad(
        lambda xx, ww: jnp.sum(rel_sum(xx, ww) * cot), argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))
    rx, rw = jax.grad(
        lambda xx, ww: jnp.sum(naive_rel_sum(edges, xx, ww) * cot),
        argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_rel_sum_skewed_relations_and_isolated_nodes():
    """Heavily skewed relation counts exercise multi-bucket paths; nodes
    with zero out-edges must come back exactly zero."""
    rng = np.random.default_rng(3)
    n, d = 40, 4
    # relation 0 has 300 edges, relations 1..6 a handful each
    rels = np.concatenate([np.zeros(300, np.int64),
                           rng.integers(1, 7, 18)])
    e = len(rels)
    edges = np.stack([
        rng.integers(0, n // 2, e),        # nodes in [n//2, n) isolated
        rels,
        rng.integers(0, n, e)], 1).astype(np.int32)
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    w = rng.normal(0, 0.3, (7, d, d)).astype(np.float32)

    rg = build_rel_full_graph(edges, n)
    out = make_rel_sum(rg)(jnp.asarray(x), jnp.asarray(w))
    ref = naive_rel_sum(edges, jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(out)[n // 2:]).max() == 0.0


@pytest.mark.slow
def test_full_graph_rgcn_matches_sampled_all():
    """Full-graph RGCN NC training matches the sampled-ALL trajectory."""
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import Model
    from marius_tpu.nn.optimizers import OptimizerConfig
    from marius_tpu.train.nc import (
        NodeClassificationEvaluator,
        NodeClassificationTrainer,
    )

    n, feat_dim, classes, r = 120, 8, 3, 4
    rng = np.random.default_rng(7)
    edges = np.stack([rng.integers(0, n, 900),
                      rng.integers(0, r, 900),
                      rng.integers(0, n, 900)], 1).astype(np.int32)
    feats = rng.normal(0, 1, (n, feat_dim)).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int32)
    train_nodes = np.arange(90, dtype=np.int32)
    test_nodes = np.arange(90, n, dtype=np.int32)

    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=feat_dim),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN",
                     input_dim=feat_dim, output_dim=feat_dim, bias=True,
                     activation="RELU", num_relations=r),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN",
                     input_dim=feat_dim, output_dim=classes, bias=True,
                     num_relations=r),),
    )
    def model():
        return Model(
            learning_task="NODE_CLASSIFICATION",
            encoder=EncoderConfig(stages=stages), decoder=None,
            loss_type="CROSS_ENTROPY", loss_reduction="SUM",
            dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))

    graph = build_device_graph(edges, n, num_relations=r)
    max_deg = int(np.asarray(graph.degrees).max())
    nbr = [NeighborSamplingConfig("ALL", max_neighbors=max_deg)] * 2

    sampled = NodeClassificationTrainer(
        model(), graph, feats, labels, train_nodes, nbr,
        batch_size=45, seed=0)
    fg_adj = build_full_graph_adjacency(edges, n, with_relations=True)
    assert fg_adj is not None and fg_adj.rel is not None
    full = NodeClassificationTrainer(
        model(), graph, feats, labels, train_nodes, nbr,
        batch_size=45, seed=0, full_graph=fg_adj)
    # seed-restricted RGCN final stage engages automatically (small R*d_in)
    assert full._fg_seed_restrict is True
    assert full._fg_rel_csr is not None
    # constant FEATURE input (no trained bias): the first RGCN stage's slot
    # gather is cached once; only the relation transform runs per batch
    c = full._fg_ops["const_agg"].get((1, 0))
    assert c is not None and c[0] == "rgcn_blocks"

    s_stats = sampled.train(3)
    f_stats = full.train(3)
    for s, f in zip(s_stats, f_stats):
        assert abs(s["loss"] - f["loss"]) < 1e-2 * max(abs(s["loss"]), 1.0), \
            f"loss diverged: sampled {s['loss']} vs full-graph {f['loss']}"

    ev_s = NodeClassificationEvaluator(sampled, test_nodes)
    ev_f = NodeClassificationEvaluator(full, test_nodes)
    a = ev_s.evaluate(sampled.state)
    b = ev_f.evaluate(full.state)
    assert abs(a["accuracy"] - b["accuracy"]) < 1e-6


needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@needs8
@pytest.mark.parametrize("n,e,r,s", [(97, 600, 5, 4), (64, 300, 3, 8)])
@pytest.mark.slow
def test_rel_sum_sharded_matches_single_device(n, e, r, s):
    """Ring-sharded relational sum == bucketed single-device op, forward
    and both grads (the backward runs its own transposed ring schedule)."""
    from marius_tpu.data.full_graph_rel import (
        build_sharded_rel_graph,
        make_rel_sum_sharded,
    )
    from marius_tpu.data.full_graph_sharded import ShardedFullGraph, shard_rows
    from marius_tpu.parallel.mesh import NODE_AXIS, make_mesh

    rng = np.random.default_rng(n + e)
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], 1).astype(np.int32)
    d = 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    w = (rng.standard_normal((r, d, d)) * 0.3).astype(np.float32)

    rg = build_rel_full_graph(edges, n)
    ref = make_rel_sum(rg)(jnp.asarray(x), jnp.asarray(w))

    mesh = make_mesh(num_data=1, num_node=s, devices=jax.devices()[:s])
    srg = build_sharded_rel_graph(edges, n, s)
    # shard_rows only needs padded_nodes/n_loc; fake the view
    class _V:
        padded_nodes = srg.num_shards * srg.n_loc
    x_sh = shard_rows(x, _V, mesh, NODE_AXIS)
    rel_sum_sh = make_rel_sum_sharded(srg, mesh, NODE_AXIS)
    out = jax.jit(rel_sum_sh)(x_sh, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out)[n:], 0.0)

    cot = rng.standard_normal((_V.padded_nodes, d)).astype(np.float32)
    cot_sh = shard_rows(cot[:n], _V, mesh, NODE_AXIS)
    gx, gw = jax.jit(jax.grad(
        lambda xx, ww: jnp.sum(rel_sum_sh(xx, ww) * cot_sh),
        argnums=(0, 1)))(x_sh, jnp.asarray(w))
    rx, rw = jax.grad(
        lambda xx, ww: jnp.sum(naive_rel_sum(edges, xx, ww)
                               * jnp.asarray(cot[:n])),
        argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx)[:n], np.asarray(rx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=2e-4, atol=2e-4)


@needs8
@pytest.mark.slow
def test_sharded_rgcn_trainer_matches_single_device():
    """Ring-sharded RGCN NC training reproduces the single-device
    full-graph trajectory (same permutation, float reassociation only)."""
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
    from marius_tpu.parallel.mesh import make_mesh
    from marius_tpu.train.nc import (
        NodeClassificationEvaluator,
        NodeClassificationTrainer,
    )

    rng = np.random.default_rng(17)
    n, e, f, c, r = 120, 700, 8, 4, 5
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], 1).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    train_nodes = rng.permutation(n).astype(np.int32)[:80]

    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=f,
                     output_dim=12, bias=True, activation="RELU",
                     num_relations=r),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=12,
                     output_dim=c, num_relations=r),),
    ))
    model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM")
    graph = build_device_graph(edges, n, num_relations=r)
    adj = build_full_graph_adjacency(edges, n, with_relations=True)

    mesh = make_mesh(num_data=1, num_node=8)
    tr_m = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                     [], batch_size=20, seed=0,
                                     full_graph=adj, mesh=mesh)
    assert tr_m._fg_sharded and "rel_sum" in tr_m._fg_ops
    losses_m = [st["loss"] for st in tr_m.train(3)]

    tr_1 = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                     [], batch_size=20, seed=0,
                                     full_graph=adj, fg_seed_restrict=False)
    losses_1 = [st["loss"] for st in tr_1.train(3)]
    np.testing.assert_allclose(losses_m, losses_1, rtol=5e-4)
    assert losses_m[-1] < losses_m[0]

    ev_m = NodeClassificationEvaluator(tr_m, np.arange(40, dtype=np.int32))
    ev_1 = NodeClassificationEvaluator(tr_1, np.arange(40, dtype=np.int32))
    assert abs(ev_m.evaluate(tr_m.state)["accuracy"]
               - ev_1.evaluate(tr_1.state)["accuracy"]) < 1e-6


@pytest.mark.parametrize("two_stage", [False, True])
@pytest.mark.slow
def test_full_graph_rgcn_seed_restrict_matches_all_n(two_stage):
    """The seed-restricted RGCN final stage (aggregate-per-(seed, relation)
    then one batched einsum) is the same math as the all-N final stage.
    two_stage=True makes the FIRST GNN stage also the FINAL one, so the
    cached constant-input blocks coexist with seed restriction."""
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
    from marius_tpu.train.nc import NodeClassificationTrainer

    rng = np.random.default_rng(23)
    n, e, f, c, r = 100, 600, 8, 4, 4
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], 1).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    train_nodes = rng.permutation(n).astype(np.int32)[:70]

    if two_stage:
        stages = (
            (LayerConfig(layer_type="FEATURE", output_dim=f),),
            (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=f,
                         output_dim=c, bias=True, num_relations=r),),
        )
    else:
        stages = (
            (LayerConfig(layer_type="FEATURE", output_dim=f),),
            (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=f,
                         output_dim=12, bias=True, activation="RELU",
                         num_relations=r),),
            (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=12,
                         output_dim=c, num_relations=r),),
        )
    enc = EncoderConfig(stages=stages)
    model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM")
    graph = build_device_graph(edges, n, num_relations=r)
    adj = build_full_graph_adjacency(edges, n, with_relations=True)

    kw = dict(batch_size=25, seed=0, full_graph=adj)
    tr_seed = NodeClassificationTrainer(
        model, graph, feats, labels, train_nodes, [], **kw)
    assert tr_seed._fg_seed_restrict is True
    tr_full = NodeClassificationTrainer(
        model, graph, feats, labels, train_nodes, [],
        fg_seed_restrict=False, **kw)
    ls = [st["loss"] for st in tr_seed.train(4)]
    lf = [st["loss"] for st in tr_full.train(4)]
    np.testing.assert_allclose(ls, lf, rtol=2e-5)


def test_prepare_full_graph_requires_rel_structure():
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.full_graph_encoder import prepare_full_graph

    edges, _, _ = random_kg()
    adj = build_full_graph_adjacency(edges, 60)  # no relations
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=8),),
        (LayerConfig(layer_type="GNN", gnn_type="RGCN", input_dim=8,
                     output_dim=8, num_relations=5),),
    ))
    with pytest.raises(AssertionError, match="with_relations"):
        prepare_full_graph(adj, enc)
