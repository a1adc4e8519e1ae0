"""Explicit sharded-table collectives vs dense single-device reference
(8-device virtual CPU mesh from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from marius_tpu.parallel.collectives import (
    make_sharded_lp_step,
    sharded_adagrad_update,
    sharded_gather,
    sharded_scatter_add,
)
from marius_tpu.parallel.mesh import make_mesh

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh():
    import numpy as _np
    from jax.sharding import Mesh
    return Mesh(_np.asarray(jax.devices()[:8]), ("node",))


@needs8
def test_sharded_gather_matches_take():
    mesh = _mesh()
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, 40).astype(np.int32))

    f = jax.jit(jax.shard_map(
        lambda t, i: sharded_gather(t, i, "node"), mesh=mesh,
        in_specs=(P("node", None), P()), out_specs=P(), check_vma=False))
    out = f(table, ids)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(ids)], rtol=1e-6)


@needs8
def test_sharded_scatter_add_matches_dense():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, 30).astype(np.int32))  # dups allowed
    vals = jnp.asarray(rng.standard_normal((30, 8)).astype(np.float32))

    f = jax.jit(jax.shard_map(
        lambda t, i, v: sharded_scatter_add(t, i, v, "node"), mesh=mesh,
        in_specs=(P("node", None), P(), P()), out_specs=P("node", None),
        check_vma=False))
    out = f(table, ids, vals)
    exp = np.asarray(table).copy()
    np.add.at(exp, np.asarray(ids), np.asarray(vals))
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5)


@needs8
def test_sharded_adagrad_matches_dense_accum():
    from marius_tpu.parallel.embedding_table import (
        EmbeddingTable,
        sparse_adagrad_update_dense_accum,
    )
    mesh = _mesh()
    rng = np.random.default_rng(2)
    values = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    state = jnp.abs(jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32)))
    ids = jnp.asarray(rng.integers(0, 64, 50).astype(np.int32))
    grads = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))

    f = jax.jit(jax.shard_map(
        lambda v, s, i, g: sharded_adagrad_update(v, s, i, g, 0.1, "node"),
        mesh=mesh, in_specs=(P("node", None), P("node", None), P(), P()),
        out_specs=(P("node", None), P("node", None)), check_vma=False))
    nv, ns = f(values, state, ids, grads)
    ref = sparse_adagrad_update_dense_accum(
        EmbeddingTable(values=values, state=state), ids, grads, 0.1)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(ref.values), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ref.state), rtol=1e-5)


@needs8
def test_sharded_gather_gradient_matches_dense():
    """Regression: psum's transpose would overcount replicated cotangents by
    n_shards; the identity-backward routing must give exact row grads."""
    mesh = _mesh()
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, 24).astype(np.int32))
    w = jnp.asarray(rng.standard_normal((24, 8)).astype(np.float32))

    def sharded_loss(t):
        f = jax.shard_map(lambda ts, i: sharded_gather(ts, i, "node"),
                          mesh=mesh, in_specs=(P("node", None), P()),
                          out_specs=P(), check_vma=False)
        return jnp.sum(f(t, ids) * w)

    def dense_loss(t):
        return jnp.sum(t[ids] * w)

    g_sharded = jax.grad(sharded_loss)(table)
    g_dense = jax.grad(dense_loss)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_dense),
                               rtol=1e-5)


@needs8
def test_sharded_lp_step_adagrad_matches_dense():
    """The step's Adagrad accumulator must equal the dense reference's (a
    scale error in G is invisible to loss values because Adagrad from a zero
    accumulator is scale-invariant in G)."""
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import (
        LINK_PREDICTION,
        Model,
        init_model_params,
        lp_batch_loss_direct,
    )

    from marius_tpu.nn.optimizers import init_optimizer

    mesh = _mesh()
    rng = np.random.default_rng(6)
    n_pad, r, d = 64, 4, 16
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, d))
    params = init_model_params(jax.random.key(0), model)
    opt_state = init_optimizer(model.dense_optimizer, params)
    step = make_sharded_lp_step(model, mesh, n_pad)

    values = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32) * 0.1)
    state = jnp.zeros((n_pad, d), jnp.float32)
    b, c, nneg = 16, 2, 4
    edges = jnp.asarray(np.stack([
        rng.integers(0, n_pad, b), rng.integers(0, r, b),
        rng.integers(0, n_pad, b)], 1).astype(np.int32))
    dst_negs = jnp.asarray(rng.integers(0, n_pad, (c, nneg)).astype(np.int32))
    src_negs = jnp.asarray(rng.integers(0, n_pad, (c, nneg)).astype(np.int32))
    mask = jnp.ones((b,), bool)

    _, acc, _, _, _ = step(values, state, params, opt_state,
                           edges, dst_negs, src_negs, mask)

    # dense single-device reference of the same step
    def loss_fn(v):
        ids = jnp.concatenate([edges[:, 0], edges[:, 2],
                               dst_negs.reshape(-1), src_negs.reshape(-1)])
        x = v[ids]
        loss, _ = lp_batch_loss_direct(
            model, params, x[:b], x[b:2 * b], edges[:, 1],
            x[2 * b:2 * b + c * nneg].reshape(c, nneg, d),
            x[2 * b + c * nneg:].reshape(c, nneg, d), mask, None, None)
        return loss

    G_ref = jax.grad(loss_fn)(values)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(G_ref) ** 2,
                               rtol=1e-4, atol=1e-8)


@needs8
def test_sharded_lp_step_trains():
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model, init_model_params

    from marius_tpu.nn.optimizers import init_optimizer

    mesh = _mesh()
    rng = np.random.default_rng(3)
    n_pad, r, d = 64, 4, 16
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, d))
    params = init_model_params(jax.random.key(0), model)
    opt_state = init_optimizer(model.dense_optimizer, params)
    step = make_sharded_lp_step(model, mesh, n_pad)

    values = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32) * 0.1)
    state = jnp.zeros((n_pad, d), jnp.float32)
    b, c, nneg = 16, 2, 4
    losses = []
    for i in range(6):
        krng = np.random.default_rng(100 + i)
        edges = jnp.asarray(np.stack([
            krng.integers(0, n_pad, b), krng.integers(0, r, b),
            krng.integers(0, n_pad, b)], 1).astype(np.int32))
        dst_negs = jnp.asarray(krng.integers(0, n_pad, (c, nneg)).astype(np.int32))
        src_negs = jnp.asarray(krng.integers(0, n_pad, (c, nneg)).astype(np.int32))
        values, state, params, opt_state, loss = step(
            values, state, params, opt_state, edges, dst_negs, src_negs,
            jnp.ones((b,), bool))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # adagrad accumulator grew only on touched rows
    assert float(state.sum()) > 0


@needs8
def test_sharded_lp_step_relationless_edges():
    """The compat step must treat (b, 2) edge arrays as relation-less: no
    relation gathers (before the fix, column 1 — the dst node id — was fed
    as relation indices) and NO inverse-corruption term (without relations
    the reference skips the lhs term, decoder_methods.cpp:99-102). The
    Adagrad accumulator must match the dense rel=None, src_negs=None
    reference."""
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import (
        LINK_PREDICTION,
        Model,
        init_model_params,
        lp_batch_loss_direct,
    )
    from marius_tpu.nn.optimizers import init_optimizer

    mesh = _mesh()
    rng = np.random.default_rng(9)
    n_pad, d = 64, 16
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", 1, d))
    params = init_model_params(jax.random.key(0), model)
    opt_state = init_optimizer(model.dense_optimizer, params)
    step = make_sharded_lp_step(model, mesh, n_pad)

    values = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32) * 0.1)
    state = jnp.zeros((n_pad, d), jnp.float32)
    b, c, nneg = 16, 2, 4
    edges = jnp.asarray(np.stack([
        rng.integers(0, n_pad, b), rng.integers(0, n_pad, b)], 1).astype(np.int32))
    dst_negs = jnp.asarray(rng.integers(0, n_pad, (c, nneg)).astype(np.int32))
    src_negs = jnp.asarray(rng.integers(0, n_pad, (c, nneg)).astype(np.int32))
    mask = jnp.ones((b,), bool)

    _, acc, _, _, _ = step(values, state, params, opt_state,
                           edges, dst_negs, src_negs, mask)

    def loss_fn(v):
        ids = jnp.concatenate([edges[:, 0], edges[:, 1],
                               dst_negs.reshape(-1)])
        x = v[ids]
        loss, _ = lp_batch_loss_direct(
            model, params, x[:b], x[b:2 * b], None,
            x[2 * b:].reshape(c, nneg, d), None, mask, None, None)
        return loss

    G_ref = jax.grad(loss_fn)(values)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(G_ref) ** 2,
                               rtol=1e-4, atol=1e-8)
