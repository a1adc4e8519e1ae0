"""GAT round-5 perf restructure exactness: both new formulations
(project-then-gather for h*k <= d_in; scalar-logit + aggregate-then-project
for h*k > d_in) must reproduce the naive reference math of gat_layer.cpp
(project every gathered slot, softmax, weighted sum) bit-for-bit in f32
tolerance — including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marius_tpu.data.batch import LayerAdjacency
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.layers.layers import gat_layer, init_layer_params, masked_softmax


def _naive_gat(config, params, inputs, adj):
    """The pre-restructure formulation (projects every slot occurrence)."""
    h = config.num_heads
    head_dim = (config.output_dim if config.average_heads
                else config.output_dim // h)
    self_embs = inputs[adj.self_idx]
    in_embs = inputs[adj.in_nbr_idx]
    out_embs = inputs[adj.out_nbr_idx]
    n = self_embs.shape[0]
    slots = jnp.concatenate([in_embs, out_embs, self_embs[:, None, :]], axis=1)
    slot_mask = jnp.concatenate(
        [adj.in_mask, adj.out_mask,
         jnp.ones((n, 1), bool) & adj.node_mask[:, None]], axis=1)
    w = params["w"].reshape(inputs.shape[-1], h, head_dim)
    t = jnp.einsum("nsd,dhk->nshk", slots, w)
    self_t = t[:, -1]
    logits = jnp.einsum("nhk,hk->nh", self_t, params["a_l"])[:, None, :] + \
        jnp.einsum("nshk,hk->nsh", t, params["a_r"])
    logits = jax.nn.leaky_relu(logits, config.negative_slope)
    alpha = masked_softmax(
        logits, slot_mask[:, :, None] & jnp.ones((1, 1, h), bool), axis=1)
    out = jnp.einsum("nsh,nshk->nhk", alpha, t)
    if config.average_heads:
        out = jnp.mean(out, axis=1)
    else:
        out = out.reshape(n, h * head_dim)
    from marius_tpu.nn.layers.layers import post_hook
    return post_hook(config, params, out)


def _adj(rng, n, n_prev, f_in, f_out):
    return LayerAdjacency(
        self_idx=jnp.asarray(rng.integers(0, n_prev, n).astype(np.int32)),
        in_nbr_idx=jnp.asarray(rng.integers(0, n_prev, (n, f_in)).astype(np.int32)),
        in_mask=jnp.asarray(rng.random((n, f_in)) < 0.7),
        out_nbr_idx=jnp.asarray(rng.integers(0, n_prev, (n, f_out)).astype(np.int32)),
        out_mask=jnp.asarray(rng.random((n, f_out)) < 0.7),
        node_mask=jnp.asarray(rng.random(n) < 0.9),
    )


@pytest.mark.parametrize("d_in,heads,d_out,avg", [
    (12, 3, 6, False),    # h*k = 6  <= 12 -> project-then-gather branch
    (8, 4, 16, True),     # h*k = 64 >  8  -> aggregate-then-project branch
    (16, 2, 16, False),   # h*k = 16 <= 16 -> boundary
])
def test_gat_layer_matches_naive(d_in, heads, d_out, avg):
    rng = np.random.default_rng(0)
    n, n_prev, f_in, f_out = 20, 40, 5, 4
    cfg = LayerConfig(layer_type="GNN", gnn_type="GAT", input_dim=d_in,
                      output_dim=d_out, num_heads=heads, average_heads=avg,
                      bias=True, activation="RELU")
    params = init_layer_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.standard_normal((n_prev, d_in)).astype(np.float32))
    adj = _adj(rng, n, n_prev, f_in, f_out)

    got = gat_layer(cfg, params, x, adj)
    want = _naive_gat(cfg, params, x, adj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    # gradients through both formulations agree too
    def loss_new(x, p):
        return jnp.sum(gat_layer(cfg, p, x, adj) ** 2)

    def loss_old(x, p):
        return jnp.sum(_naive_gat(cfg, p, x, adj) ** 2)

    gx_new, gp_new = jax.grad(loss_new, argnums=(0, 1))(x, params)
    gx_old, gp_old = jax.grad(loss_old, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_old),
                               rtol=2e-4, atol=2e-5)
    for k in gp_new:
        np.testing.assert_allclose(np.asarray(gp_new[k]), np.asarray(gp_old[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
