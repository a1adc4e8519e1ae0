"""Out-of-core while-loop ping-pong bisection (ROUND5_NOTES continuation).

RETROSPECTIVE NOTE: the original run of this script reported fast
(0.03-0.10 ms/iter) numbers for every variant; those were measurement
artifacts (block_until_ready returning before donated computations
execute on this runtime). The timing below now forces a host fetch of
the final loss; see bench_oocore_bisect3.py for the corrected story.

The replica of the buffer batch step (gather + full softmax-CE loss +
fused Adagrad + both row scatters on a 2 x 2 GB donated buffer pair)
runs at 0.02 ms/iter inside lax.scan; the REAL state_fn measures ~16
ms/batch = a full buffer-pair copy per batch (aliasing lost inside the
while loop). Run each variant in its own process on the chip:

    for v in base realloss realenc rl_noinv rl_dm rl_nomask; do
        python bench_oocore_bisect.py $v; done

fast base + slow realloss -> drill with rl_*; slow realenc only -> the
encoder_forward wrapper is the trigger. Variants:
 base      : fast replica (inline loss, no inverse, DISTMULT-ish)
 realloss  : marius_tpu lp_batch_loss (COMPLEX + inverse + mask)
 realenc   : + encoder_forward
 rl_noinv  : lp_batch_loss with use_inverse_relations=False decoder
 rl_dm     : lp_batch_loss with DISTMULT decoder (inverse on)
 rl_nomask : lp_batch_loss with mask=all-true via inline ones
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

V = sys.argv[1]
R, D = 10_000_000, 50
B = 10_000
C, NNEG = 10, 500
K = 2 * B + 2 * C * NNEG
NB = 8
rng = np.random.default_rng(0)
edges = jnp.asarray(np.stack([rng.integers(0, R, NB * B),
                              rng.integers(0, 8, NB * B),
                              rng.integers(0, R, NB * B)], 1).astype(np.int32))
masks_all = jnp.asarray(np.ones((NB, B), bool))

from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig, encoder_forward
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model, lp_batch_loss
from marius_tpu.nn.model import init_model_params
from marius_tpu.ops.unique import unique_padded

dec_type = "DISTMULT" if V == "rl_dm" else "COMPLEX"
use_inv = V != "rl_noinv"
enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING", output_dim=D),),))
model = Model(LINK_PREDICTION, enc,
              EdgeDecoder(dec_type, 8, D, use_inverse_relations=use_inv))
params0 = init_model_params(jax.random.key(1), model)


def f(v, s, params, edges, masks_all):
    def body(carry, xs):
        v, s, params, key = carry
        eb, mask_b = xs
        key, k1, k2 = jax.random.split(key, 3)
        dn = jax.random.randint(k1, (C, NNEG), 0, R, dtype=jnp.int32)
        sn = jax.random.randint(k2, (C, NNEG), 0, R, dtype=jnp.int32)
        src = jnp.where(mask_b, eb[:, 0], R)
        dst = jnp.where(mask_b, eb[:, 2], R)
        rel = eb[:, 1]
        all_ids = jnp.concatenate([src, dst, dn.reshape(-1), sn.reshape(-1)])
        uq = unique_padded(all_ids, size=K, fill_value=R)
        ids, inv = uq.ids, uq.inverse
        safe = jnp.minimum(ids, R - 1)
        x = jnp.take(v, safe, axis=0)

        inv_src = inv[:B]
        inv_dst = inv[B:2 * B]
        inv_dn = inv[2 * B:2 * B + C * NNEG].reshape(C, NNEG)
        inv_sn = inv[2 * B + C * NNEG:].reshape(C, NNEG)

        if V == "base":
            def loss_fn(x, params):
                rels = params["decoder"]["relations"]
                sc = x[inv_src] * rels[rel]
                pos = jnp.sum(sc * x[inv_dst], axis=1)
                negs = x[inv_dn.reshape(-1)].reshape(C, NNEG, D)
                scc = sc.reshape(C, B // C, D)
                neg = jax.lax.dot_general(
                    scc, negs, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m = jax.nn.logsumexp(jnp.concatenate(
                    [neg.reshape(B, NNEG), pos[:, None]], 1), axis=1)
                return jnp.sum(m - pos)
        else:
            mk = (jnp.ones_like(mask_b) if V == "rl_nomask" else mask_b)

            def loss_fn(x, params):
                e = (encoder_forward(model.encoder, params["encoder"], x, None)
                     if V == "realenc" else x)
                loss, _ = lp_batch_loss(
                    model, params, e, inv_src, inv_dst, rel, inv_dn,
                    inv_sn if use_inv else None, mk)
                return loss

        loss, (gx, gp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, params)
        params = jax.tree.map(lambda p, g: p - 0.01 * g, params, gp)
        ns = jnp.take(s, safe, axis=0) + gx * gx
        delta = -0.1 * gx / (jnp.sqrt(ns) + 1e-10)
        v = v.at[ids].add(delta, mode="drop")
        s = s.at[ids].set(ns, mode="drop")
        return (v, s, params, key), loss

    (v, s, params, _), losses = jax.lax.scan(
        body, (v, s, params, jax.random.key(0)),
        (edges.reshape(NB, B, 3), masks_all))
    return v, s, params, jnp.sum(losses)


fn = jax.jit(f, donate_argnums=(0, 1, 2))
v = jnp.full((R, D), 1e-10, jnp.float32)
s = jnp.full((R, D), 1e-10, jnp.float32)
out = fn(v, s, params0, edges, masks_all)
_ = float(out[3])  # warm the reverse channel + force the first chain
REPS = 12
t0 = time.perf_counter()
for _ in range(REPS):
    out = fn(*out[:3], edges, masks_all)
# block_until_ready can return before execution under this runtime's deep
# async dispatch (invalidated the first round of morph results); fetching
# the final loss forces the whole donated chain
_ = float(out[3])
print(f"morph6 {V}: {(time.perf_counter()-t0)/REPS/NB*1e3:.3f} ms/iter", flush=True)
