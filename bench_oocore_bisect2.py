"""Out-of-core ping-pong bisection, stage 2 (morph7).

RETROSPECTIVE NOTE: the stage-1 numbers this header originally quoted
(base 0.10 / realloss 0.03 ms/iter, "all aliasing-clean") were taken
with block_until_ready-based timing, which this runtime's async dispatch
defeats — see bench_oocore_bisect3.py's docstring. With sound timing the
`all` variant here measures ~15.8 ms/iter, matching the real state_fn. The remaining structural deltas between the fast replica
and the REAL buffer state_fn (train/buffer_trainer.py:257-486) are
bisected here, each added alone on top of the fast `realloss` math:

 negs  : in_buffer_negs-style negative sampling (slot_valid gather +
         modulo into valid rows + degree-mix gather from the batch edges)
 dirty : donated dirty-row bitmap, scatter-set True per batch
 opt   : dense opt_state carried + apply_optimizer per batch
 degf  : DEG local filter masks threaded into lp_batch_loss
 all   : everything at once (should reproduce the real ~16 ms/batch if
         the trigger is among these)

    for v in negs dirty opt degf all; do
        python bench_oocore_bisect2.py $v; done
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
NUM_DEG = NNEG // 2            # degree_fraction 0.5, like the bench config
K = 2 * B + 2 * C * NNEG
NB = 8
CAPACITY = 8
PSIZE = R // CAPACITY
rng = np.random.default_rng(0)
edges = jnp.asarray(np.stack([rng.integers(0, R, NB * B),
                              rng.integers(0, 8, NB * B),
                              rng.integers(0, R, NB * B)], 1).astype(np.int32))
masks_all = jnp.asarray(np.ones((NB, B), bool))
slot_valid = jnp.full((CAPACITY,), PSIZE, jnp.int32)

from marius_tpu.data.samplers.negative import deg_local_filter_mask
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model, lp_batch_loss
from marius_tpu.nn.model import init_model_params
from marius_tpu.nn.optimizers import apply_optimizer, init_optimizer
from marius_tpu.ops.unique import unique_padded

enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING", output_dim=D),),))
model = Model(LINK_PREDICTION, enc,
              EdgeDecoder("COMPLEX", 8, D, use_inverse_relations=True))
params0 = init_model_params(jax.random.key(1), model)
opt_state0 = init_optimizer(model.dense_optimizer, params0)

USE_NEGS = V in ("negs", "all")
USE_DIRTY = V in ("dirty", "all")
USE_OPT = V in ("opt", "all")
USE_DEGF = V in ("degf", "all")


def f(v, s, params, opt_state, dirty, sv, edges, masks_all):
    def body(carry, xs):
        v, s, params, opt_state, dirty, key = carry
        eb, mask_b = xs
        key, k1, k2 = jax.random.split(key, 3)

        def sample_negs(k, inverse):
            if not USE_NEGS:
                return jax.random.randint(k, (C, NNEG), 0, R,
                                          dtype=jnp.int32), None
            ka, kb, kc = jax.random.split(k, 3)
            slots = jax.random.randint(ka, (C, NNEG), 0, CAPACITY)
            offs = jax.random.randint(kb, (C, NNEG), 0, PSIZE)
            valid = sv[slots]
            uni = (slots * PSIZE
                   + offs % jnp.maximum(valid, 1)).astype(jnp.int32)
            rows = jax.random.randint(kc, (C, NUM_DEG), 0, B,
                                      dtype=jnp.int32)
            col = 0 if inverse else eb.shape[1] - 1
            deg = jnp.where(mask_b[rows], eb[:, col][rows],
                            uni[:, :NUM_DEG])
            return jnp.concatenate([deg, uni[:, NUM_DEG:]], axis=1), rows

        dn, dn_rows = sample_negs(k1, False)
        sn, sn_rows = sample_negs(k2, True)
        dst_filter = src_filter = None
        if USE_DEGF:
            dst_filter = deg_local_filter_mask(dn_rows, B, NNEG)
            src_filter = deg_local_filter_mask(sn_rows, B, NNEG)

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

        def loss_fn(x, params):
            loss, _ = lp_batch_loss(
                model, params, x, inv_src, inv_dst, rel, inv_dn,
                inv_sn, mask_b, dst_filter, src_filter)
            return loss

        loss, (gx, gp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, params)
        if USE_OPT:
            params, opt_state = apply_optimizer(
                model.dense_optimizer, params, opt_state, gp)
        else:
            params = jax.tree.map(lambda p, g: p - 0.01 * g, params, gp)
        ns = jnp.take(s, safe, axis=0) + gx * gx
        delta = -0.1 * gx / (jnp.sqrt(ns) + 1e-10)
        v = v.at[ids].add(delta, mode="drop")
        s = s.at[ids].set(ns, mode="drop")
        if USE_DIRTY:
            dirty = dirty.at[ids].set(True, mode="drop")
        return (v, s, params, opt_state, dirty, key), loss

    carry, losses = jax.lax.scan(
        body, (v, s, params, opt_state, dirty, jax.random.key(0)),
        (edges.reshape(NB, B, 3), masks_all))
    return carry, jnp.sum(losses)


fn = jax.jit(f, donate_argnums=(0, 1, 2, 3, 4))
v = jnp.full((R, D), 1e-10, jnp.float32)
s = jnp.full((R, D), 1e-10, jnp.float32)
dirty = jnp.zeros((R,), bool)
out = fn(v, s, params0, opt_state0, dirty, slot_valid, edges, masks_all)
_ = float(out[1])  # warm the reverse channel + force the first chain
REPS = 12
t0 = time.perf_counter()
for _ in range(REPS):
    out = fn(*out[0][:5], slot_valid, edges, masks_all)
# fetching the final loss forces the whole donated chain; bare
# block_until_ready returns early under this runtime's async dispatch
_ = float(out[1])
print(f"morph7 {V}: {(time.perf_counter()-t0)/REPS/NB*1e3:.3f} ms/iter", flush=True)
