"""Out-of-core bisection stage 3 (morph9): sound timing, one process.

Timing methodology note (this invalidated every earlier morph result):
under this remote-attached runtime, `jax.block_until_ready` on a donated
output can return BEFORE the computation executes — the first morph runs
measured dispatch, not execution, and reported a physically impossible
0.02 ms for a batch with ~3 GFLOPs and 24 MB of row traffic. Fetching the
final loss scalar (float(...)) forces the whole donated chain; with that,
the real state_fn measures ~22.7 ms/batch at freebase86m shape and the
full morph7 replica (`all`) reproduces ~15.8 ms/iter at 10M rows.

This stage runs several variants in ONE process (the reverse channel's
multi-minute first-fetch warmup is paid once), each with its own fresh
buffer pair:

    python bench_oocore_bisect3.py none negs dirty opt plain
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

R, D = 10_000_000, 50
B = 10_000
C, NNEG = 10, 500
NUM_DEG = NNEG // 2
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


def build(variant):
    USE_NEGS = variant in ("negs", "all")
    USE_DIRTY = variant in ("dirty", "all")
    USE_OPT = variant in ("opt", "all")
    USE_DEGF = variant in ("degf", "all")
    PLAIN = variant == "plain"   # morph6-base-style inline loss

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
            if USE_DEGF and USE_NEGS:
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

            if PLAIN:
                def loss_fn(x, params):
                    rels = params["decoder"]["relations"]
                    sc = x[inv_src] * rels[rel]
                    pos = jnp.sum(sc * x[inv_dst], axis=1)
                    negs2 = x[inv_dn.reshape(-1)].reshape(C, NNEG, D)
                    scc = sc.reshape(C, B // C, D)
                    neg = jax.lax.dot_general(
                        scc, negs2, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    m = jax.nn.logsumexp(jnp.concatenate(
                        [neg.reshape(B, NNEG), pos[:, None]], 1), axis=1)
                    return jnp.sum(m - pos)
            else:
                def loss_fn(x, params):
                    loss, _ = lp_batch_loss(
                        model, params, x, inv_src, inv_dst, rel, inv_dn,
                        inv_sn, mask_b, dst_filter, src_filter)
                    return loss

            loss, (gx, gp) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(x, params)
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

    return jax.jit(f, donate_argnums=(0, 1, 2, 3, 4))


for variant in sys.argv[1:]:
    fn = build(variant)
    v = jnp.full((R, D), 1e-10, jnp.float32)
    s = jnp.full((R, D), 1e-10, jnp.float32)
    dirty = jnp.zeros((R,), bool)
    # fresh copies: params/opt_state are DONATED, a shared original would
    # be deleted after the first variant
    params_v = jax.tree.map(jnp.array, params0)
    opt_v = jax.tree.map(jnp.array, opt_state0)
    t0 = time.perf_counter()
    out = fn(v, s, params_v, opt_v, dirty, slot_valid, edges, masks_all)
    _ = float(out[1])
    print(f"morph9 {variant}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    REPS = 12
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*out[0][:5], slot_valid, edges, masks_all)
    _ = float(out[1])
    print(f"morph9 {variant}: "
          f"{(time.perf_counter()-t0)/REPS/NB*1e3:.3f} ms/iter", flush=True)
    del fn, out, v, s, dirty
