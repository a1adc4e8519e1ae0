"""Time the REAL BufferTrainer state_fn in isolation (morph8).

morph7 cleared every suspected structural delta (negs/dirty/opt/degf all
fast together: 0.02 ms/iter), so this measures the genuine compiled
function from train/buffer_trainer.py:_build_state_fn — same code object
the out-of-core bench runs — against synthetic device buffers, no host
transfers. OUTCOME: with the forced host round-trip below, this measures
~22.7 ms/batch at the freebase86m buffer shape — confirming the round-4
scatter-floor profile; the transient "fast" readings were artifacts of
block_until_ready returning before donated computations execute.

    python bench_oocore_statefn.py [R] [NB]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 8
NRELS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
D = 50
B = 10_000
CAPACITY = 8
PSIZE = R // CAPACITY

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model, init_model_params
from marius_tpu.nn.optimizers import init_optimizer
from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer as BufferTrainer

enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING", output_dim=D),),))
model = Model(LINK_PREDICTION, enc,
              EdgeDecoder("COMPLEX", NRELS, D, use_inverse_relations=True))
cfg = NegativeSamplingConfig(num_chunks=10, negatives_per_positive=500,
                             degree_fraction=0.5)


class _Buf:
    psize = PSIZE
    buffer_rows = CAPACITY * PSIZE


t = BufferTrainer.__new__(BufferTrainer)
t.model = model
t.neg_config = cfg
t.batch_size = B
t.buffer = _Buf()
t.capacity = CAPACITY
t.mesh = None
t.has_rels = True
t.decoder_method = "CORRUPT_NODE"
t.num_relations = NRELS
t.train_filter_keys = None
t.nbr_configs = ()
t.hop_caps = ()
t.dense_accum = False
t.unique_cap = 2 * B + 2 * cfg.num_chunks * cfg.negatives_per_positive

state_fn = t._build_state_fn(NB)

rng = np.random.default_rng(0)
rows = _Buf.buffer_rows
edges = jnp.asarray(np.stack([rng.integers(0, rows, NB * B),
                              rng.integers(0, NRELS, NB * B),
                              rng.integers(0, rows, NB * B)], 1).astype(np.int32))
masks = jnp.asarray(np.ones((NB * B,), bool))
slot_valid = jnp.full((CAPACITY,), PSIZE, jnp.int32)
slot_parts = jnp.arange(CAPACITY, dtype=jnp.int32)
params = init_model_params(jax.random.key(1), model)
opt_state = init_optimizer(model.dense_optimizer, params)
values = jnp.full((rows, D), 1e-10, jnp.float32)
state = jnp.full((rows, D), 1e-10, jnp.float32)
dirty = jnp.zeros((rows,), bool)
key = jax.random.key(0)

t0 = time.perf_counter()
out = state_fn(values, state, params, opt_state, key, dirty, edges, masks,
               slot_valid, slot_parts, None, None, (None, None))
jax.block_until_ready(out[0][:2])
print(f"morph8 compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
carry = out[0]
t0 = time.perf_counter()
losses = []
for _ in range(REPS):
    (carry, lo) = state_fn(carry[0], carry[1], carry[2], carry[3], carry[4],
                           carry[5], edges, masks, slot_valid, slot_parts,
                           None, None, (None, None))
    losses.append(lo)
# force a real host round-trip on a value that depends on every batch —
# block_until_ready alone can return early under this runtime's deep
# async dispatch (morph8 first measured a physically impossible
# 0.00 ms/batch at NB=1254 without this)
_ = float(sum(jnp.asarray(l) for l in losses))
jax.block_until_ready(carry[:2])
dt = (time.perf_counter() - t0) / REPS / NB
print(f"morph8 REAL state_fn: {dt*1e3:.3f} ms/batch "
      f"({B/dt/1e6:.2f}M edges/s compute-side)", flush=True)
