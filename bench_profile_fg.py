"""Profile the full-graph NC epoch on the real TPU: trace + op breakdown.
Run detached: setsid nohup python bench_profile_fg.py > /tmp/prof_fg.log 2>&1 &
"""
import time

import jax

import bench_nc_full as B

trainer = B.build_trainer(True, dtype=None)  # f32 full-graph
print("init done", flush=True)
t0 = time.perf_counter()
trainer.train_epoch()
print("first epoch:", round(time.perf_counter() - t0, 1), "s", flush=True)
for tag in ["warm2", "warm3"]:
    t0 = time.perf_counter()
    s = trainer.train_epoch()
    print(tag, round(time.perf_counter() - t0, 2), "s",
          round(s["nodes_per_sec"]), "nodes/s", flush=True)
with jax.profiler.trace("/tmp/fg_trace"):
    trainer.train_epoch()
    jax.block_until_ready(trainer.state.params)
print("trace written to /tmp/fg_trace", flush=True)
try:
    from marius_tpu.reporting.profiling import op_breakdown
    print(op_breakdown("/tmp/fg_trace"))
except Exception as e:
    print("op_breakdown failed:", e)
