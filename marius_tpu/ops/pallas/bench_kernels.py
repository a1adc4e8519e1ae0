"""Benchmark Pallas kernels vs their XLA formulations on the attached device.

Run: python -m marius_tpu.ops.pallas.bench_kernels
Prints per-op timings; used to decide the default backend (tune.py).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(f, *args, n=100):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e6


def main():
    from marius_tpu.ops.pallas.adagrad import sparse_adagrad_update_pallas
    from marius_tpu.ops.pallas.gather import gather_rows_pallas

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}")
    for N, d, K in [(14541, 128, 12288), (100_000, 128, 12288),
                    (1_000_000, 128, 8192), (1_000_000, 256, 8192)]:
        table = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, N, K).astype(np.int32))

        xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        t_xla = _timeit(xla_gather, table, ids)
        t_pl = _timeit(gather_rows_pallas, table, ids)
        print(f"gather  N={N:>9} d={d:>3} K={K}: "
              f"xla={t_xla:7.1f}us pallas={t_pl:7.1f}us "
              f"({'pallas' if t_pl < t_xla else 'xla'} wins)")

        state = jnp.abs(jnp.asarray(rng.standard_normal((N, d)).astype(np.float32)))
        uids = jnp.asarray(rng.permutation(N)[:K].astype(np.int32))
        grads = jnp.asarray(rng.standard_normal((K, d)).astype(np.float32))

        @jax.jit
        def xla_adagrad(values, st, i, g):
            new_rows = jnp.take(st, i, axis=0) + g * g
            delta = -0.1 * g / (jnp.sqrt(new_rows) + 1e-10)
            return (values.at[i].add(delta, mode="drop"),
                    st.at[i].set(new_rows, mode="drop"))

        t_xla = _timeit(xla_adagrad, table, state, uids, grads)
        t_pl = _timeit(
            lambda v, s, i, g: sparse_adagrad_update_pallas(v + 0, s + 0, i, g, 0.1),
            table, state, uids, grads)
        print(f"adagrad N={N:>9} d={d:>3} K={K}: "
              f"xla={t_xla:7.1f}us pallas={t_pl:7.1f}us "
              f"({'pallas' if t_pl < t_xla else 'xla'} wins)")


def bench_gather_sum():
    """Fused bucketed gather-sum vs XLA gather+reduce at arxiv-like bucket
    shapes (total slots ~2E = 2.33M across buckets; here per-bucket)."""
    from marius_tpu.ops.pallas.nbr_sum import gather_sum_pallas

    rng = np.random.default_rng(1)
    print(f"device: {jax.devices()[0].device_kind}")
    for N, d, n, cap, dt in [
            (169_344, 128, 120_000, 8, np.float32),
            (169_344, 128, 40_000, 32, np.float32),
            (169_344, 128, 4_000, 256, np.float32),
            (169_344, 128, 64, 8192, np.float32),
            (169_344, 128, 120_000, 8, jnp.bfloat16),
            (169_344, 128, 40_000, 32, jnp.bfloat16)]:
        x = jnp.asarray(rng.standard_normal((N, d)), dtype=dt)
        x_pad = jnp.concatenate([x, jnp.zeros((1, d), dt)], 0)
        ids = jnp.asarray(rng.integers(0, N, (n, cap)).astype(np.int32))

        xla = jax.jit(lambda xp, i: jnp.sum(jnp.take(xp, i, axis=0), axis=1))
        t_xla = _timeit(xla, x_pad, ids, n=20)
        t_pl = _timeit(gather_sum_pallas, x_pad, ids, n=20)
        name = "bf16" if dt == jnp.bfloat16 else "f32"
        print(f"gsum {name} n={n:>7} cap={cap:>5} ({n*cap/1e6:.2f}M slots): "
              f"xla={t_xla:8.1f}us pallas={t_pl:8.1f}us "
              f"({'pallas' if t_pl < t_xla else 'xla'} wins)")


if __name__ == "__main__":
    main()
    bench_gather_sum()
