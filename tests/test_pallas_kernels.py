"""Pallas kernel correctness (interpret mode on CPU; compiled path exercises
the same kernel code on TPU via gather_rows_auto)."""

import numpy as np
import pytest
import jax.numpy as jnp

from marius_tpu.ops.pallas import gather_rows_auto
from marius_tpu.ops.pallas.adagrad import sparse_adagrad_update_pallas
from marius_tpu.ops.pallas.gather import gather_rows_pallas


def test_gather_kernel_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((777, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 777, 2048).astype(np.int32))
    out = gather_rows_pallas(table, ids, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(ids)])


def test_adagrad_kernel_matches_reference():
    rng = np.random.default_rng(1)
    N, d, K = 600, 128, 256
    vals = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    state = jnp.abs(jnp.asarray(rng.standard_normal((N, d)).astype(np.float32)))
    uids = rng.permutation(N)[:K].astype(np.int32)
    grads = jnp.asarray(rng.standard_normal((K, d)).astype(np.float32))
    v0, s0 = np.array(vals), np.array(state)
    nv, ns = sparse_adagrad_update_pallas(vals, state, jnp.asarray(uids),
                                          grads, 0.1, interpret=True)
    exp_s = s0.copy()
    exp_s[uids] += np.asarray(grads) ** 2
    exp_v = v0.copy()
    exp_v[uids] -= 0.1 * np.asarray(grads) / (np.sqrt(exp_s[uids]) + 1e-10)
    np.testing.assert_allclose(np.asarray(ns), exp_s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), exp_v, atol=1e-5)
    # untouched rows bit-identical
    rest = np.setdiff1d(np.arange(N), uids)
    np.testing.assert_array_equal(np.asarray(nv)[rest], v0[rest])


def test_gather_rows_auto_fallback():
    # CPU backend + unaligned dim -> jnp.take path, any id count
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((100, 50)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100, 37).astype(np.int32))
    out = gather_rows_auto(table, ids)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(ids)])


@pytest.mark.slow
def test_gather_sum_kernel_matches_reference():
    """Fused bucketed gather-sum == x_pad[ids].sum(1) across bucket shapes,
    including sentinel padding slots and f32 accumulation for bf16 input."""
    import jax.numpy as jnp

    from marius_tpu.ops.pallas.nbr_sum import gather_sum_pallas

    rng = np.random.default_rng(3)
    N, d = 60, 128
    x = rng.standard_normal((N, d)).astype(np.float32)
    x_pad = jnp.asarray(np.concatenate([x, np.zeros((1, d), np.float32)], 0))
    for n, cap in [(17, 3), (5, 1), (64, 40), (3, 700)]:
        ids = rng.integers(0, N + 1, (n, cap)).astype(np.int32)  # N = sentinel
        out = gather_sum_pallas(x_pad, jnp.asarray(ids), interpret=True)
        ref = np.concatenate([x, np.zeros((1, d))], 0)[ids].sum(axis=1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    xb = (rng.standard_normal((N, d)) * 0.01).astype(jnp.bfloat16)
    xb_pad = jnp.concatenate([jnp.asarray(xb), jnp.zeros((1, d), jnp.bfloat16)], 0)
    ids = jnp.asarray(rng.integers(0, N, (4, 50)).astype(np.int32))
    out = gather_sum_pallas(xb_pad, ids, interpret=True)
    ref = np.asarray(xb_pad, np.float32)[np.asarray(ids)].sum(1)
    # f32 accumulation: only the final bf16 rounding remains
    assert np.abs(np.asarray(out, np.float32) - ref).max() < 1e-2


def test_gather_sum_auto_fallback_cpu():
    import jax.numpy as jnp

    from marius_tpu.ops.pallas import gather_sum_auto

    rng = np.random.default_rng(4)
    x_pad = jnp.asarray(rng.standard_normal((21, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 21, (9, 4)).astype(np.int32))
    out = gather_sum_auto(x_pad, ids)   # CPU -> XLA route
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x_pad)[np.asarray(ids)].sum(1),
                               rtol=1e-6)
