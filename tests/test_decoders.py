"""Edge decoder scoring vs. reference math (comparators.cpp, relation_operators.cpp,
distmult/complex/transe.cpp, decoder_methods.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from marius_tpu.nn.decoders.edge import EdgeDecoder, complex_hadamard


RNG = np.random.default_rng(42)
B, C, N, D = 12, 3, 6, 16  # batch, chunks, negs-per-chunk, dim


def _setup(decoder_type):
    dec = EdgeDecoder(decoder_type, num_relations=5, embedding_dim=D)
    params = dec.init_params()
    # random relation tables for a meaningful test
    params["relations"] = jnp.array(RNG.normal(size=(5, D)).astype(np.float32))
    params["inverse_relations"] = jnp.array(RNG.normal(size=(5, D)).astype(np.float32))
    src = RNG.normal(size=(B, D)).astype(np.float32)
    dst = RNG.normal(size=(B, D)).astype(np.float32)
    rel = RNG.integers(0, 5, size=(B,)).astype(np.int32)
    negs = RNG.normal(size=(C, N, D)).astype(np.float32)
    return dec, params, src, dst, rel, negs


def test_distmult_scores():
    dec, params, src, dst, rel, negs = _setup("DISTMULT")
    pos, neg, inv_pos, inv_neg = dec.node_corrupt_forward(
        params, jnp.array(src), jnp.array(dst), jnp.array(rel),
        jnp.array(negs), jnp.array(negs))

    rels = np.asarray(params["relations"])[rel]
    adj = src * rels
    want_pos = (adj * dst).sum(-1)
    np.testing.assert_allclose(np.asarray(pos), want_pos, rtol=1e-5)

    # chunked negatives: edge i in chunk i // (B/C)
    adj_c = adj.reshape(C, B // C, D)
    want_neg = np.einsum("cbd,cnd->cbn", adj_c, negs).reshape(B, N)
    np.testing.assert_allclose(np.asarray(neg), want_neg, rtol=1e-4)

    inv_rels = np.asarray(params["inverse_relations"])[rel]
    want_inv_pos = ((dst * inv_rels) * src).sum(-1)
    np.testing.assert_allclose(np.asarray(inv_pos), want_inv_pos, rtol=1e-5)
    assert inv_neg.shape == (B, N)


def test_complex_hadamard_matches_complex_multiply():
    x = RNG.normal(size=(4, D)).astype(np.float32)
    r = RNG.normal(size=(4, D)).astype(np.float32)
    got = np.asarray(complex_hadamard(jnp.array(x), jnp.array(r)))
    h = D // 2
    xc = x[:, :h] + 1j * x[:, h:]
    rc = r[:, :h] + 1j * r[:, h:]
    prod = xc * rc
    want = np.concatenate([prod.real, prod.imag], axis=1).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_complex_init_real_ones():
    dec = EdgeDecoder("COMPLEX", num_relations=3, embedding_dim=D)
    params = dec.init_params()
    rels = np.asarray(params["relations"])
    np.testing.assert_array_equal(rels[:, :D // 2], 1.0)
    np.testing.assert_array_equal(rels[:, D // 2:], 0.0)


def test_transe_l2_scores():
    dec, params, src, dst, rel, negs = _setup("TRANSE")
    pos, neg, _, _ = dec.node_corrupt_forward(
        params, jnp.array(src), jnp.array(dst), jnp.array(rel),
        jnp.array(negs), jnp.array(negs))
    rels = np.asarray(params["relations"])[rel]
    adj = src + rels
    # torch pairwise_distance adds eps=1e-6 to the diff
    want_pos = np.sqrt((np.square(adj - dst + 1e-6)).sum(-1))
    np.testing.assert_allclose(np.asarray(pos), want_pos, rtol=1e-4)
    adj_c = adj.reshape(C, B // C, D)
    d2 = (np.square(adj_c)[..., None, :].sum(-1) +
          np.square(negs)[:, None, :, :].sum(-1) -
          2 * np.einsum("cbd,cnd->cbn", adj_c, negs))
    want_neg = np.sqrt(np.maximum(d2, 1e-8)).reshape(B, N)
    np.testing.assert_allclose(np.asarray(neg), want_neg, rtol=1e-3, atol=1e-4)


def test_distmult_relations_init_ones():
    dec = EdgeDecoder("DISTMULT", num_relations=4, embedding_dim=8)
    p = dec.init_params()
    np.testing.assert_array_equal(np.asarray(p["relations"]), 1.0)
    assert "inverse_relations" in p  # inverse_edges default True (datatypes.py:150)


def test_rel_corrupt_forward():
    """Corrupt-relation scoring (decoder_methods.cpp rel_corrupt_forward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from marius_tpu.nn.decoders.edge import EdgeDecoder

    rng = np.random.default_rng(0)
    b, d, r, c, n = 8, 6, 5, 2, 3
    dec = EdgeDecoder("DISTMULT", r, d)
    params = dec.init_params()
    params["relations"] = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    rel = jnp.asarray(rng.integers(0, r, b).astype(np.int32))
    neg_rel = jnp.asarray(rng.integers(0, r, (c, n)).astype(np.int32))

    pos, neg, inv_pos, inv_neg = dec.rel_corrupt_forward(params, src, dst, rel, neg_rel)
    assert pos.shape == (b,) and neg.shape == (b, n)
    assert inv_pos.shape == (b,) and inv_neg.shape == (b, n)
    # manual check: batch row i in chunk i//(b//c) scored against that chunk's
    # sampled relations
    R = np.asarray(params["relations"])
    IR = np.asarray(params["inverse_relations"])
    s, t = np.asarray(src), np.asarray(dst)
    for i in [0, 5]:
        chunk = i // (b // c)
        for j in range(n):
            expected = np.sum(s[i] * R[int(neg_rel[chunk, j])] * t[i])
            np.testing.assert_allclose(float(neg[i, j]), expected, rtol=1e-5)
            inv_expected = np.sum(t[i] * IR[int(neg_rel[chunk, j])] * s[i])
            np.testing.assert_allclose(float(inv_neg[i, j]), inv_expected,
                                       rtol=1e-5)


def test_rel_all_scores():
    """Exhaustive per-relation scoring used by rel-corrupt evaluation."""
    import jax.numpy as jnp
    import numpy as np
    from marius_tpu.nn.decoders.edge import EdgeDecoder

    rng = np.random.default_rng(3)
    b, d, r = 4, 6, 7
    dec = EdgeDecoder("DISTMULT", r, d)
    params = dec.init_params()
    params["relations"] = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    scores = dec.rel_all_scores(params, src, dst)
    assert scores.shape == (b, r)
    R = np.asarray(params["relations"])
    s, t = np.asarray(src), np.asarray(dst)
    for i in range(b):
        for j in range(r):
            np.testing.assert_allclose(float(scores[i, j]),
                                       np.sum(s[i] * R[j] * t[i]), rtol=1e-4)
