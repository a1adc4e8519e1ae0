"""Frontier-prefix dedup + empirical hop caps (sampled GNN path, round 4).

The prefix layout guarantees: each hop's node set is a prefix of the next
(self rows never evicted), tight caps only drop NEW neighbor ids, drops are
masked exactly and counted (NeighborBatch.overflow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marius_tpu.data.graph import build_device_graph
from marius_tpu.data.samplers.neighbor import (
    NeighborSamplingConfig,
    estimate_hop_caps,
    estimate_hop_caps_empirical,
    sample_neighbor_batch,
)
from marius_tpu.ops.unique import prefix_unique_padded


def test_prefix_unique_basic():
    cur = jnp.asarray([5, 2, 9], jnp.int32)
    cmask = jnp.asarray([True, True, True])
    cands = jnp.asarray([2, 7, 7, 3, 9, 10], jnp.int32)  # 10 == fill
    r = prefix_unique_padded(cur, cmask, cands, size=8, fill_value=10)
    ids = np.asarray(r.ids)
    # prefix preserved verbatim
    np.testing.assert_array_equal(ids[:3], [5, 2, 9])
    # new ids 3, 7 appended in ascending order
    np.testing.assert_array_equal(ids[3:5], [3, 7])
    assert int(r.count) == 5 and int(r.overflow) == 0
    inv = np.asarray(r.inverse)
    for i, c in enumerate([2, 7, 7, 3, 9]):
        assert ids[inv[i]] == c


def test_prefix_unique_overflow_counts_and_maps_safely():
    cur = jnp.asarray([0, 1], jnp.int32)
    cmask = jnp.asarray([True, True])
    cands = jnp.asarray([2, 3, 4, 5, 6], jnp.int32)
    r = prefix_unique_padded(cur, cmask, cands, size=4, fill_value=7)
    # room for 2 new ids only; 3 distinct dropped
    assert int(r.overflow) == 3
    ids = np.asarray(r.ids)
    np.testing.assert_array_equal(ids[:4], [0, 1, 2, 3])
    # dropped candidates do NOT map to a slot holding their id
    inv = np.asarray(r.inverse)
    for i, c in enumerate([2, 3, 4, 5, 6]):
        if c in (2, 3):
            assert ids[inv[i]] == c
        else:
            assert ids[inv[i]] != c  # caller masks via this comparison


def _graph(n=200, e=1600, seed=0):
    rng = np.random.default_rng(seed)
    edges = np.unique(np.stack(
        [rng.integers(0, n, e), rng.integers(0, n, e)], axis=1), axis=0)
    return edges.astype(np.int32), build_device_graph(edges.astype(np.int32), n)


def test_prefix_sampler_hop_sets_nest():
    edges, g = _graph()
    cfgs = (NeighborSamplingConfig("UNIFORM", 4),
            NeighborSamplingConfig("UNIFORM", 4))
    caps = estimate_hop_caps(32, cfgs, 200)
    seeds = jnp.asarray(np.arange(32), jnp.int32)
    nb = sample_neighbor_batch(jax.random.key(0), g, seeds,
                               jnp.ones(32, bool), cfgs, caps)
    assert int(nb.overflow) == 0
    # self mapping invariant: every valid inner node's self_idx points at its
    # own id in the outer set (iota for prefix hops, id for saturated hops)
    for inner, imask, outer, layer in zip(nb.node_ids[1:], nb.node_masks[1:],
                                          nb.node_ids[:-1], nb.layers):
        inner, imask = np.asarray(inner), np.asarray(imask)
        outer = np.asarray(outer)
        sidx = np.asarray(layer.self_idx)
        np.testing.assert_array_equal(outer[sidx[imask]], inner[imask])


def test_prefix_sampler_tight_caps_truncate_loudly():
    edges, g = _graph()
    cfgs = (NeighborSamplingConfig("UNIFORM", 8),)
    seeds = jnp.asarray(np.arange(64), jnp.int32)
    tight = [64, 80]  # way below the real frontier
    nb = sample_neighbor_batch(jax.random.key(1), g, seeds,
                               jnp.ones(64, bool), cfgs, tight)
    assert int(nb.overflow) > 0
    # every unmasked neighbor slot maps to the id it sampled
    ids0 = np.asarray(nb.node_ids[0])
    layer = nb.layers[0]
    for idx, mask in ((layer.in_nbr_idx, layer.in_mask),
                      (layer.out_nbr_idx, layer.out_mask)):
        idx, mask = np.asarray(idx), np.asarray(mask)
        assert (ids0[idx[mask]] < 200).all()  # no fill rows unmasked


def test_prefix_sampler_matches_encoder_e2e():
    """Prefix layout produces the same per-seed encodings as an ALL frontier
    big enough to be exact (sampling keys differ by layout only when caps
    bind, so compare ALL mode where draws are deterministic)."""
    edges, g = _graph(80, 700, seed=3)
    from marius_tpu.data.samplers.neighbor import resolve_all_caps_from_edges
    cfgs = resolve_all_caps_from_edges(
        (NeighborSamplingConfig("ALL"), NeighborSamplingConfig("ALL")),
        edges, 80)
    caps = estimate_hop_caps(16, cfgs, 80)
    seeds = jnp.asarray(np.arange(16), jnp.int32)
    nb = sample_neighbor_batch(jax.random.key(0), g, seeds,
                               jnp.ones(16, bool), cfgs, caps)
    assert int(nb.overflow) == 0
    # hand-check one seed's 1-hop in-neighbors against the edge list
    ids1 = np.asarray(nb.node_ids[1])  # hop-1 set (outer of final layer)
    final = nb.layers[-1]
    s0_in = np.asarray(final.in_nbr_idx[0])[np.asarray(final.in_mask[0])]
    got = sorted(ids1[s0_in].tolist())
    want = sorted(edges[edges[:, -1] == 0][:, 0].tolist())
    assert got == want


def test_empirical_caps_bound_and_tighter():
    # sparse graph (mean degree ~3): the observed frontier is far below the
    # geometric worst case
    edges, _ = _graph(5000, 15000, seed=5)
    cfgs = (NeighborSamplingConfig("UNIFORM", 8),
            NeighborSamplingConfig("UNIFORM", 8))
    worst = estimate_hop_caps(100, cfgs, 5000)
    emp = estimate_hop_caps_empirical(edges, 5000, cfgs, 100, seed=0)
    assert len(emp) == len(worst)
    assert all(e <= w for e, w in zip(emp, worst))
    assert emp[-1] < worst[-1]  # actually tighter where worst case saturates


def test_empirical_caps_train_without_overflow_blowup():
    """Training with empirical caps stays sane: tiny truncation at most, and
    accuracy on the community graph still learns."""
    from tests.test_nc_e2e import community_graph, _gs_model, NUM_NODES
    from marius_tpu.train.nc import NodeClassificationTrainer
    edges, feats, labels = community_graph()
    model = _gs_model(num_layers=2)
    cfgs = (NeighborSamplingConfig("UNIFORM", 6),
            NeighborSamplingConfig("UNIFORM", 6))
    g = build_device_graph(edges, NUM_NODES)
    caps = estimate_hop_caps_empirical(edges, NUM_NODES, cfgs, 128, seed=1)
    tr = NodeClassificationTrainer(model, g, feats, labels,
                                   np.arange(600, dtype=np.int32), cfgs,
                                   batch_size=128, hop_caps=caps, seed=0)
    m = [tr.train_epoch() for _ in range(3)]
    assert all(np.isfinite(x["loss"]) for x in m)
    total_seen = 3 * (600 // 128 + 1) * sum(
        min(c, NUM_NODES) for c in caps[1:])
    # truncation, if any, is a tiny fraction of the frontier mass
    assert sum(x["truncated_frontier_ids"] for x in m) < 0.02 * total_seen


def test_empirical_caps_exact_for_low_degree_nodes():
    """ADVICE r4: the host simulation must mirror the device sampler's
    deg <= fanout semantics (take each true neighbor exactly once), not
    with-replacement draws — otherwise low-degree nodes contribute only
    ~63% of their neighbors and auto caps routinely overflow. Construction:
    every seed has exactly `fan` DISTINCT neighbors, all disjoint across
    seeds, so the true hop-1 unique count is b + b*fan; the cap must cover
    it even with margin 1.0."""
    import numpy as np

    from marius_tpu.data.samplers.neighbor import (
        NeighborSamplingConfig,
        estimate_hop_caps_empirical,
    )

    b, fan = 64, 8
    num_nodes = b + b * fan
    src = np.repeat(np.arange(b), fan)
    dst = b + np.arange(b * fan)
    edges = np.stack([src, dst], 1).astype(np.int32)
    cfgs = [NeighborSamplingConfig("UNIFORM", max_neighbors=fan,
                                   use_incoming=False, use_outgoing=True)]
    caps = estimate_hop_caps_empirical(
        edges, num_nodes, cfgs, b, seed=0, margin=1.0,
        seed_pool=np.arange(b))
    assert caps[1] >= b + b * fan, caps
