"""Partition-buffer + ordering tests (reference: test/cpp/unit/test_buffer.cpp
swap/admit/evict state machine + test_lp_buffer.py e2e on a small graph)."""

import numpy as np
import pytest

from marius_tpu.data.ordering import assign_edge_buckets, beta_ordering
from marius_tpu.storage.partition_buffer import PartitionBuffer

import jax


def test_beta_ordering_covers_all_pairs():
    for n, c in [(8, 4), (16, 8), (4, 2), (5, 3)]:
        states = beta_ordering(n, c, seed=1)
        covered = np.zeros((n, n), bool)
        for st in states:
            assert len(st) == c
            for i in st:
                for j in st:
                    covered[i, j] = True
        assert covered.all(), f"uncovered pairs for n={n}, c={c}"
        # every bucket assignable
        assignment = assign_edge_buckets(states, n)
        assert sum(len(a) for a in assignment) == n * n


def _total_admits(states):
    admits = len(states[0])
    prev = set(int(x) for x in states[0])
    for st in states[1:]:
        s = set(int(x) for x in st)
        admits += len(s - prev)
        prev = s
    return admits


def test_beta_ordering_swap_cost_pinned():
    """Total admits (each costs a psize x dim host<->HBM round trip) track the
    reference construction's analytic count: rounds shrink the on-disk set by
    c-1, each round admitting |on_disk| + (c-1), so
    total <= c + sum over rounds = c + (n-c) * (ceil((n-c)/(c-1)) + 3) / 2 + n
    — and never the unbounded blowup a bad eviction policy can give
    (ordering.cpp:78-126 is the construction being matched)."""
    for n, c in [(8, 4), (16, 8), (32, 8), (32, 16), (64, 16), (20, 3)]:
        for seed in range(3):
            states = beta_ordering(n, c, seed=seed)
            admits = _total_admits(states)
            d = n - c
            rounds = -(-d // (c - 1))
            analytic = c + d * rounds - (c - 1) * rounds * (rounds - 1) // 2 \
                + (c - 1) * rounds
            assert admits <= analytic, (n, c, seed, admits, analytic)
            # clean closed-form ceiling: quadratic streaming term + linear slack
            assert admits <= d * d / (2 * (c - 1)) + 3 * n + c, (n, c, admits)


def test_ordering_terminates_all_seeds():
    """Regression: the pre-round-4 coverage-greedy construction hung forever
    on ~1/3 of seeds (random evict could starve the last uncovered pair)."""
    from marius_tpu.data.ordering import comet_ordering
    for seed in range(20):
        beta_ordering(32, 8, seed=seed)
        comet_ordering(32, 8, 2, seed=seed)


def test_buffer_swap_state_machine():
    key = jax.random.key(0)
    buf = PartitionBuffer.create(key, num_nodes=37, dim=4,
                                 num_partitions=8, capacity=3)
    assert buf.psize == 5
    assert buf.part_valid_count(7) == 2  # 37 - 7*5

    buf.load([0, 1, 2])
    # mutate a resident row on device, then swap it out and verify writeback
    dev = np.array(buf.device_values)
    dev[0] = 99.0
    buf.device_values = jax.numpy.asarray(dev)
    buf.swap_to_state([1, 2, 3])
    # eviction writeback is async-deferred; it lands at the next drain point
    assert len(buf.pending_writebacks) == 1
    buf._drain_writebacks()
    assert buf.host_values[0, 0] == 99.0          # partition 0 written back
    assert set(int(p) for p in buf.resident) == {1, 2, 3}
    # slot reuse: partition 3 landed in partition 0's old slot
    assert buf.part_to_slot[3] == 0

    # global->local mapping follows slots
    ids = np.array([5, 10, 15])  # partitions 1, 2, 3
    local = buf.global_to_local(ids)
    np.testing.assert_array_equal(
        local, [buf.part_to_slot[1] * 5, buf.part_to_slot[2] * 5,
                buf.part_to_slot[3] * 5])

    with pytest.raises(AssertionError):
        buf.global_to_local(np.array([0]))  # partition 0 not resident

    buf.flush()
    # resident partitions written back; host table intact
    assert buf.host_values.shape == (40, 4)


def test_buffer_roundtrip_preserves_table():
    key = jax.random.key(1)
    buf = PartitionBuffer.create(key, num_nodes=32, dim=4,
                                 num_partitions=8, capacity=4)
    before = buf.host_values.copy()
    states = beta_ordering(8, 4, seed=0)
    buf.load(states[0])
    for st in states[1:]:
        buf.swap_to_state(st)
    buf.flush()
    np.testing.assert_allclose(buf.host_values, before)


def test_buffer_trainer_learns():
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    rng = np.random.default_rng(0)
    n, r, e = 64, 4, 2000
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int32)
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=16),),))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, 16))
    tr = PartitionBufferLPTrainer(
        model, n, r, edges, NegativeSamplingConfig(2, 8),
        batch_size=100, num_partitions=8, buffer_capacity=4)
    stats = tr.train(3)
    assert stats[-1]["loss"] < stats[0]["loss"]
    assert stats[0]["num_buffer_states"] > 1

    # TrainState view is usable by the standard evaluator
    from marius_tpu.train.evaluator import LinkPredictionEvaluator
    ev = LinkPredictionEvaluator(model, n, r, edges[:200], all_edges=edges,
                                 batch_size=100, filtered=True)
    res = ev.evaluate(tr.state)
    assert 0.0 < res["mrr"] <= 1.0


def test_buffer_config_e2e(tmp_path):
    """Config-driven out-of-core path (test_lp_buffer.py analogue)."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_lp

    ds = str(tmp_path / "ds")
    generate_random_dataset_lp(ds, num_nodes=100, num_edges=1000, num_relations=10)
    raw = {
        "model": {
            "learning_task": "LINK_PREDICTION",
            "encoder": {"layers": [[{"type": "EMBEDDING", "output_dim": 8}]]},
            "decoder": {"type": "DISTMULT", "options": {"input_dim": 8}},
            "loss": {"type": "SOFTMAX_CE"},
            "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.1}},
        },
        "storage": {
            "dataset": {"dataset_dir": ds},
            "embeddings": {"type": "PARTITION_BUFFER",
                           "options": {"num_partitions": 8, "buffer_capacity": 4}},
            "save_model": False,
        },
        "training": {"batch_size": 50,
                     "negative_sampling": {"num_chunks": 2,
                                           "negatives_per_positive": 8},
                     "num_epochs": 2},
        "evaluation": {"batch_size": 50,
                       "negative_sampling": {"filtered": True}},
    }
    result = marius_train(load_config(raw))
    assert len(result["epochs"]) == 2
    assert 0.0 < result["test"]["mrr"] <= 1.0


@pytest.mark.slow
def test_buffer_trainer_gnn_lp():
    """GNN-encoded LP over the partition buffer (graph_sage encoder, sampling
    restricted to the resident subgraph)."""
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    rng = np.random.default_rng(3)
    n, r, e = 80, 4, 1200
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=12),),
        (LayerConfig(layer_type="GNN", input_dim=12, output_dim=12,
                     gnn_type="GRAPH_SAGE", aggregator="MEAN"),),
    ))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, 12))
    tr = PartitionBufferLPTrainer(
        model, n, r, edges, NegativeSamplingConfig(2, 8),
        batch_size=100, num_partitions=4, buffer_capacity=2,
        nbr_configs=[NeighborSamplingConfig(max_neighbors=4)])
    stats = tr.train(3)
    assert stats[-1]["loss"] < stats[0]["loss"]

    # full-table view still evaluates (encoder runs on the FULL graph at eval)
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.train.evaluator import LinkPredictionEvaluator
    g = build_device_graph(edges, n, r)
    ev = LinkPredictionEvaluator(
        model, n, r, edges[:100], all_edges=edges, batch_size=100,
        filtered=True, graph=g,
        nbr_configs=[NeighborSamplingConfig(max_neighbors=4)])
    res = ev.evaluate(tr.state)
    assert 0.0 < res["mrr"] <= 1.0


def test_buffer_swap_shrink_and_regrow():
    """Regression: evicting without admitting must free slots for later use."""
    key = jax.random.key(2)
    buf = PartitionBuffer.create(key, num_nodes=40, dim=4,
                                 num_partitions=8, capacity=4)
    buf.load([0, 1, 2, 3])
    buf.swap_to_state([0, 1])            # evict 2, 3; admit nothing
    assert sorted(int(p) for p in buf.resident if p >= 0) == [0, 1]
    buf.swap_to_state([0, 1, 2, 3])      # 2, 3 must be re-admitted
    assert sorted(int(p) for p in buf.resident) == [0, 1, 2, 3]
    local = buf.global_to_local(np.array([10, 15]))  # partition 2, 3 heads
    assert (local >= 0).all()


def test_buffer_trainer_gnn_lp_with_features():
    """GNN-encoded LP over the buffer with FEATURE inputs partition-cached
    alongside the embedding table (slot layouts mirrored)."""
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    rng = np.random.default_rng(4)
    n, r, e, fd = 80, 4, 1200, 6
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int32)
    feats = rng.standard_normal((n, fd)).astype(np.float32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=10),
         LayerConfig(layer_type="FEATURE", output_dim=fd)),
        (LayerConfig(layer_type="REDUCTION", reduction="CONCAT",
                     output_dim=16),),
        (LayerConfig(layer_type="GNN", input_dim=16, output_dim=16,
                     gnn_type="GRAPH_SAGE", aggregator="MEAN"),),
    ))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, 16))
    tr = PartitionBufferLPTrainer(
        model, n, r, edges, NegativeSamplingConfig(2, 8),
        batch_size=100, num_partitions=4, buffer_capacity=2,
        nbr_configs=[NeighborSamplingConfig(max_neighbors=4)],
        features=feats)
    stats = tr.train(3)
    assert stats[-1]["loss"] < stats[0]["loss"]


def test_async_writeback_evict_readmit_roundtrip():
    """Evictions are deferred (async device->host); a later swap that
    re-admits an evicted partition must still see its latest values, because
    pending writebacks drain before admit blocks are read."""
    import jax
    import numpy as np

    from marius_tpu.storage.partition_buffer import PartitionBuffer

    pb = PartitionBuffer.create(jax.random.key(0), num_nodes=64, dim=4,
                                num_partitions=8, capacity=2)
    pb.load([0, 1])
    # mutate partition 0's device rows so the writeback value is distinctive
    marker = jax.numpy.full((pb.psize, 4), 7.5)
    pb.device_values = pb.device_values.at[:pb.psize].set(marker)

    pb.swap_to_state([1, 2])        # evicts 0 -> pending, not yet on host
    assert len(pb.pending_writebacks) == 1
    pb.swap_to_state([1, 0])        # re-admits 0: drain must land first
    slot = int(pb.part_to_slot[0])
    got = np.asarray(pb.device_values[slot * pb.psize:(slot + 1) * pb.psize])
    np.testing.assert_allclose(got, 7.5)
    # host copy landed too
    np.testing.assert_allclose(pb.host_values[:pb.psize], 7.5)
    pb.flush()
    assert not pb.pending_writebacks


def test_buffer_trainer_shallow_features():
    """Shallow FEATURE encoders over the partition buffer (the reference's
    distmult_feat family on disk storage, io.cpp:311-345): feature rows ride
    the slot-mirrored partition cache and feed encoder_forward directly —
    no GNN stages required. Covers EMBEDDING+FEATURE concat and an explicit
    CONCAT REDUCTION, train + filtered eval off the TrainState view."""
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer
    from marius_tpu.train.evaluator import LinkPredictionEvaluator
    from marius_tpu.nn.model import LINK_PREDICTION, Model

    rng = np.random.default_rng(5)
    n, r, e, fd = 80, 4, 1200, 6
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int32)
    feats = rng.standard_normal((n, fd)).astype(np.float32)
    for stages, dim in (
        ((  # implicit concat of parallel stage outputs
            (LayerConfig(layer_type="EMBEDDING", output_dim=10),
             LayerConfig(layer_type="FEATURE", output_dim=fd)),
        ), 10 + fd),
        ((  # explicit CONCAT reduction stage
            (LayerConfig(layer_type="EMBEDDING", output_dim=10),
             LayerConfig(layer_type="FEATURE", output_dim=fd)),
            (LayerConfig(layer_type="REDUCTION", reduction="CONCAT",
                         output_dim=16),),
        ), 16),
    ):
        model = Model(LINK_PREDICTION, EncoderConfig(stages=stages),
                      EdgeDecoder("DISTMULT", r, dim))
        tr = PartitionBufferLPTrainer(
            model, n, r, edges, NegativeSamplingConfig(2, 8),
            batch_size=100, num_partitions=4, buffer_capacity=2,
            features=feats)
        stats = tr.train(3)
        losses = [s["loss"] for s in stats]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        ev = LinkPredictionEvaluator(
            model, n, r, edges[:200], all_edges=edges, batch_size=100,
            filtered=True, features=tr.features)
        res = ev.evaluate(tr.state)
        assert 0.0 < res["mrr"] <= 1.0


def test_buffer_shallow_feature_config_e2e(tmp_path):
    """Config-driven shallow EMBEDDING+FEATURE LP over PARTITION_BUFFER
    storage (reference matrix: distmult_feat x part_buffer)."""
    from marius_tpu.config.schema import load_config
    from marius_tpu.manager import marius_train
    from marius_tpu.storage.dataset import load_stats, save_node_array, save_stats
    from marius_tpu.tools.preprocess import generate_random_dataset_lp

    ds = str(tmp_path / "ds")
    generate_random_dataset_lp(ds, num_nodes=100, num_edges=1000,
                               num_relations=10)
    rng = np.random.default_rng(0)
    fd = 6
    save_node_array(ds, "features",
                    rng.standard_normal((100, fd)).astype(np.float32))
    stats = load_stats(ds)
    stats.feature_dim = fd
    save_stats(ds, stats)

    raw = {
        "model": {
            "learning_task": "LINK_PREDICTION",
            "encoder": {"layers": [[
                {"type": "EMBEDDING", "output_dim": 8},
                {"type": "FEATURE", "output_dim": fd},
            ]]},
            "decoder": {"type": "DISTMULT", "options": {"input_dim": 8 + fd}},
            "loss": {"type": "SOFTMAX_CE"},
            "dense_optimizer": {"type": "ADAM",
                                "options": {"learning_rate": 0.1}},
        },
        "storage": {
            "dataset": {"dataset_dir": ds},
            "embeddings": {"type": "PARTITION_BUFFER",
                           "options": {"num_partitions": 8,
                                       "buffer_capacity": 4}},
            "save_model": False,
        },
        "training": {"batch_size": 50,
                     "negative_sampling": {"num_chunks": 2,
                                           "negatives_per_positive": 8},
                     "num_epochs": 2},
        "evaluation": {"batch_size": 50,
                       "negative_sampling": {"filtered": True}},
    }
    result = marius_train(load_config(raw))
    assert len(result["epochs"]) == 2
    assert 0.0 < result["test"]["mrr"] <= 1.0
