"""End-to-end link prediction on a synthetic random graph.

Mirrors the reference's main test strategy (test/python/bindings/end_to_end/
test_lp_basic.py + test/test_data/generate.py:186): tiny random KG, train a few
epochs, assert training runs, loss decreases, and filtered MRR beats the random
baseline (a model memorizing 1000 edges over 100 nodes should rank far above
chance)."""

import numpy as np
import pytest

from marius_tpu.data.dataloader import split_edges
from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.trainer import LinkPredictionTrainer

NUM_NODES = 100
NUM_RELS = 10
NUM_EDGES = 1000
DIM = 16


def generate_random_lp_dataset(seed=0):
    """100 nodes / 1000 edges / 10 rels, 0.9/0.05/0.05 (test_lp_basic.py:41-48)."""
    rng = np.random.default_rng(seed)
    edges = np.stack([
        rng.integers(0, NUM_NODES, NUM_EDGES),
        rng.integers(0, NUM_RELS, NUM_EDGES),
        rng.integers(0, NUM_NODES, NUM_EDGES),
    ], axis=1).astype(np.int32)
    edges = np.unique(edges, axis=0)
    return split_edges(edges, 0.9, 0.05, seed=seed)


def _model(decoder_type="DISTMULT", loss="SOFTMAX_CE"):
    encoder = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=DIM),),
    ))
    return Model(
        learning_task="LINK_PREDICTION",
        encoder=encoder,
        decoder=EdgeDecoder(decoder_type, NUM_RELS, DIM),
        loss_type=loss,
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.1),
        sparse_lr=0.1,
    )


@pytest.mark.parametrize("decoder_type", ["DISTMULT", "COMPLEX", "TRANSE"])
def test_lp_train_runs(decoder_type):
    train, valid, test = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(decoder_type), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0)
    stats = trainer.train(2)
    assert np.isfinite(stats[0]["loss"])
    assert np.isfinite(stats[1]["loss"])


def test_lp_distmult_learns_and_ranks():
    train, valid, test = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=50),
        batch_size=100, seed=0)
    stats = trainer.train(8)
    assert stats[-1]["loss"] < stats[0]["loss"], "loss should decrease"

    # filtered MRR on the training edges should be far above chance because a
    # d=16 DistMult can memorize ~900 edges over 100 nodes
    all_edges = np.concatenate([train, valid, test])
    evaluator = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, train[:200],
        all_edges=all_edges, batch_size=100, filtered=True)
    res = evaluator.evaluate(trainer.state)
    assert res["num_evaluated"] == 400  # both directions (inverse relations)
    # 8 epochs of memorizing ~900 random triples with d=16 reaches ~0.24 MRR
    # (keeps climbing past 0.34 at 40 epochs); random-chance MRR is ~0.052.
    assert res["mrr"] > 0.2, f"train-set filtered MRR too low: {res['mrr']}"
    random_mrr = sum(1.0 / r for r in range(1, NUM_NODES + 1)) / NUM_NODES
    assert res["mrr"] > 3 * random_mrr


def test_lp_unfiltered_eval_runs():
    train, valid, test = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0)
    trainer.train(1)
    evaluator = LinkPredictionEvaluator(
        trainer.model, NUM_NODES, NUM_RELS, test,
        batch_size=50, filtered=False,
        neg_config=NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20))
    res = evaluator.evaluate(trainer.state)
    assert res["num_evaluated"] > 0
    assert 0.0 < res["mrr"] <= 1.0


def test_train_filter_keys():
    """Training with filtered=true corrupts against known edges masked."""
    from marius_tpu.ops.edge_keys import build_edge_key_set
    train, valid, test = generate_random_lp_dataset()
    keys = (build_edge_key_set(train, corrupt_dst=True),
            build_edge_key_set(train, corrupt_dst=False))
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0, train_filter_keys=keys)
    stats = trainer.train(1)
    assert np.isfinite(stats[0]["loss"])


def test_host_tiled_eval_matches_device_eval():
    """evaluate_from_host_table must reproduce the in-HBM streamed filtered
    MRR exactly (table streamed in node tiles, edges in slices)."""
    train, valid, test = generate_random_lp_dataset()
    model = _model()
    trainer = LinkPredictionTrainer(
        model, NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0)
    trainer.train(2)
    all_edges = np.concatenate([train, valid, test])
    ev = LinkPredictionEvaluator(model, NUM_NODES, NUM_RELS, test,
                                 all_edges=all_edges, batch_size=50,
                                 filtered=True)
    res_dev = ev.evaluate(trainer.state)
    host = np.asarray(trainer.state.table.values)
    ev.profile_host_eval = True   # per-phase accounting (bench_eval_scale)
    res_host = ev.evaluate_from_host_table(
        host, trainer.state.params, edge_slice=32, node_tile=16)
    assert abs(res_dev["mrr"] - res_host["mrr"]) < 1e-5
    assert abs(res_dev["mean_rank"] - res_host["mean_rank"]) < 1e-3
    tm = ev.last_host_eval_timings
    assert tm["tiles"] == -(-NUM_NODES // 16)
    assert tm["transfer_s"] >= 0 and tm["compute_s"] > 0
    assert tm["table_bytes"] == host.size * host.itemsize


def test_training_is_exactly_reproducible():
    """Same seed -> bit-identical losses and tables (the reference's hogwild
    pipeline cannot promise this; the compiled PRNG-keyed epoch can)."""
    train, valid, test = generate_random_lp_dataset()

    def run():
        tr = LinkPredictionTrainer(
            _model(), NUM_NODES, NUM_RELS, train,
            NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
            batch_size=100, seed=42)
        stats = tr.train(2)
        return stats, np.asarray(tr.state.table.values)

    (s1, t1), (s2, t2) = run(), run()
    assert s1[0]["loss"] == s2[0]["loss"]
    assert s1[1]["loss"] == s2[1]["loss"]
    np.testing.assert_array_equal(t1, t2)


def test_filtered_eval_hub_fallback_matches_fast_path(monkeypatch):
    """When tail_cap exceeds TAIL_CAP_LIMIT the evaluator falls back to the
    per-chunk membership test — identical ranks either way."""
    import marius_tpu.train.evaluator as EVM
    train, valid, test = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=20),
        batch_size=100, seed=0)
    trainer.train(1)
    all_edges = np.concatenate([train, valid, test])

    ev_fast = LinkPredictionEvaluator(_model(), NUM_NODES, NUM_RELS, test,
                                      all_edges=all_edges, batch_size=50,
                                      filtered=True)
    res_fast = ev_fast.evaluate(trainer.state)
    monkeypatch.setattr(EVM, "TAIL_CAP_LIMIT", 1)  # force the fallback
    ev_slow = LinkPredictionEvaluator(_model(), NUM_NODES, NUM_RELS, test,
                                      all_edges=all_edges, batch_size=50,
                                      filtered=True)
    res_slow = ev_slow.evaluate(trainer.state)
    assert abs(res_fast["mrr"] - res_slow["mrr"]) < 1e-6
    host = np.asarray(trainer.state.table.values)
    res_host = ev_slow.evaluate_from_host_table(
        host, trainer.state.params, edge_slice=32, node_tile=16)
    assert abs(res_fast["mrr"] - res_host["mrr"]) < 1e-5


def test_transfer_block_smaller_than_chunk(monkeypatch):
    """Regression: a block with DIRECT_BYTES < nbytes < CHUNK_BYTES must not
    take a negative tail span (silently misplaced rows)."""
    from marius_tpu.storage import transfer
    monkeypatch.setattr(transfer, "DIRECT_BYTES", 1024)
    monkeypatch.setattr(transfer, "CHUNK_BYTES", 1 << 20)  # chunk >> block
    rng = np.random.default_rng(0)
    host = rng.standard_normal((500, 7)).astype(np.float32)  # 14 KB
    buf = transfer.alloc_rows(600, 7, np.float32)
    buf = transfer.write_rows(buf, host, 50)
    np.testing.assert_array_equal(transfer.read_rows(buf, 50, 500), host)
