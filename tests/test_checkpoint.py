"""Checkpoint save/load roundtrip (checkpointer.cpp parity), incl. PRNG keys."""

import os

import numpy as np

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.storage import checkpoint as ckpt
from marius_tpu.train.trainer import LinkPredictionTrainer
from tests.test_lp_e2e import _model, generate_random_lp_dataset, NUM_NODES, NUM_RELS


def test_checkpoint_roundtrip(tmp_path):
    train, _, _ = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=10),
        batch_size=100, seed=0)
    trainer.train(1)

    d = str(tmp_path / "ckpt")
    ckpt.save_state(d, trainer.state, {"note": "test"})
    restored, meta = ckpt.load_state(d, trainer.state)
    assert meta["note"] == "test"
    np.testing.assert_array_equal(
        np.asarray(restored.table.values), np.asarray(trainer.state.table.values))
    np.testing.assert_array_equal(
        np.asarray(restored.table.state), np.asarray(trainer.state.table.state))
    assert int(restored.epoch) == int(trainer.state.epoch)

    # restored state must be usable: continue training one more epoch
    trainer.state = restored
    stats = trainer.train(1)
    assert np.isfinite(stats[0]["loss"])


def test_checkpoint_without_optim_state(tmp_path):
    """save_state=false interval checkpoints omit optimizer leaves
    (CheckpointConfig.save_state gating, checkpointer.cpp:30): the snapshot
    is evaluable, resumes with fresh optimizer state, and reports what was
    dropped via meta['missing_leaves']."""
    train, _, _ = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=10),
        batch_size=100, seed=0)
    trainer.train(1)

    path = ckpt.create_checkpoint(str(tmp_path), trainer.state, epoch=1,
                                  save_optim_state=False)
    names = set(os.listdir(path))
    assert "table__values.npy" in names
    assert not any(n.startswith(("opt_state", "table__state")) for n in names)

    saved_values = np.asarray(trainer.state.table.values)  # copy: train() donates
    trainer.train(1)          # mutate so template differs from the snapshot
    template = trainer.state
    restored, meta = ckpt.load_state(path, template)
    assert meta["missing_leaves"]
    assert all(n.startswith(ckpt.OPTIM_STATE_PREFIXES)
               for n in meta["missing_leaves"])
    # model leaves come from the snapshot; optimizer leaves from the template
    np.testing.assert_array_equal(
        np.asarray(restored.table.values), saved_values)
    np.testing.assert_array_equal(
        np.asarray(restored.table.state), np.asarray(template.table.state))
    assert not np.array_equal(np.asarray(restored.table.values),
                              np.asarray(template.table.values))


def test_interval_checkpoints(tmp_path):
    train, _, _ = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=10),
        batch_size=100, seed=0)
    trainer.train(1)
    path = ckpt.create_checkpoint(str(tmp_path), trainer.state, epoch=3)
    assert os.path.basename(path) == "checkpoint_3"
    _, meta = ckpt.load_state(path, trainer.state)
    assert meta["epochs_processed"] == 3


def test_missing_model_leaf_raises(tmp_path):
    """A checkpoint missing a MODEL leaf (mismatched/corrupt dir) must raise
    instead of silently evaluating fresh-init values; only optimizer leaves
    (save_state=false) fall back to the template."""
    import pytest

    train, _, _ = generate_random_lp_dataset()
    trainer = LinkPredictionTrainer(
        _model(), NUM_NODES, NUM_RELS, train,
        NegativeSamplingConfig(num_chunks=5, negatives_per_positive=10),
        batch_size=100, seed=0)
    d = str(tmp_path / "ck")
    ckpt.save_state(d, trainer.state)
    os.remove(os.path.join(d, "table__values.npy"))
    with pytest.raises(FileNotFoundError, match="table/values"):
        ckpt.load_state(d, trainer.state)
