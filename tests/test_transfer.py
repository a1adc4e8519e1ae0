"""Chunked host<->device transfers + dirty-row writeback exactness."""

import numpy as np
import pytest

from marius_tpu.storage import transfer


def test_write_read_roundtrip_chunked(monkeypatch):
    # force multi-chunk paths with tiny chunk/direct thresholds
    monkeypatch.setattr(transfer, "CHUNK_BYTES", 4096)
    monkeypatch.setattr(transfer, "DIRECT_BYTES", 2048)
    rng = np.random.default_rng(0)
    host = rng.standard_normal((1000, 7)).astype(np.float32)  # 28 B rows
    buf = transfer.alloc_rows(1500, 7, np.float32)
    buf = transfer.write_rows(buf, host, 300)
    out = transfer.read_rows(buf, 300, 1000)
    np.testing.assert_array_equal(out, host)
    # untouched rows stay zero
    assert not np.asarray(buf[:300]).any()
    assert not np.asarray(buf[1300:]).any()


def test_write_rows_tail_overlap(monkeypatch):
    monkeypatch.setattr(transfer, "CHUNK_BYTES", 4000)   # 142 rows of 28 B
    monkeypatch.setattr(transfer, "DIRECT_BYTES", 1)
    rng = np.random.default_rng(1)
    host = rng.standard_normal((355, 7)).astype(np.float32)  # non-multiple tail
    buf = transfer.alloc_rows(400, 7, np.float32)
    buf = transfer.write_rows(buf, host, 10)
    np.testing.assert_array_equal(transfer.read_rows(buf, 10, 355), host)


def test_read_rows_async_drain(monkeypatch):
    monkeypatch.setattr(transfer, "CHUNK_BYTES", 2048)
    rng = np.random.default_rng(2)
    host = rng.standard_normal((600, 5)).astype(np.float32)
    buf = transfer.alloc_rows(600, 5, np.float32)
    buf = transfer.write_rows(buf, host, 0)
    h = transfer.read_rows_async(buf, 50, 500)
    out = transfer.drain_read(h)
    np.testing.assert_array_equal(out, host[50:550])


def _make_trainer(sparse):
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    rng = np.random.default_rng(3)
    n, r, e, d = 200, 5, 1200, 16
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int32)
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("DISTMULT", r, d))
    return PartitionBufferLPTrainer(
        model, n, r, edges, NegativeSamplingConfig(num_chunks=2,
                                                   negatives_per_positive=8),
        batch_size=60, num_partitions=8, buffer_capacity=4, seed=0,
        sparse_writeback=sparse)


def test_sparse_writeback_matches_full():
    """Dirty-row eviction is EXACT: the flushed host table after 2 epochs is
    bit-identical to whole-partition writeback."""
    t_full = _make_trainer(False)
    t_sparse = _make_trainer(True)
    assert t_sparse.sparse_writeback and t_sparse.buffer.dirty is not None
    for _ in range(2):
        m_f = t_full.train_epoch()
        m_s = t_sparse.train_epoch()
        assert m_f["loss"] == pytest.approx(m_s["loss"], rel=1e-5)
    sf, ss = t_full.state, t_sparse.state
    np.testing.assert_array_equal(np.asarray(sf.table.values),
                                  np.asarray(ss.table.values))
    np.testing.assert_array_equal(np.asarray(sf.table.state),
                                  np.asarray(ss.table.state))


def test_buffer_degree_fraction_negatives():
    """degree_fraction in buffer mode draws deg-slots from batch endpoints
    (negative.cpp:313-366 parity) with the DEG local filter active; training
    stays finite and learns."""
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    rng = np.random.default_rng(5)
    n, r, e, d = 200, 5, 1500, 16
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], axis=1).astype(np.int32)
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("DISTMULT", r, d))
    t = PartitionBufferLPTrainer(
        model, n, r, edges,
        NegativeSamplingConfig(num_chunks=2, negatives_per_positive=8,
                               degree_fraction=0.5),
        batch_size=60, num_partitions=8, buffer_capacity=4, seed=0)
    losses = [t.train_epoch()["loss"] for _ in range(4)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_partial_epoch_time_boxing():
    t = _make_trainer(True)
    m = t.train_epoch(max_states=2)
    assert m["states_run"] == 2
    assert 0 < m["edges_trained"] < m["num_edges"]
    # training continues cleanly after a partial epoch
    m2 = t.train_epoch()
    assert m2["edges_trained"] == m2["num_edges"] == t.num_edges
