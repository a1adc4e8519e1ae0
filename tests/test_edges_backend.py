"""Edge storage tiers (StorageBackend, options.h:68 / storage.h:149):
DEVICE_MEMORY keeps the edge list HBM-resident; HOST_MEMORY streams shuffled
chunks from host RAM; FLAT_FILE memory-maps the binary edge file and streams
chunks from disk."""

import numpy as np

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model
from marius_tpu.train.trainer import LinkPredictionTrainer


def _model(r=4, d=16):
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    return Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, d))


def _edges(rng, n, r, e):
    return np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                     rng.integers(0, n, e)], 1).astype(np.int32)


def test_host_memory_edges_train():
    rng = np.random.default_rng(0)
    n, r = 128, 4
    edges = _edges(rng, n, r, 700)
    tr = LinkPredictionTrainer(_model(r), n, r, edges,
                               NegativeSamplingConfig(2, 8), batch_size=64,
                               edges_backend="HOST_MEMORY")
    assert tr.edges is None          # nothing edge-shaped resident in HBM
    stats = tr.train(3)
    assert stats[0]["num_edges"] == 700
    assert np.isfinite([s["loss"] for s in stats]).all()
    assert stats[-1]["loss"] < stats[0]["loss"]


def test_host_memory_matches_device_memory_quality():
    """Same data, both tiers: final losses in the same range (shuffle RNG
    differs: device uses the in-scan permutation, host shuffles in numpy)."""
    rng = np.random.default_rng(1)
    n, r = 96, 3
    edges = _edges(rng, n, r, 600)
    neg = NegativeSamplingConfig(2, 8)
    model = _model(r)
    tr_d = LinkPredictionTrainer(model, n, r, edges, neg, batch_size=60)
    tr_h = LinkPredictionTrainer(model, n, r, edges, neg, batch_size=60,
                                 edges_backend="HOST_MEMORY")
    l_d = [s["loss"] for s in tr_d.train(4)]
    l_h = [s["loss"] for s in tr_h.train(4)]
    assert abs(l_h[-1] - l_d[-1]) / abs(l_d[-1]) < 0.15


def test_flat_file_edges_train(tmp_path):
    """FLAT_FILE: train straight off a memory-mapped binary edge file."""
    rng = np.random.default_rng(2)
    n, r = 128, 4
    edges = _edges(rng, n, r, 650)
    path = tmp_path / "train_edges.bin"
    edges.tofile(path)
    mm = np.memmap(path, np.int32, mode="r", shape=(650, 3))

    tr = LinkPredictionTrainer(_model(r), n, r, mm,
                               NegativeSamplingConfig(2, 8), batch_size=64,
                               edges_backend="FLAT_FILE")
    assert tr.edges is None
    stats = tr.train(3)
    assert np.isfinite([s["loss"] for s in stats]).all()
    assert stats[-1]["loss"] < stats[0]["loss"]


def test_flat_file_via_config(tmp_path):
    """storage.edges.type: FLAT_FILE actually switches behavior end-to-end."""
    from marius_tpu.manager import marius_train
    from marius_tpu.tools.preprocess import generate_random_dataset_lp

    ds_dir = str(tmp_path / "ds")
    generate_random_dataset_lp(ds_dir, num_nodes=50, num_edges=400,
                               num_relations=3)
    cfg = {
        "model": {
            "learning_task": "LINK_PREDICTION",
            "encoder": {"layers": [[{"type": "EMBEDDING", "output_dim": 16}]]},
            "decoder": {"type": "DISTMULT", "options": {"input_dim": 16}},
        },
        "storage": {"dataset": {"dataset_dir": ds_dir},
                    "edges": {"type": "FLAT_FILE"}, "save_model": False},
        "training": {"batch_size": 100, "num_epochs": 2,
                     "negative_sampling": {"num_chunks": 2,
                                           "negatives_per_positive": 8}},
        "evaluation": {"batch_size": 100,
                       "negative_sampling": {"filtered": False}},
    }
    res = marius_train(cfg)
    rt = res["runtime"]
    assert rt.trainer.edges_backend == "FLAT_FILE"
    assert isinstance(rt.trainer.edges_host, np.memmap)
    assert np.isfinite([e["loss"] for e in res["epochs"]]).all()
