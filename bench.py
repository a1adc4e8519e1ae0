"""Headline benchmark: FB15K-237-shaped DistMult link prediction throughput.

Mirrors the reference's flagship config (examples/configuration/fb15k_237.yaml:
batch 1000, 10 chunks x 500 negatives, d=50 DistMult, dense Adam lr=0.1,
sparse Adagrad lr=0.1) on a synthetic graph with FB15K-237's exact shape
(14,541 nodes / 237 relations / 272,115 train edges — throughput is independent
of edge values). Baseline: 298,699-358,990 edges/s on the reference's 1-GPU
docs log (docs/examples/config/lp_fb15k237.rst:195,242); vs_baseline uses the
best (358,990).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_EDGES_PER_SEC = 358_990.0

NUM_NODES = 14_541
NUM_RELS = 237
NUM_EDGES = 272_115
DIM = 50
BATCH = 1000


def main():
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import Model, LINK_PREDICTION
    from marius_tpu.train.trainer import LinkPredictionTrainer

    rng = np.random.default_rng(0)
    edges = np.stack([
        rng.integers(0, NUM_NODES, NUM_EDGES),
        rng.integers(0, NUM_RELS, NUM_EDGES),
        rng.integers(0, NUM_NODES, NUM_EDGES),
    ], axis=1).astype(np.int32)

    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING", output_dim=DIM),),))
    model = Model(
        learning_task=LINK_PREDICTION,
        encoder=enc,
        decoder=EdgeDecoder("DISTMULT", NUM_RELS, DIM),
    )
    trainer = LinkPredictionTrainer(
        model, NUM_NODES, NUM_RELS, edges,
        NegativeSamplingConfig(num_chunks=10, negatives_per_positive=500),
        batch_size=BATCH, seed=0)

    trainer.train_epoch()  # warmup: compile + first run

    # steady-state throughput over a 4-epoch run: epochs dispatch
    # back-to-back (donated state chains on device), one final sync
    import time as _time
    import jax as _jax
    n_epochs = 4
    t0 = _time.perf_counter()
    data = trainer._data_args()
    for _ in range(n_epochs):
        trainer.state, loss = trainer._epoch_fn(trainer.state, trainer.edges,
                                                data)
    _jax.block_until_ready(loss)
    eps = n_epochs * trainer.num_edges / (_time.perf_counter() - t0)

    print(json.dumps({
        "metric": "fb15k237_distmult_train_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / BASELINE_EDGES_PER_SEC, 3),
    }), flush=True)


def main_nc():
    """Second headline workload: ogbn-arxiv-sized GraphSAGE NC at the
    reference config's exact shape (nc_ogbn_arxiv.rst:222 — 169,343 nodes,
    3-layer linear SAGE d=128, batch 1000, unbounded ALL = full-graph
    exact). The reference's arxiv model has NO activations, so it trains
    through the exact collapsed linear form (nn/linear_collapse.py). See
    bench_nc_full.py for the general (gather-path) and sampled variants."""
    import time as _time

    import jax as _jax

    import bench_nc_full as B

    trainer = B.build_trainer(True, dtype=None)
    trainer.train_epoch()  # warmup: phi build + compile + first run
    n_epochs = 20
    t0 = _time.perf_counter()
    for _ in range(n_epochs):
        trainer.train_epoch()
    _jax.block_until_ready(trainer.state.params)
    nps = n_epochs * B.NUM_TRAIN / (_time.perf_counter() - t0)
    print(json.dumps({
        "metric": "ogbn_arxiv_full_size_graphsage_train_nodes_per_sec",
        "value": round(nps, 1),
        "unit": "nodes/s",
        "vs_baseline": round(nps / B.BASELINE_NODES_PER_SEC, 3),
    }), flush=True)


def main_oocore():
    """Third headline workload: beyond-HBM out-of-core LP at the
    freebase86m shape (86M nodes x d=50 f32 + Adagrad = 34.4 GB, 2.1x the
    chip's HBM) through the partition buffer + COMET ordering — the
    reference's OSDI'21/EuroSys'23 disk-training thesis on TPU. Runs as a
    subprocess (bench_oocore.py) so its 8.6 GB resident working set is
    fully released before the in-memory benches. ~20 min; skip with
    MARIUS_BENCH_SKIP_OOCORE=1. Soft-fails: a crash prints a zero metric
    and the in-memory benches still run."""
    import os
    import subprocess
    import sys
    if os.environ.get("MARIUS_BENCH_SKIP_OOCORE") == "1":
        return
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(here, "bench_oocore.py")],
            capture_output=True, text=True, timeout=3600)
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        tail = [l for l in proc.stderr.splitlines() if "oocore" in l]
        for line in tail[-8:]:
            print(line, file=sys.stderr, flush=True)
        if proc.returncode != 0:
            raise RuntimeError(f"rc={proc.returncode}")
    except Exception as e:  # keep the other metrics alive
        print(json.dumps({
            "metric": "freebase86m_shape_oocore_complex_train_edges_per_sec",
            "value": 0.0, "unit": "edges/s", "vs_baseline": 0.0,
            "error": str(e)[:200]}), flush=True)


def main_nc_sampled():
    """Fourth metric: the sampled-fanout GNN path (fanout 8/direction, the
    path a RELU/dropout model on a beyond-full-graph-scale graph takes) at
    the arxiv-shaped bench_nc workload with EXACT caps (zero frontier
    truncation; saturated hops ride the identity fast path)."""
    import bench_nc
    bench_nc.main()


if __name__ == "__main__":
    main_oocore()
    main_nc_sampled()
    main()
    main_nc()
