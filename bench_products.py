"""Empirical-caps demonstration at products-lite scale: 560k nodes, 7.7M
powerlaw edges, 3-layer SAGE d=128 fanout 8/dir, batch 1000.

A/Bs `hop_caps: auto` (estimate_hop_caps_empirical, seeded from the train
pool) against the geometric worst case at a scale where the hop-2 frontier
does NOT saturate: measured 8.3k vs 5.3k nodes/s (1.56x) with zero
truncation in both (PERF_RECORDS.md). This scale is also the regression
guard for the closure-constants fix — the feature table alone is 224 MB,
which the remote compiler rejects if it rides the module as a constant.

Not driver-run; kept for the performance record. ~12 min on one v5e.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import json, time
    import numpy as np
    import jax
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import (
        NeighborSamplingConfig, estimate_hop_caps, estimate_hop_caps_empirical)
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import Model, NODE_CLASSIFICATION
    from marius_tpu.train.nc import NodeClassificationTrainer

    N, E, F, C, TRAIN, BATCH = 560_000, 7_700_000, 100, 48, 100_000, 1000
    rng = np.random.default_rng(0)
    w = (np.arange(N) + 1.0) ** -0.7
    deg = np.maximum((w * (E / w.sum())).astype(np.int64), 1)
    short = E - int(deg.sum())
    if short > 0:
        np.add.at(deg, rng.integers(0, N, short), 1)
    else:
        trim = np.argsort(deg)[::-1][:(-short)]
        deg[trim] = np.maximum(deg[trim] - 1, 1)
    E = int(deg.sum())
    remap = rng.permutation(N)
    dst = remap[np.repeat(np.arange(N), deg)]
    src = rng.integers(0, N, E)
    edges = np.stack([src, dst], 1).astype(np.int32)
    feats = rng.standard_normal((N, F)).astype(np.float32)
    labels = rng.integers(0, C, N).astype(np.int32)
    train_nodes = rng.permutation(N)[:TRAIN].astype(np.int32)

    cfgs = tuple([NeighborSamplingConfig(max_neighbors=8)] * 3)
    worst = estimate_hop_caps(BATCH, cfgs, N)
    emp = estimate_hop_caps_empirical(edges, N, cfgs, BATCH, seed=0,
                                      seed_pool=train_nodes)
    print("worst caps:", worst, flush=True)
    print("empirical:", emp, flush=True)

    def gnn(din, dout):
        return LayerConfig(layer_type="GNN", input_dim=din, output_dim=dout,
                           gnn_type="GRAPH_SAGE", aggregator="MEAN", bias=True)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=F, bias=True),),
        (gnn(F, 128),), (gnn(128, 128),), (gnn(128, C),)))
    graph = build_device_graph(edges, N)

    for name, caps in (("empirical", emp), ("worst", worst)):
        model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                      loss_reduction="SUM")
        tr = NodeClassificationTrainer(model, graph, feats, labels, train_nodes,
                                       cfgs, batch_size=BATCH, hop_caps=caps)
        m = tr.train_epoch()
        print(f"[{name}] epoch1 {m['epoch_time_s']:.1f}s trunc "
              f"{m['truncated_frontier_ids']}", flush=True)
        t0 = time.perf_counter()
        tr.state, (loss, ov) = tr._epoch_fn(tr.state, tr.train_nodes, None,
                                            tr._data_args())
        jax.block_until_ready(loss)
        nps = TRAIN / (time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"products_lite_sampled_fanout8_{name}_caps_nodes_per_sec",
            "value": round(nps, 1), "truncated_frontier_ids": int(ov)}), flush=True)
        del tr


if __name__ == "__main__":
    main()
