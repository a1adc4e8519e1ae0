"""Full-scale NC benchmark: ogbn-arxiv-SIZED GraphSAGE node classification.

The exact shape of the reference's second headline config
(examples/configuration/ogbn_arxiv.yaml + docs/examples/config/
nc_ogbn_arxiv.rst:222,254 — 3-layer GraphSAGE d=128, batch 1000,
169,343 nodes / 1,166,243 edges / 90,941 train nodes, baseline ~22,600
trained nodes/s on one A10 GPU). The reference samples ALL neighbors
unbounded (neighbor.cpp:9).

Two measurements:
- **full_graph** (primary, exact-ALL parity): the degree-bucketed full-graph
  mode (data/full_graph.py) — every batch computes all 3 layers over ALL
  nodes and slices seed rows; bit-equal to unbounded ALL sampling. The
  synthetic graph draws destinations from a Zipf law so it has arxiv-like
  hub degrees (max ~10k), exercising the bucketing.
- **sampled fanout-8** (secondary): per-batch sampling with capped fanout,
  the pre-full-graph path, for the perf history.

First compile through the remote-compile tunnel can take minutes — run
detached (setsid nohup python bench_nc_full.py &) and poll the log. Prints
one JSON line per measurement, primary first.
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


def make_graph():
    """Arxiv-shaped citation graph: explicit power-law in-degree sequence
    matched to ogbn-arxiv's stats (max in-degree ~13,161, mean ~6.9),
    uniform sources."""
    rng = np.random.default_rng(0)
    # in-degree of rank r ∝ (r+1)^-0.78, scaled to sum to NUM_EDGES and
    # clipped to arxiv's max hub degree
    w = (np.arange(NUM_NODES) + 1.0) ** -0.78
    lo, hi = 0.5, 4.0
    for _ in range(40):  # bisect the scale so the clipped sum hits NUM_EDGES
        mid = (lo + hi) / 2
        s = np.minimum(np.round(w * (NUM_EDGES / w.sum()) * mid), 13161).sum()
        lo, hi = (mid, hi) if s < NUM_EDGES else (lo, mid)
    deg = np.minimum(np.round(w * (NUM_EDGES / w.sum()) * lo), 13161)
    deg = deg.astype(np.int64)
    short = NUM_EDGES - int(deg.sum())
    if short > 0:
        np.add.at(deg, rng.integers(0, NUM_NODES, short), 1)
    elif short < 0:
        # trim overshoot from the highest-degree nodes (one each)
        trim = np.argsort(deg)[::-1][:-short]
        deg[trim] -= 1
    assert int(deg.sum()) == NUM_EDGES
    remap = rng.permutation(NUM_NODES)
    dst = remap[np.repeat(np.arange(NUM_NODES), deg)]
    src = rng.integers(0, NUM_NODES, NUM_EDGES)
    return np.stack([src, dst], 1).astype(np.int32)


NUM_RELS = 8  # RGCN variant: arxiv-scale graph with a small relation set


def build_trainer(full_graph_mode: bool, dtype=None, linear_collapse=None,
                  gnn_type: str = "GRAPH_SAGE"):
    from marius_tpu.data.full_graph import build_full_graph_adjacency
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import Model, NODE_CLASSIFICATION
    from marius_tpu.train.nc import NodeClassificationTrainer

    rng = np.random.default_rng(0)
    edges = make_graph()
    features = rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, NUM_NODES).astype(np.int32)
    train_nodes = rng.permutation(NUM_NODES)[:NUM_TRAIN].astype(np.int32)

    rels = None
    if gnn_type.upper() == "RGCN":
        rels = rng.integers(0, NUM_RELS, NUM_EDGES).astype(np.int32)
        edges = np.stack([edges[:, 0], rels, edges[:, 1]], 1)

    def gnn(din, dout):
        return LayerConfig(layer_type="GNN", input_dim=din, output_dim=dout,
                           gnn_type=gnn_type, aggregator="MEAN", bias=True,
                           num_heads=8, average_heads=True,
                           num_relations=NUM_RELS)

    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=FEAT_DIM, bias=True),),
        (gnn(FEAT_DIM, 128),), (gnn(128, 128),), (gnn(128, NUM_CLASSES),),
    ))
    model = Model(NODE_CLASSIFICATION, enc, None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM")
    import jax.numpy as jnp
    graph = build_device_graph(edges, NUM_NODES)
    kw = {} if dtype is None else {"dtype": dtype}
    if full_graph_mode:
        import os
        adj = build_full_graph_adjacency(
            edges, NUM_NODES,
            with_relations=gnn_type.upper() == "RGCN",
            locality_reorder=os.environ.get("FG_LOCALITY") == "1")
        import sys
        print(f"full-graph: {adj.total_slots} padded slots, "
              f"{len(adj.nbrs)} buckets, "
              f"max_deg={int(np.asarray(graph.degrees).max())}",
              file=sys.stderr, flush=True)
        nbr = [NeighborSamplingConfig("ALL", max_neighbors=1)] * 3
        return NodeClassificationTrainer(
            model, graph, features, labels, train_nodes, nbr,
            batch_size=BATCH, full_graph=adj,
            fg_linear_collapse=linear_collapse, **kw)
    nbr = [NeighborSamplingConfig(max_neighbors=FANOUT)] * 3
    return NodeClassificationTrainer(
        model, graph, features, labels, train_nodes, nbr, batch_size=BATCH,
        hop_caps=[BATCH, 16_384, 65_536, 131_072], **kw)


def measure(name, full_graph_mode, n_epochs=2, dtype=None,
            linear_collapse=None, gnn_type="GRAPH_SAGE"):
    import jax
    trainer = build_trainer(full_graph_mode, dtype,
                            linear_collapse=linear_collapse,
                            gnn_type=gnn_type)
    print(f"[{name}] init done", flush=True)
    t0 = time.perf_counter()
    trainer.train_epoch()  # compile + warmup
    print(f"[{name}] first epoch (incl compile):",
          round(time.perf_counter() - t0, 1), "s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        trainer.train_epoch()  # includes host-side per-epoch work (honest)
    jax.block_until_ready(trainer.state.params)
    nps = n_epochs * NUM_TRAIN / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"ogbn_arxiv_full_size_{name}_train_nodes_per_sec",
        "value": round(nps, 1),
        "unit": "nodes/s",
        "vs_baseline": round(nps / BASELINE_NODES_PER_SEC, 3),
    }), flush=True)
    del trainer


def main():
    import jax.numpy as jnp

    # Primary: the exact arxiv model (LINEAR — the reference's default
    # activation is NONE) trains through the collapsed factored form
    # (nn/linear_collapse.py), auto-selected; many epochs, it is fast.
    measure("graphsage_exact_all_full_graph", True, n_epochs=20)
    # Secondary: the general bucketed-gather path (what a RELU model pays),
    # forced via fg_linear_collapse=False.
    measure("graphsage_exact_all_full_graph_general", True,
            linear_collapse=False)
    measure("graphsage_exact_all_full_graph_general_bf16", True,
            dtype=jnp.bfloat16, linear_collapse=False)
    measure("graphsage_sampled_fanout8", False)


def main_gat_rgcn():
    """GAT + RGCN full-graph general-path records at arxiv scale (the
    reference's gat_layer.cpp is CUDA-only and rgcn_layer.cpp bmm's one
    matrix per neighbor; no reference perf log exists for either — these
    records pin OUR throughput at realistic scale, f32 and bf16)."""
    import jax.numpy as jnp
    measure("gat8_exact_all_full_graph", True, gnn_type="GAT")
    measure("gat8_exact_all_full_graph_bf16", True, dtype=jnp.bfloat16,
            gnn_type="GAT")
    measure("rgcn8_exact_all_full_graph", True, gnn_type="RGCN")
    measure("rgcn8_exact_all_full_graph_bf16", True, dtype=jnp.bfloat16,
            gnn_type="RGCN")


if __name__ == "__main__":
    import sys
    if "--gat-rgcn" in sys.argv:
        main_gat_rgcn()
    else:
        main()
