"""Multi-chip scaling-efficiency measurement for the LP trainers.

Runs the same FB15K-shaped synthetic workload on a 1-device setup and on an
N-device (data x node) mesh, in both sharding modes, and reports edges/s and
per-device efficiency.

IMPORTANT CAVEAT when run on the virtual CPU mesh (the only multi-"device"
environment available here): the 8 "devices" are XLA host-platform slices of
the SAME physical cores, so per-device efficiency CANNOT reach 100% — the
measurement validates that the sharded program compiles, runs, and does not
collapse (collective overheads bounded), not real ICI scaling. On a real TPU
pod slice the same code paths ride ICI; rerun there for true efficiency.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
           python bench_scaling.py [n_devices]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run(mode: str, mesh, batch_size: int, chunks: int, edges, n, r, epochs=4):
    import jax

    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.trainer import LinkPredictionTrainer

    d = 64
    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=d),),))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, d))
    tr = LinkPredictionTrainer(
        model, n, r, edges,
        NegativeSamplingConfig(chunks, 128),
        batch_size=batch_size, mesh=mesh,
        sharding_mode=mode if mesh is not None else "gspmd")
    tr.train(1)   # compile + warm
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch()
    jax.block_until_ready(tr.state.table.values)
    dt = time.perf_counter() - t0
    return epochs * tr.num_edges / dt


def run_gnn(mode: str, mesh, edges, n, r, epochs=3):
    """GNN-encoder LP twin of run(): 1-layer GraphSAGE over the embedding
    table (explicit mode rides make_sharded_gnn_lp_update)."""
    import jax

    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig
    from marius_tpu.nn.layers import LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.trainer import LinkPredictionTrainer

    d = 64
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=d),),
        (LayerConfig(layer_type="GNN", input_dim=d, output_dim=d,
                     gnn_type="GRAPH_SAGE", aggregator="MEAN"),),
    ))
    model = Model(LINK_PREDICTION, enc, EdgeDecoder("DISTMULT", r, d))
    tr = LinkPredictionTrainer(
        model, n, r, edges, NegativeSamplingConfig(8, 128),
        batch_size=4096, mesh=mesh,
        sharding_mode=mode if mesh is not None else "gspmd",
        graph=build_device_graph(edges, n, r),
        nbr_configs=(NeighborSamplingConfig("UNIFORM", max_neighbors=8),))
    tr.train(1)
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch()
    jax.block_until_ready(tr.state.table.values)
    return epochs * tr.num_edges / (time.perf_counter() - t0)


def main():
    import os

    import jax

    # the axon TPU plugin force-registers its backend regardless of
    # JAX_PLATFORMS in the environment; jax.config wins (see tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else min(8, len(jax.devices()))
    from marius_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n, r, e = 15_000, 237, 250_000
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], 1).astype(np.int32)
    batch, chunks = 16_000, 8
    assert batch % n_dev == 0 and chunks % max(1, n_dev // 2) == 0

    base = run("gspmd", None, batch, chunks, edges, n, r)
    results = {"devices": 1, "edges_per_sec_1dev": base}
    out = [results]

    num_node = 2 if n_dev >= 4 else 1
    mesh = make_mesh(num_data=n_dev // num_node, num_node=num_node,
                     devices=jax.devices()[:n_dev])
    for mode in ("gspmd", "explicit"):
        rate = run(mode, mesh, batch, chunks, edges, n, r)
        out.append({
            "devices": n_dev, "mode": mode,
            "mesh": {"data": n_dev // num_node, "node": num_node},
            "edges_per_sec": rate,
            "scaling_vs_1dev": rate / base,
            "per_device_efficiency": rate / (base * n_dev),
        })
    # GNN-encoder twin (50k nodes / 400k edges: sampling + hop gathers
    # dominate instead of the scoring bmm)
    ng, eg = 50_000, 400_000
    gedges = np.stack([rng.integers(0, ng, eg), rng.integers(0, r, eg),
                       rng.integers(0, ng, eg)], 1).astype(np.int32)
    gbase = run_gnn("gspmd", None, gedges, ng, r)
    out.append({"workload": "gnn_lp", "devices": 1,
                "edges_per_sec_1dev": gbase})
    for mode in ("gspmd", "explicit"):
        rate = run_gnn(mode, mesh, gedges, ng, r)
        out.append({
            "workload": "gnn_lp", "devices": n_dev, "mode": mode,
            "mesh": {"data": n_dev // num_node, "node": num_node},
            "edges_per_sec": rate,
            "scaling_vs_1dev": rate / gbase,
        })

    print(json.dumps(out, indent=2))
    with open("SCALING_RESULTS.json", "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "note": "virtual CPU mesh shares physical cores; see "
                           "bench_scaling.py docstring", "runs": out}, f,
                  indent=2)


if __name__ == "__main__":
    main()
