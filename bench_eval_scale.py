"""Large-N filtered evaluation benchmark: the in-HBM streamed all-node scan
vs the beyond-HBM host-tiled path (train/evaluator.py), at two table sizes.

The reference's filtered eval materializes negatives against all nodes on
the GPU (negative.cpp:50-197 / graph_storage.cpp:745); neither it nor the
docs publish a large-N eval rate. These records pin OUR throughput
(edges-ranked/s, both corruption directions counted) and tune the streamed
scan's node_chunk — at 86M nodes an 8192-chunk scan is ~10.5k scan steps per
batch direction, so chunk size is the lever.

Run: python bench_eval_scale.py  (detached recommended; ~5-10 min)
Prints one JSON line per measurement to stdout.
"""

import json
import sys
import time

import numpy as np

DIM = 50
NUM_RELS = 50
NUM_EVAL_EDGES = 2048
BATCH = 512


def log(m):
    print(f"[eval_scale] {m}", file=sys.stderr, flush=True)


def build(num_nodes):
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model, init_model_params
    import jax

    rng = np.random.default_rng(0)
    eval_edges = np.stack([
        rng.integers(0, num_nodes, NUM_EVAL_EDGES),
        rng.integers(0, NUM_RELS, NUM_EVAL_EDGES),
        rng.integers(0, num_nodes, NUM_EVAL_EDGES)], 1).astype(np.int32)
    # filter key set: eval edges + a train-shaped sample (key-set size only
    # affects the binary-search depth, not the streamed matmul)
    extra = np.stack([
        rng.integers(0, num_nodes, 100_000),
        rng.integers(0, NUM_RELS, 100_000),
        rng.integers(0, num_nodes, 100_000)], 1).astype(np.int32)
    all_edges = np.concatenate([eval_edges, extra])

    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=DIM),),))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("DISTMULT", NUM_RELS, DIM))
    params = init_model_params(jax.random.key(0), model)
    return model, params, eval_edges, all_edges


def measure_in_hbm(num_nodes, node_chunk):
    """In-HBM streamed scan: encoded table lives in HBM (num_nodes*d*4 B)."""
    import jax
    import jax.numpy as jnp
    from marius_tpu.train.evaluator import LinkPredictionEvaluator
    from marius_tpu.train.trainer import TrainState
    from marius_tpu.parallel.embedding_table import EmbeddingTable

    model, params, eval_edges, all_edges = build(num_nodes)
    ev = LinkPredictionEvaluator(
        model, num_nodes, NUM_RELS, eval_edges, all_edges=all_edges,
        batch_size=BATCH, filtered=True, node_chunk=node_chunk)
    # random table built ON DEVICE (streaming 2-7 GB through the tunnel
    # would dominate; eval cost is independent of the values)
    values = jax.random.normal(jax.random.key(1), (num_nodes, DIM),
                               jnp.float32) * 0.1
    # evaluation reads table.values only — a dummy optimizer state avoids
    # wasting num_nodes*d*4 bytes of HBM on zeros
    state = TrainState(table=EmbeddingTable(values=values,
                                            state=jnp.zeros((1, DIM))),
                       params=params, opt_state=None,
                       key=jax.random.key(0), epoch=jnp.zeros((), jnp.int32))
    t0 = time.perf_counter()
    res = ev.evaluate(state)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = ev.evaluate(state)
    dt = time.perf_counter() - t0
    eps = NUM_EVAL_EDGES / dt
    log(f"in_hbm N={num_nodes} chunk={node_chunk or 'auto'}: "
        f"warm {warm:.1f}s, steady {dt:.1f}s, mrr={res['mrr']:.4f}")
    return eps, dt


def measure_host_tiled(num_nodes):
    """Beyond-HBM path: raw table in host RAM, encode+score streamed."""
    import jax
    from marius_tpu.train.evaluator import LinkPredictionEvaluator

    model, params, eval_edges, all_edges = build(num_nodes)
    ev = LinkPredictionEvaluator(
        model, num_nodes, NUM_RELS, eval_edges, all_edges=all_edges,
        batch_size=BATCH, filtered=True)
    rng = np.random.default_rng(2)
    host_values = np.empty((num_nodes, DIM), np.float32)
    step = 4_000_000
    for lo in range(0, num_nodes, step):
        host_values[lo:lo + step] = 0.1 * rng.standard_normal(
            (min(step, num_nodes - lo), DIM)).astype(np.float32)
    ev.profile_host_eval = True   # per-tile (transfer, compute) accounting
    t0 = time.perf_counter()
    res = ev.evaluate_from_host_table(host_values, params)
    dt = time.perf_counter() - t0
    eps = NUM_EVAL_EDGES / dt
    tm = getattr(ev, "last_host_eval_timings", {})
    # PCIe projection: on a 16 GB/s host link the exposed transfer time
    # becomes table_bytes / 16e9; compute is what it is
    proj = None
    if tm:
        pcie_s = tm["table_bytes"] / 16e9
        hidden = max(0.0, dt - tm["transfer_s"] - tm["compute_s"])
        # transfers overlap compute (double-buffered): projected wall =
        # prep/overhead + max(compute, pcie transfer time)
        proj = NUM_EVAL_EDGES / (hidden + max(tm["compute_s"], pcie_s))
    log(f"host_tiled N={num_nodes}: {dt:.1f}s, mrr={res['mrr']:.4f}, "
        f"timings={tm}")
    return eps, dt, tm, proj


def main():
    results = {}
    for n, chunks in ((10_000_000, (8_192, 32_768, 131_072)),
                      (30_000_000, (32_768,))):
        for c in chunks:
            eps, dt = measure_in_hbm(n, c)
            results[f"in_hbm_{n}_{c}"] = eps
            print(json.dumps({
                "metric": f"filtered_eval_in_hbm_edges_ranked_per_sec",
                "num_nodes": n, "node_chunk": c,
                "value": round(eps, 2), "unit": "edges/s"}), flush=True)
    for n in (10_000_000, 30_000_000):
        eps, dt, tm, proj = measure_host_tiled(n)
        print(json.dumps({
            "metric": "filtered_eval_host_tiled_edges_ranked_per_sec",
            "num_nodes": n, "value": round(eps, 2), "unit": "edges/s",
            "wall_s": round(dt, 1),
            "split": {k: round(v, 2) for k, v in tm.items()
                      if isinstance(v, float)},
            "table_gb": round(tm.get("table_bytes", 0) / 1e9, 2),
            "projected_pcie16GBps_edges_per_sec":
                None if proj is None else round(proj, 2)}), flush=True)


if __name__ == "__main__":
    main()
