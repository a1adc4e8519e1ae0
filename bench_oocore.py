"""Beyond-HBM out-of-core LP benchmark: Freebase86m-shaped partition-buffer
training on one TPU chip.

The reference's core published claim (OSDI'21 / EuroSys'23) is disk-based
training of tables larger than accelerator memory via the PartitionBuffer +
BETA/COMET orderings (storage/buffer.cpp:118-322, data/ordering.cpp). This
drives the marius_tpu equivalent at the real scale: 86M nodes x d=50 float32
embeddings + Adagrad state = 34.4 GB of optimizer-visible table — 2.1x the
16 GB HBM of a v5e chip — with ComplEx scoring, batch 10000, 10x500
negatives (examples/configuration/freebase86m_comet.yaml shape), 32
partitions, 8 resident (8.6 GB HBM working set), COMET ordering.

The run is TIME-BOXED: a warmup state (compile + reverse-channel warmup),
then a measured window of buffer states; edges/s is computed over the
measured states' wall time (prep + swap + compute, excluding the one-time
initial load and final flush that a full epoch amortizes over 78 states).
A context JSON with the full accounting (compute/swap/prep split, measured
link bandwidths, dirty-row ratios) goes to stderr.

Environment note (recorded honestly): this environment's TPU is attached
through a tunnel whose device->host path sustains only ~15 MB/s (host->
device ~1.5 GB/s chunked). Eviction writebacks are therefore the wall —
on-prem v5e PCIe (>=16 GB/s full duplex) the same schedule's transfers are
~1000x cheaper and the run is compute-bound; the context JSON includes that
projection next to the measured number.

Scale knobs (env): MARIUS_OOCORE_NODES, MARIUS_OOCORE_EDGES,
MARIUS_OOCORE_BUDGET_S, MARIUS_OOCORE_SMALL=1 (CI smoke shape).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_EDGES_PER_SEC = 358_990.0  # reference's best logged 1-GPU LP rate
                                    # (docs/examples/config/lp_fb15k237.rst:242);
                                    # no out-of-core number is published in-repo

SMALL = os.environ.get("MARIUS_OOCORE_SMALL") == "1"
NUM_NODES = int(os.environ.get("MARIUS_OOCORE_NODES",
                               "200000" if SMALL else "86000000"))
NUM_EDGES = int(os.environ.get("MARIUS_OOCORE_EDGES",
                               "400000" if SMALL else "338000000"))
NUM_RELS = 14_824 if not SMALL else 100
DIM = 50
BATCH = 10_000 if not SMALL else 2_000
NUM_PARTITIONS = 32
CAPACITY = 8
BUDGET_S = float(os.environ.get("MARIUS_OOCORE_BUDGET_S",
                                "30" if SMALL else "480"))
MAX_STATES = int(os.environ.get("MARIUS_OOCORE_MAX_STATES",
                                "8" if SMALL else "3"))


def log(msg):
    print(f"[oocore] {msg}", file=sys.stderr, flush=True)


def build_trainer():
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    # synthetic freebase86m-shaped edge list (throughput is independent of
    # edge values; generated in chunks to bound peak RAM)
    edges = np.empty((NUM_EDGES, 3), np.int32)
    step = 16_777_216
    for lo in range(0, NUM_EDGES, step):
        n = min(step, NUM_EDGES - lo)
        edges[lo:lo + n, 0] = rng.integers(0, NUM_NODES, n, dtype=np.int32)
        edges[lo:lo + n, 1] = rng.integers(0, NUM_RELS, n, dtype=np.int32)
        edges[lo:lo + n, 2] = rng.integers(0, NUM_NODES, n, dtype=np.int32)
    log(f"edge gen {time.perf_counter() - t0:.1f}s")

    enc = EncoderConfig(stages=((LayerConfig(layer_type="EMBEDDING",
                                             output_dim=DIM),),))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("COMPLEX", NUM_RELS, DIM))
    t0 = time.perf_counter()
    trainer = PartitionBufferLPTrainer(
        model, NUM_NODES, NUM_RELS, edges,
        NegativeSamplingConfig(num_chunks=10, negatives_per_positive=500,
                               degree_fraction=0.5),  # freebase86m_comet.yaml
        batch_size=BATCH, num_partitions=NUM_PARTITIONS,
        buffer_capacity=CAPACITY, seed=0, ordering="COMET",
        sparse_writeback=True, profile_states=True)
    log(f"trainer init (partition sort + 34.4GB table init) "
        f"{time.perf_counter() - t0:.1f}s")
    return trainer


def warm_reverse_channel():
    """The tunnel's first device->host read pays a multi-minute channel
    warmup; trigger it on 4 KB before anything is timed."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(1024, jnp.float32) + 1.0)
    log(f"reverse-channel warmup {time.perf_counter() - t0:.1f}s")


def measure_link():
    """Measured link bandwidths for the projection context (64 MB h2d
    chunked, 16 MB d2h)."""
    import jax
    from marius_tpu.storage import transfer
    host = np.ones((163_840, 100), np.float32)  # 64 MB
    t0 = time.perf_counter()
    buf = transfer.write_rows(transfer.alloc_rows(163_840, 100, np.float32), host, 0)
    jax.block_until_ready(buf)
    h2d = host.nbytes / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    transfer.read_rows(buf, 0, 40_960)
    d2h = 40_960 * 400 / (time.perf_counter() - t0)
    log(f"link: h2d {h2d / 1e6:.0f} MB/s, d2h {d2h / 1e6:.1f} MB/s")
    return h2d, d2h


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, file=sys.stderr)  # kill -USR1 <pid> dumps stacks
    # touch the device FIRST (the tunnel's first contact can take minutes;
    # do it before the multi-GB host allocations so a hang is attributable)
    import jax
    t0 = time.perf_counter()
    jax.block_until_ready(jax.numpy.ones(8) + 1.0)
    log(f"device first contact {time.perf_counter() - t0:.1f}s")
    trainer = build_trainer()
    warm_reverse_channel()
    h2d_bw, d2h_bw = measure_link()

    log("warmup state (compile + first swap)...")
    t0 = time.perf_counter()
    trainer.train_epoch(max_states=1, final_flush=False)
    log(f"warmup epoch-slice {time.perf_counter() - t0:.1f}s")

    log(f"measured window (budget {BUDGET_S:.0f}s, min 3 states)...")
    m = trainer.train_epoch(max_states=MAX_STATES, time_budget_s=BUDGET_S,
                            final_flush=False)
    timings = trainer.last_state_timings
    # steady-state accounting: drop state 0 (the initial load covers its
    # admits, so it carries no swap cost) — otherwise a budget that only
    # fits state 0 reports compute-only throughput as if swaps were free
    steady = timings[1:] if len(timings) > 1 else timings
    edges_steady = m["edges_trained"] * len(steady) / max(len(timings), 1)
    prep = sum(t[0] for t in steady)
    swap = sum(t[1] for t in steady)
    comp = sum(t[2] for t in steady)
    window = prep + swap + comp
    eps = edges_steady / window if window > 0 else 0.0

    # projection: same schedule with PCIe-class links (16 GB/s) — swap time
    # shrinks by the measured-bandwidth ratio; compute/prep unchanged
    pcie = 16e9
    swap_proj = swap * max(d2h_bw, 1.0) / pcie
    eps_proj = edges_steady / max(comp + prep, comp + prep + swap_proj)

    ctx = {
        "workload": f"{NUM_NODES} nodes x d={DIM} f32 ComplEx LP, "
                    f"{NUM_EDGES} edges, {NUM_PARTITIONS} partitions / "
                    f"{CAPACITY} resident (COMET), batch {BATCH}, 10x500 negs",
        "table_gb": round(NUM_NODES * DIM * 4 * 2 / 1e9, 1),
        "hbm_resident_gb": round(CAPACITY / NUM_PARTITIONS * NUM_NODES * DIM
                                 * 4 * 2 / 1e9, 1),
        "states_measured": m["states_run"],
        "steady_states_in_metric": len(steady),
        "edges_trained": m["edges_trained"],
        "window_s": round(window, 1),
        "split": {"compute_s": round(comp, 1), "swap_s": round(swap, 1),
                  "host_prep_s": round(prep, 1)},
        "compute_occupancy": round(comp / window, 3) if window else None,
        "load_and_overhead_s": round(m["epoch_time_s"] - window, 1),
        "link_MBps": {"h2d": round(h2d_bw / 1e6), "d2h": round(d2h_bw / 1e6, 1)},
        "loss": m["loss"],
        "edges_per_sec_wall": round(eps, 1),
        "edges_per_sec_compute_side": round(edges_steady / comp, 1)
        if comp > 0 else None,
        "edges_per_sec_projected_pcie16GBps": round(eps_proj, 1),
        "note": "swap_s is dominated by this environment's ~15 MB/s tunnel "
                "device->host path; dirty-row writeback already cuts eviction "
                "bytes to touched rows only",
    }
    print(json.dumps({"oocore_context": ctx}), file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "freebase86m_shape_oocore_complex_train_edges_per_sec",
        "value": round(eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(eps / BASELINE_EDGES_PER_SEC, 3),
        "beyond_hbm": True,
        "compute_occupancy": ctx["compute_occupancy"],
        "projected_pcie_edges_per_sec": round(eps_proj, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
