"""Profiling and tracing hooks.

The reference has only wall-clock Timers + per-epoch edges/s logs (SURVEY §5:
common/util.h:10, trainer.cpp:69-72, unimplemented reportQueueStatus hooks).
Here profiling is first-class via jax.profiler: `trace()` captures a device
trace viewable in TensorBoard/XProf, `op_breakdown()` aggregates per-op device
time from the captured trace (the tool used to find the unique-sort and
scatter hotspots this framework's fast paths eliminate), and `EpochTimer`
collects per-epoch throughput stats.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_breakdown(log_dir: str, top: int = 20) -> List[Dict]:
    """Aggregate device-op durations from a captured trace directory."""
    events = []
    for f in glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(f) as fh:
            events.extend(json.load(fh).get("traceEvents", []))
    agg = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            agg[e.get("name", "?")] += e["dur"]
    return [{"op": name, "total_us": dur} for name, dur in agg.most_common(top)]


class EpochTimer:
    """Per-epoch wall-clock + throughput collection (Timer, util.h:10 +
    trainer.cpp:69-72 edges/s logging)."""

    def __init__(self, item_name: str = "edges"):
        self.item_name = item_name
        self.epochs: List[Dict[str, float]] = []
        self._start: Optional[float] = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, num_items: int) -> Dict[str, float]:
        assert self._start is not None, "call start() first"
        dt = time.perf_counter() - self._start
        stats = {"epoch_time_s": dt,
                 f"{self.item_name}_per_sec": num_items / dt if dt > 0 else 0.0}
        self.epochs.append(stats)
        self._start = None
        return stats

    def summary(self) -> Dict[str, float]:
        if not self.epochs:
            return {}
        times = [e["epoch_time_s"] for e in self.epochs]
        rates = [e[f"{self.item_name}_per_sec"] for e in self.epochs]
        return {
            "num_epochs": len(self.epochs),
            "mean_epoch_time_s": sum(times) / len(times),
            "best_epoch_time_s": min(times),
            f"best_{self.item_name}_per_sec": max(rates),
        }
