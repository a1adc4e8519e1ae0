"""ctypes bindings for the native host-side runtime (native/marius_native.cpp).

Builds the shared library on first import (g++ -O3, cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a toolchain. `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
_src = os.path.join(_here, "..", "..", "native", "marius_native.cpp")
_so = os.path.join(_here, "_marius_native.so")

_lib = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    if not os.path.exists(_src):
        # installed wheel: ship-prebuilt .so without the source tree
        return _so if os.path.exists(_so) else None
    if (os.path.exists(_so)
            and os.path.getmtime(_so) >= os.path.getmtime(_src)):
        return _so
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _src, "-o", _so + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_so + ".tmp", _so)
        return _so
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _build()
        if path is None:
            _lib = False
            return _lib
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _lib = False
            return _lib
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.gather_remap_buckets.restype = ctypes.c_int64
        lib.gather_remap_buckets.argtypes = [
            i32p, ctypes.c_int, i64p, i32p, ctypes.c_int, i32p,
            ctypes.c_int32, i32p]
        lib.shuffle_rows_int32.restype = None
        lib.shuffle_rows_int32.argtypes = [i32p, ctypes.c_int64, ctypes.c_int,
                                           ctypes.c_uint64]
        lib.csr_offsets.restype = None
        lib.csr_offsets.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i64p]
        lib.sample_uniform_neighbors.restype = None
        lib.sample_uniform_neighbors.argtypes = [
            i64p, i32p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int32,
            ctypes.c_uint64, i32p, i32p]
        lib.global_to_local.restype = ctypes.c_int64
        lib.global_to_local.argtypes = [i32p, ctypes.c_int64, i32p,
                                        ctypes.c_int32, ctypes.c_int32]
        lib.partition_rows.restype = None
        lib.partition_rows.argtypes = [i32p, ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_int32, ctypes.c_int32,
                                       i32p, i64p]
        _lib = lib
        return _lib


def available() -> bool:
    return bool(_load())


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# ---------------------------------------------------------------------------


def gather_remap_buckets(edges: np.ndarray, bucket_offsets: np.ndarray,
                         bucket_ids: np.ndarray, part_to_slot: np.ndarray,
                         psize: int) -> np.ndarray:
    """Concatenate the selected buckets' edges and remap endpoint ids to
    buffer-local ids. edges must be bucket-grouped (partitioner output)."""
    edges = np.ascontiguousarray(edges, np.int32)
    bucket_offsets = np.ascontiguousarray(bucket_offsets, np.int64)
    bucket_ids = np.ascontiguousarray(bucket_ids, np.int32)
    part_to_slot = np.ascontiguousarray(part_to_slot, np.int32)
    cols = edges.shape[1]
    total = int(np.sum(bucket_offsets[bucket_ids + 1]
                       - bucket_offsets[bucket_ids]))
    out = np.empty((total, cols), np.int32)
    lib = _load()
    if lib:
        n = lib.gather_remap_buckets(
            _ptr(edges, ctypes.c_int32), cols,
            _ptr(bucket_offsets, ctypes.c_int64),
            _ptr(bucket_ids, ctypes.c_int32), len(bucket_ids),
            _ptr(part_to_slot, ctypes.c_int32), psize,
            _ptr(out, ctypes.c_int32))
        assert n == total
        return out
    # numpy fallback
    parts = [edges[bucket_offsets[b]:bucket_offsets[b + 1]] for b in bucket_ids]
    out = (np.concatenate(parts, axis=0) if parts
           else np.zeros((0, cols), np.int32)).copy()
    for c in (0, cols - 1):
        g = out[:, c]
        out[:, c] = part_to_slot[g // psize] * psize + g % psize
    return out


def shuffle_rows(data: np.ndarray, seed: int) -> np.ndarray:
    """In-place row shuffle; returns the array."""
    data = np.ascontiguousarray(data, np.int32)
    lib = _load()
    if lib and data.size:
        lib.shuffle_rows_int32(_ptr(data, ctypes.c_int32), data.shape[0],
                               data.shape[1], seed)
        return data
    rng = np.random.default_rng(seed)
    rng.shuffle(data, axis=0)
    return data


def csr_offsets(sorted_anchor: np.ndarray, num_nodes: int) -> np.ndarray:
    sorted_anchor = np.ascontiguousarray(sorted_anchor, np.int32)
    lib = _load()
    if lib:
        out = np.empty(num_nodes + 1, np.int64)
        lib.csr_offsets(_ptr(sorted_anchor, ctypes.c_int32),
                        len(sorted_anchor), num_nodes,
                        _ptr(out, ctypes.c_int64))
        return out
    return np.searchsorted(sorted_anchor,
                           np.arange(num_nodes + 1)).astype(np.int64)


def sample_uniform_neighbors(offsets: np.ndarray, cols: np.ndarray,
                             seeds: np.ndarray, fanout: int, fill: int,
                             seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-shape (num_seeds, fanout) uniform neighbor sample + counts."""
    offsets = np.ascontiguousarray(offsets, np.int64)
    cols = np.ascontiguousarray(cols, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    n = len(seeds)
    out = np.empty((n, fanout), np.int32)
    counts = np.empty(n, np.int32)
    lib = _load()
    if lib:
        lib.sample_uniform_neighbors(
            _ptr(offsets, ctypes.c_int64), _ptr(cols, ctypes.c_int32),
            _ptr(seeds, ctypes.c_int32), n, fanout, fill, seed,
            _ptr(out, ctypes.c_int32), _ptr(counts, ctypes.c_int32))
        return out, counts
    rng = np.random.default_rng(seed)
    for i, v in enumerate(seeds):
        beg, end = offsets[v], offsets[v + 1]
        deg = end - beg
        if deg <= fanout:
            out[i, :deg] = cols[beg:end]
            out[i, deg:] = fill
            counts[i] = deg
        else:
            out[i] = cols[rng.choice(deg, fanout, replace=False) + beg]
            counts[i] = fanout
    return out, counts


def global_to_local(ids: np.ndarray, part_to_slot: np.ndarray, psize: int,
                    fill: int) -> Tuple[np.ndarray, int]:
    """Remap global node ids to buffer-local ids; non-resident -> fill."""
    ids = np.ascontiguousarray(ids, np.int32).copy()
    part_to_slot = np.ascontiguousarray(part_to_slot, np.int32)
    lib = _load()
    if lib:
        misses = lib.global_to_local(_ptr(ids, ctypes.c_int32), len(ids),
                                     _ptr(part_to_slot, ctypes.c_int32),
                                     psize, fill)
        return ids, int(misses)
    slot = part_to_slot[ids // psize]
    out = np.where(slot < 0, fill, slot * psize + ids % psize).astype(np.int32)
    return out, int((slot < 0).sum())


def partition_rows(edges: np.ndarray, num_nodes: int, num_partitions: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Stable O(n) counting sort of edges into row-major (src_part, dst_part)
    buckets (the partitioner hot path; replaces two 338M-row stable argsorts
    at freebase86m scale). Returns (reordered_edges, bucket_sizes)."""
    edges = np.ascontiguousarray(edges, np.int32)
    psize = -(-num_nodes // num_partitions)
    lib = _load()
    if lib and len(edges):
        out = np.empty_like(edges)
        sizes = np.zeros(num_partitions * num_partitions, np.int64)
        lib.partition_rows(_ptr(edges, ctypes.c_int32), len(edges),
                           edges.shape[1], psize, num_partitions,
                           _ptr(out, ctypes.c_int32),
                           _ptr(sizes, ctypes.c_int64))
        return out, sizes
    # numpy fallback: the original double stable argsort
    src_part = edges[:, 0] // psize
    dst_part = edges[:, -1] // psize
    order = np.argsort(dst_part, kind="stable")
    order = order[np.argsort(src_part[order], kind="stable")]
    flat = src_part[order] * num_partitions + dst_part[order]
    sizes = np.bincount(flat, minlength=num_partitions ** 2).astype(np.int64)
    return edges[order], sizes
