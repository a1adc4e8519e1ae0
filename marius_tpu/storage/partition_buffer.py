"""Partition buffer: HBM-resident working set over a host-RAM embedding table.

The TPU re-design of the reference's PartitionBuffer (storage/buffer.cpp:
324-713) + BETA/COMET orderings: the full table (+ Adagrad state) lives in
host RAM as numpy arrays (optionally memory-mapped files); a `capacity`-
partition slice lives in HBM as jax.Arrays that the compiled train step
gathers from and scatters into. The ordering schedule (data/ordering.py)
drives swaps: evicted partitions are copied device->host, admitted ones
host->device into the freed slots. JAX's async dispatch overlaps the
host->device transfer of the next admit with the current state's compute
(the LookaheadBlock prefetch thread, buffer.cpp:118-220, without the thread).

Id mapping: nodes are range-partitioned (partition p owns rows
[p*psize, (p+1)*psize)); with `slot[p]` the buffer slot of partition p, the
buffer-local id of global node g is `slot[g // psize] * psize + g % psize`
(getGlobalToLocalMap, buffer.cpp:581-633, computed arithmetically instead of
via an index map tensor).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.nn.initialization import InitConfig, initialize_tensor
from marius_tpu.parallel.embedding_table import ADAGRAD_EPS
from marius_tpu.storage import transfer


def _place(arr: np.ndarray, sharding):
    """Host -> device placement for buffer STATE arrays. With a sharding
    whose mesh spans processes, this yields ONE global jax.Array
    (parallel.mesh.put_global); otherwise the plain single-controller put."""
    if sharding is None:
        return jnp.asarray(arr)
    from marius_tpu.parallel.mesh import put_global
    return put_global(arr, sharding)


def _arg(arr, sharding=None):
    """Per-call jit argument placement — see parallel.mesh.put_arg."""
    from marius_tpu.parallel.mesh import put_arg
    return put_arg(arr, sharding)


def _to_host(arr) -> np.ndarray:
    """Device -> host read that also works for arrays whose shards live on
    OTHER processes (node-sharded buffer under a multi-controller mesh):
    falls back to an allgather collective. All processes call this at the
    same points (swaps are deterministic), so the collective lines up."""
    if getattr(arr, "is_fully_addressable", True) or arr.is_fully_replicated:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


@dataclasses.dataclass
class PartitionBuffer:
    num_nodes: int
    num_partitions: int
    capacity: int
    dim: int
    host_values: np.ndarray          # (num_partitions * psize, dim)
    host_state: np.ndarray           # Adagrad accumulator, same shape
    device_values: Optional[jax.Array] = None   # (capacity * psize, dim)
    device_state: Optional[jax.Array] = None
    resident: Optional[np.ndarray] = None       # (capacity,) partition ids, -1 empty
    part_to_slot: Optional[np.ndarray] = None   # (num_partitions,) slot or -1
    sharding: Optional[object] = None           # jax.sharding.Sharding for the
                                                # device arrays (multi-chip)
    pending_writebacks: List = dataclasses.field(default_factory=list)
    # deferred evictions — the device->host copy is started async at swap time
    # and the host-array write lands at the NEXT swap/flush, so the new
    # state's compute overlaps the writeback (AsyncWriteBlock analogue,
    # buffer.cpp:222-322). Entries are either
    #   ("full", parts, values_dev, state_dev)            — whole-slot blocks
    #   ("sparse", p, ids, k, handle_v, handle_s)         — dirty rows only
    dirty: Optional[jax.Array] = None
    # (buffer_rows,) bool on device: rows modified since their slot was
    # admitted. Maintained by the trainer's compiled step; evictions then
    # write back ONLY dirty rows (exact — untouched rows are already host-
    # authoritative). The reference always writes whole partitions
    # (buffer.cpp:222-322); dirty-row writeback cuts eviction bytes ~3-5x,
    # which matters whenever the device->host link is the bottleneck.

    @property
    def psize(self) -> int:
        return self.host_values.shape[0] // self.num_partitions

    @property
    def buffer_rows(self) -> int:
        return self.capacity * self.psize

    # ------------------------------------------------------------------
    @staticmethod
    def create(key, num_nodes: int, dim: int, num_partitions: int,
               capacity: int, init_config: Optional[InitConfig] = None,
               dtype=np.float32) -> "PartitionBuffer":
        psize = -(-num_nodes // num_partitions)
        padded = num_partitions * psize
        cfg = init_config or InitConfig("GLOROT_UNIFORM")
        if padded * dim <= 4_000_000:
            # small: reuse the device initializer (full-shape fans,
            # io.cpp:167-188) for bit-parity with the in-memory trainer
            values = np.array(initialize_tensor(
                key, cfg, (padded, dim), jnp.float32, fans=(num_nodes, dim)), dtype)
        else:
            # big tables: init host-side — the chunked-init analogue
            # (io.cpp:167-188) without pulling GBs through the device.
            # Chunked float32 sampling: full-array float64 RNG at 10+ GB
            # scale costs minutes and 2x peak RAM.
            dist = cfg.distribution.upper()
            seed = int(np.asarray(jax.random.key_data(key)).sum()) & 0x7FFFFFFF
            rng = np.random.default_rng(seed)
            values = np.empty((padded, dim), dtype)
            step = max(1, (64 << 20) // max(1, dim * 4))
            for lo in range(0, padded, step):
                shp = (min(step, padded - lo), dim)
                if dist == "GLOROT_UNIFORM":
                    bound = np.float32(np.sqrt(6.0 / (num_nodes + dim)))
                    values[lo:lo + shp[0]] = \
                        (rng.random(shp, np.float32) * 2 - 1) * bound
                elif dist == "GLOROT_NORMAL":
                    std = np.float32(np.sqrt(2.0 / (num_nodes + dim)))
                    values[lo:lo + shp[0]] = \
                        rng.standard_normal(shp, np.float32) * std
                elif dist == "NORMAL":
                    values[lo:lo + shp[0]] = (
                        cfg.mean + cfg.std * rng.standard_normal(shp, np.float32))
                elif dist == "UNIFORM":
                    values[lo:lo + shp[0]] = (
                        (rng.random(shp, np.float32) * 2 - 1) * cfg.scale_factor)
                elif dist == "ZEROS":
                    values[lo:lo + shp[0]] = 0
                elif dist == "ONES":
                    values[lo:lo + shp[0]] = 1
                else:
                    values[lo:lo + shp[0]] = cfg.constant
        values[num_nodes:] = 0.0
        return PartitionBuffer(
            num_nodes=num_nodes, num_partitions=num_partitions,
            capacity=capacity, dim=dim,
            host_values=values,
            host_state=np.zeros((padded, dim), dtype),
        )

    def part_rows(self, p: int) -> slice:
        return slice(p * self.psize, (p + 1) * self.psize)

    def part_valid_count(self, p: int) -> int:
        return max(0, min(self.num_nodes - p * self.psize, self.psize))

    # ------------------------------------------------------------------
    def load(self, partitions: Sequence[int]) -> None:
        """Admit an initial resident set (PartitionBuffer::load)."""
        self._drain_writebacks()
        # drop the previous epoch's device arrays BEFORE allocating the new
        # ones — holding both doubles the resident footprint and OOMs
        # beyond-HBM-scale buffers
        self.device_values = None
        self.device_state = None
        parts = list(int(p) for p in partitions)
        assert len(parts) <= self.capacity
        parts = parts + [-1] * (self.capacity - len(parts))
        if transfer.chunked_enabled():
            # stream per-partition chunks into a zero buffer: no host-side
            # concatenation copy, no single multi-GB put (see storage/transfer).
            # The two tiers fill sequentially to keep peak in-flight memory at
            # one buffer + one transfer window.
            dv = transfer.alloc_rows(self.buffer_rows, self.dim,
                                     self.host_values.dtype, self.sharding)
            for slot, p in enumerate(parts):
                if p >= 0:
                    dv = transfer.write_rows(
                        dv, self.host_values[self.part_rows(p)], slot * self.psize)
            ds = transfer.alloc_rows(self.buffer_rows, self.dim,
                                     self.host_state.dtype, self.sharding)
            for slot, p in enumerate(parts):
                if p >= 0:
                    block = self.host_state[self.part_rows(p)]
                    # optimizer state is all-zero until a partition has
                    # trained; the alloc is already zeros — skip the transfer
                    # (a host scan is ~100x cheaper than moving the block)
                    if block.any():
                        ds = transfer.write_rows(ds, block, slot * self.psize)
            self.device_values, self.device_state = dv, ds
        else:
            blocks_v, blocks_s = [], []
            for p in parts:
                if p < 0:
                    blocks_v.append(np.zeros((self.psize, self.dim), self.host_values.dtype))
                    blocks_s.append(np.zeros((self.psize, self.dim), self.host_state.dtype))
                else:
                    blocks_v.append(self.host_values[self.part_rows(p)])
                    blocks_s.append(self.host_state[self.part_rows(p)])
            self.device_values = _place(np.concatenate(blocks_v, axis=0),
                                        self.sharding)
            self.device_state = _place(np.concatenate(blocks_s, axis=0),
                                       self.sharding)
        if self.dirty is not None:
            self.dirty = jnp.zeros(self.buffer_rows, bool)
        self.resident = np.asarray(parts, np.int32)
        self.part_to_slot = np.full(self.num_partitions, -1, np.int32)
        for slot, p in enumerate(parts):
            if p >= 0:
                self.part_to_slot[p] = slot

    def enable_dirty_tracking(self) -> None:
        """Opt in to dirty-row (sparse) writeback. The trainer's compiled step
        must mark updated rows in ``self.dirty`` (scatter True at update ids);
        evictions and flushes then move only those rows device->host.
        Single-controller only (the mask read is a local d2h)."""
        assert transfer.chunked_enabled(), \
            "dirty tracking requires a single-controller runtime"
        self.dirty = jnp.zeros(self.buffer_rows, bool)

    def _drain_writebacks(self) -> None:
        """Land all deferred eviction copies in the host arrays. By drain
        time the async device->host copies have overlapped at least one
        state's compute, so the reads are (usually) no-wait."""
        while self.pending_writebacks:
            entry = self.pending_writebacks.pop(0)
            if entry[0] == "sparse":
                _, p, ids, k, handle_v, handle_s = entry
                vals = transfer.drain_read(handle_v)
                stats = transfer.drain_read(handle_s)
                rows = p * self.psize + ids[:k]
                self.host_values[rows] = vals[:k]
                self.host_state[rows] = stats[:k]
                continue
            _, parts, vals_d, stats_d = entry
            if isinstance(vals_d, tuple):  # chunked read handles
                vals = transfer.drain_read(vals_d)
                stats = transfer.drain_read(stats_d)
            else:
                vals = _to_host(vals_d)
                stats = _to_host(stats_d)
            for k, p in enumerate(parts):
                rows = self.part_rows(p)
                self.host_values[rows] = vals[k * self.psize:(k + 1) * self.psize]
                self.host_state[rows] = stats[k * self.psize:(k + 1) * self.psize]

    def swap_to_state(self, new_partitions: Sequence[int]) -> None:
        """Evict partitions not in the new state, admit the new ones into the
        freed slots (performNextSwap, buffer.cpp:495-541)."""
        assert self.resident is not None, "call load() first"
        self._drain_writebacks()  # previous state's evictions land now
        new_set = set(int(p) for p in new_partitions)
        old_set = set(int(p) for p in self.resident if p >= 0)
        evict = sorted(old_set - new_set)
        admit = sorted(new_set - old_set)
        if not evict and not admit:
            return

        # device -> host writeback of evicted slots, asynchronously: capture
        # the rows into a fresh device array (device-side gather, ordered
        # before the admit update on the stream), start the host copy, and
        # defer the host-array write to the next drain. The next state's
        # compute overlaps the transfer (buffer.cpp:222-322 AsyncWriteBlock).
        if evict:
            for p in evict:
                self._evict_one(int(p))
            for p in evict:
                self.resident[self.part_to_slot[p]] = -1
                self.part_to_slot[p] = -1

        free_slots = [int(s) for s in np.where(self.resident < 0)[0]]
        if admit:
            pairs = list(zip(admit, free_slots))
            if transfer.chunked_enabled():
                # stream each partition into its slot (<=16 MB pieces; large
                # single puts collapse on remote-attached runtimes). All-zero
                # optimizer-state blocks (never-trained partitions) zero-fill
                # on device instead of transferring zeros.
                dv, ds = self.device_values, self.device_state
                for p, slot in pairs:
                    dv = transfer.write_rows(
                        dv, self.host_values[self.part_rows(p)], slot * self.psize)
                    block = self.host_state[self.part_rows(p)]
                    if block.any():
                        ds = transfer.write_rows(ds, block, slot * self.psize)
                    else:
                        ds = transfer.zero_rows(ds, slot * self.psize, self.psize)
                self.device_values, self.device_state = dv, ds
            else:
                # multi-controller: ONE host->device transfer per array + one
                # compiled multi-slot update
                starts = _arg(np.asarray([slot * self.psize for _, slot in pairs],
                                         np.int32))
                blocks_v = _arg(np.stack(
                    [self.host_values[self.part_rows(p)] for p, _ in pairs]))
                blocks_s = _arg(np.stack(
                    [self.host_state[self.part_rows(p)] for p, _ in pairs]))
                self.device_values = _update_slots(self.device_values, blocks_v, starts)
                self.device_state = _update_slots(self.device_state, blocks_s, starts)
            for p, slot in pairs:
                self.resident[slot] = p
                self.part_to_slot[p] = slot

    def _evict_one(self, p: int) -> None:
        """Queue the device->host writeback of partition ``p``'s slot."""
        slot = int(self.part_to_slot[p])
        start = slot * self.psize
        if self.dirty is not None:
            # sparse path: read the slot's dirty mask (small), gather only
            # dirty rows into a slot-shaped padded block (one compiled take
            # shape), and transfer just the chunks that cover them
            mask = transfer.read_rows(self.dirty, start, self.psize)
            ids = np.nonzero(mask)[0].astype(np.int32)
            k = len(ids)
            if k:
                frac = k / float(self.psize)
                if frac < 0.95:
                    pad = np.full(self.psize, start, np.int32)
                    pad[:k] = start + ids
                    idx = _arg(pad)
                    vals_d = jnp.take(self.device_values, idx, axis=0)
                    stats_d = jnp.take(self.device_state, idx, axis=0)
                    hv = transfer.read_rows_async(vals_d, 0, k)
                    hs = transfer.read_rows_async(stats_d, 0, k)
                    self.pending_writebacks.append(("sparse", p, ids, k, hv, hs))
                else:  # nearly all rows dirty: whole-slot transfer is cheaper
                    hv = transfer.read_rows_async(self.device_values, start, self.psize)
                    hs = transfer.read_rows_async(self.device_state, start, self.psize)
                    self.pending_writebacks.append(("full", [p], hv, hs))
            self.dirty = _clear_range(self.dirty, self._dirty_zero(), start)
            return
        if transfer.chunked_enabled():
            hv = transfer.read_rows_async(self.device_values, start, self.psize)
            hs = transfer.read_rows_async(self.device_state, start, self.psize)
            self.pending_writebacks.append(("full", [p], hv, hs))
            return
        idx = _arg(np.arange(start, start + self.psize))
        vals_d = jnp.take(self.device_values, idx, axis=0)
        stats_d = jnp.take(self.device_state, idx, axis=0)
        for arr in (vals_d, stats_d):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass  # platforms without async copy fall back to drain-time reads
        self.pending_writebacks.append(("full", [p], vals_d, stats_d))

    def _dirty_zero(self) -> jax.Array:
        if getattr(self, "_dirty_zero_block", None) is None or \
                self._dirty_zero_block.shape[0] != self.psize:
            self._dirty_zero_block = jnp.zeros(self.psize, bool)
        return self._dirty_zero_block

    def flush(self) -> None:
        """Write all resident partitions back to host RAM (unload)."""
        self._drain_writebacks()
        if self.resident is None:
            return
        if self.dirty is not None or transfer.chunked_enabled():
            for p in [int(p) for p in self.resident if p >= 0]:
                self._evict_one(p)
            self._drain_writebacks()
            return
        vals = _to_host(self.device_values)
        stats = _to_host(self.device_state)
        for slot, p in enumerate(self.resident):
            if p < 0:
                continue
            rows = self.part_rows(int(p))
            block = slice(slot * self.psize, (slot + 1) * self.psize)
            self.host_values[rows] = vals[block]
            self.host_state[rows] = stats[block]

    # ------------------------------------------------------------------
    def global_to_local(self, ids: np.ndarray) -> np.ndarray:
        """Map global node ids to buffer-local ids (host-side, vectorized)."""
        part = ids // self.psize
        slot = self.part_to_slot[part]
        assert (slot >= 0).all(), "id in a non-resident partition"
        return (slot * self.psize + ids % self.psize).astype(np.int32)

    def slot_valid_counts(self) -> np.ndarray:
        """Valid (non-padding) row count of each resident slot — used to keep
        in-buffer negative sampling off padding rows."""
        out = np.zeros(self.capacity, np.int32)
        for slot, p in enumerate(self.resident):
            out[slot] = self.part_valid_count(int(p)) if p >= 0 else 0
        return out


@jax.jit
def _update_slot(buf: jax.Array, block: jax.Array, start: int) -> jax.Array:
    return jax.lax.dynamic_update_slice(buf, block, (start, 0))


@jax.jit
def mark_dirty(dirty: jax.Array, ids: jax.Array) -> jax.Array:
    """Set dirty[ids] = True (out-of-range ids drop) — trainers call the
    .at[] form inline inside their compiled step; this wrapper serves host
    callers/tests."""
    return dirty.at[ids].set(True, mode="drop")


from functools import partial as _partial


@_partial(jax.jit, donate_argnums=(0,))
def _clear_range(dirty: jax.Array, zeros_block: jax.Array, start) -> jax.Array:
    return jax.lax.dynamic_update_slice(dirty, zeros_block, (start,))


@jax.jit
def _update_slots(buf: jax.Array, blocks: jax.Array, starts: jax.Array) -> jax.Array:
    """Write blocks[i] at row starts[i]; one compiled call for a whole swap."""
    def body(i, b):
        return jax.lax.dynamic_update_slice(b, blocks[i], (starts[i], 0))
    return jax.lax.fori_loop(0, blocks.shape[0], body, buf)


def sparse_adagrad_update_buffer(values: jax.Array, state: jax.Array,
                                 unique_local_ids: jax.Array, grads: jax.Array,
                                 lr: float) -> Tuple[jax.Array, jax.Array]:
    """Row-sparse Adagrad on the device buffer (batch.cpp:62-79 parity);
    padding ids == buffer_rows scatter out of bounds and are dropped."""
    safe = jnp.minimum(unique_local_ids, values.shape[0] - 1)
    new_state_rows = jnp.take(state, safe, axis=0) + grads * grads
    delta = -lr * grads / (jnp.sqrt(new_state_rows) + ADAGRAD_EPS)
    values = values.at[unique_local_ids].add(delta, mode="drop")
    state = state.at[unique_local_ids].set(new_state_rows, mode="drop")
    return values, state


@dataclasses.dataclass
class ReadOnlyPartitionCache:
    """Partition-sliced read-only HBM cache over a host array — the feature/
    label tier of out-of-core node classification (the reference streams
    feature partitions through the same PartitionBuffer; features need no
    writeback, so eviction is free here)."""

    num_rows: int
    num_partitions: int
    capacity: int
    host: np.ndarray                         # (num_partitions * psize, dim)
    device: Optional[jax.Array] = None       # (capacity * psize, dim)
    resident: Optional[np.ndarray] = None
    part_to_slot: Optional[np.ndarray] = None
    sharding: Optional[object] = None        # jax.sharding.Sharding for the
                                             # device cache (multi-chip)

    @property
    def psize(self) -> int:
        return self.host.shape[0] // self.num_partitions

    @property
    def buffer_rows(self) -> int:
        return self.capacity * self.psize

    @staticmethod
    def create(host_rows: np.ndarray, num_rows: int, num_partitions: int,
               capacity: int) -> "ReadOnlyPartitionCache":
        psize = -(-num_rows // num_partitions)
        padded = np.zeros((num_partitions * psize, host_rows.shape[1]),
                          host_rows.dtype)
        padded[:num_rows] = host_rows[:num_rows]
        return ReadOnlyPartitionCache(
            num_rows=num_rows, num_partitions=num_partitions,
            capacity=min(capacity, num_partitions), host=padded)

    def load(self, partitions: Sequence[int]) -> None:
        parts = [int(p) for p in partitions]
        parts += [-1] * (self.capacity - len(parts))
        blocks = [np.zeros((self.psize, self.host.shape[1]), self.host.dtype)
                  if p < 0 else self.host[p * self.psize:(p + 1) * self.psize]
                  for p in parts]
        stacked = np.concatenate(blocks, axis=0)
        self.device = _place(stacked, self.sharding)
        self.resident = np.asarray(parts, np.int32)
        self.part_to_slot = np.full(self.num_partitions, -1, np.int32)
        for slot, p in enumerate(parts):
            if p >= 0:
                self.part_to_slot[p] = slot

    def swap_to_state(self, new_partitions: Sequence[int]) -> None:
        if self.resident is None:
            self.load(new_partitions)
            return
        new_set = set(int(p) for p in new_partitions)
        for slot, p in enumerate(self.resident):
            if p >= 0 and int(p) not in new_set:
                self.part_to_slot[p] = -1
                self.resident[slot] = -1
        admit = sorted(new_set - {int(p) for p in self.resident if p >= 0})
        free = [s for s, p in enumerate(self.resident) if p < 0]
        for p, slot in zip(admit, free):
            block = self.host[p * self.psize:(p + 1) * self.psize]
            self.device = _update_slot(
                self.device, _arg(block, self.sharding), slot * self.psize)
            self.resident[slot] = p
            self.part_to_slot[p] = slot

    def mirror_layout(self, resident: np.ndarray) -> None:
        """Adopt ANOTHER buffer's slot assignment (e.g. the embedding
        PartitionBuffer's) so buffer-local ids index both tiers identically."""
        if self.resident is None:
            self.load([-1] * self.capacity)
        for slot, p in enumerate(resident):
            p = int(p)
            if int(self.resident[slot]) == p:
                continue
            if p >= 0:
                block = self.host[p * self.psize:(p + 1) * self.psize]
                self.device = _update_slot(
                    self.device, _arg(block, self.sharding),
                    slot * self.psize)
            old = int(self.resident[slot])
            if old >= 0 and self.part_to_slot[old] == slot:
                self.part_to_slot[old] = -1
            self.resident[slot] = p
            if p >= 0:
                self.part_to_slot[p] = slot
