"""Out-of-core link-prediction training over a partition buffer.

The TPU re-design of the reference's disk-based training loop
(graph_storage.cpp:335-735 in-memory subgraph + dataloader.cpp:120-183
setActiveEdges + buffer.cpp swaps): the embedding table lives in host RAM,
partitioned over the node dimension; a BETA-ordered schedule of buffer states
brings `capacity` partitions at a time into HBM; each state trains on the edge
buckets whose src AND dst partitions are resident, with ids remapped to
buffer-local slots on the host (vectorized numpy, replacing
updateInMemorySubGraph_'s sort/searchsorted maze, graph_storage.cpp:512-735).

The device step is ONE jitted scan shared by all states (shapes padded to the
largest state), so XLA compiles once per epoch geometry; host->device admits
of the next state are dispatched asynchronously and overlap compute.

Negatives are drawn from the resident buffer only (parity: the reference's
disk mode samples negatives from the in-memory subgraph), skipping padding
rows via per-slot valid counts.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.ordering import (
    assign_edge_buckets,
    beta_ordering,
    comet_ordering,
    greedy_assign_edge_buckets,
)
from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.model import (
    LINK_PREDICTION,
    Model,
    init_model_params,
    lp_batch_loss,
    lp_batch_loss_direct,
    lp_batch_loss_rel,
)
from marius_tpu.nn.optimizers import apply_optimizer, init_optimizer
from marius_tpu.ops.pallas import gather_rows_auto
from marius_tpu.ops.unique import unique_padded
from marius_tpu.parallel.embedding_table import ADAGRAD_EPS, EmbeddingTable
from marius_tpu.parallel.mesh import put_arg as _arg
from marius_tpu.storage.partition_buffer import (
    PartitionBuffer,
    sparse_adagrad_update_buffer,
)
from marius_tpu.tools.preprocess.partitioner import partition_edges
from marius_tpu.train.trainer import TrainState

Array = jax.Array

# placeholder for the shallow path (graph argument unused but part of the
# jitted signature)
_EMPTY_GRAPH = None


class _Immediate:
    """Future-alike that defers work to .result() — the prefetching=false
    (synchronous IO) stand-in for ThreadPoolExecutor.submit."""

    def __init__(self, fn, *args):
        self._fn, self._args = fn, args

    def result(self):
        return self._fn(*self._args)


class PartitionBufferLPTrainer:
    """Shallow-encoder LP training with an out-of-HBM embedding table."""

    def __init__(
        self,
        model: Model,
        num_nodes: int,
        num_relations: int,
        train_edges: np.ndarray,
        neg_config: NegativeSamplingConfig,
        batch_size: int = 1000,
        num_partitions: int = 16,
        buffer_capacity: int = 8,
        seed: int = 0,
        dtype=np.float32,
        ordering: str = "COMET",          # COMET | BETA (EdgeBucketOrdering)
        fine_to_coarse_ratio: int = 2,
        num_cache_partitions: int = 0,
        randomly_assign_edge_buckets: bool = True,
        nbr_configs=(),                   # GNN encoders: per-layer sampling,
                                          # restricted to the resident subgraph
        features=None,                    # (N, F) float32 — FEATURE layers;
                                          # partition-cached alongside the table
        mesh=None,                        # jax.sharding.Mesh — device buffer
                                          # rows sharded over NODE_AXIS,
                                          # batches over DATA_AXIS (GSPMD)
        prefetching: bool = True,         # overlap next-state host prep with
                                          # device compute (storage.prefetching)
        epochs_per_shuffle: int = 1,      # re-shuffle edges every N epochs
        train_filter_keys=None,           # (dst EdgeKeySet, src EdgeKeySet)
                                          # in GLOBAL ids: mask sampled
                                          # negatives that form true train
                                          # edges (negative.cpp:50-197); the
                                          # buffer's local ids are mapped
                                          # back to global via the resident
                                          # slot->partition table per batch
        sparse_writeback: bool = True,    # evictions move only rows the
                                          # trainer actually updated (exact;
                                          # single-controller unsharded only)
        profile_states: bool = False,     # per-state (prep, swap, compute)
                                          # wall times in self.last_state_timings
    ):
        assert model.learning_task == LINK_PREDICTION
        assert model.has_embeddings, "partition-buffer LP needs an embedding table"
        if model.encoder.has_features:
            assert features is not None, "FEATURE layers need a feature matrix"
        if model.encoder.num_gnn_stages:
            assert nbr_configs, "GNN encoder needs neighbor sampling configs"
        assert batch_size % neg_config.num_chunks == 0
        self.model = model
        self.num_nodes = num_nodes
        self.num_relations = num_relations
        self.neg_config = neg_config
        self.batch_size = batch_size
        self.num_partitions = num_partitions
        self.capacity = min(buffer_capacity, num_partitions)
        self.seed = seed
        self.epochs_per_shuffle = max(1, int(epochs_per_shuffle))
        self.ordering = ordering.upper()
        self.fine_to_coarse_ratio = fine_to_coarse_ratio
        self.num_cache_partitions = num_cache_partitions
        self.randomly_assign = randomly_assign_edge_buckets

        self.mesh = mesh
        self.prefetching = prefetching
        self.train_filter_keys = train_filter_keys
        key = jax.random.key(seed)
        self.buffer = PartitionBuffer.create(
            jax.random.fold_in(key, 0), num_nodes, model.encoder.embedding_dim,
            num_partitions, self.capacity, dtype=dtype)
        self.sparse_writeback = bool(
            sparse_writeback and mesh is None and jax.process_count() == 1)
        if self.sparse_writeback:
            self.buffer.enable_dirty_tracking()
        self.profile_states = profile_states
        self.last_state_timings: List[Tuple[float, float, float]] = []
        if mesh is not None:
            # row-shard the HBM working set over the node axis (replicate if
            # the buffer doesn't split evenly); batches shard over data inside
            # the compiled state function. Under a multi-controller mesh,
            # evictions of node-sharded rows allgather the evicted block
            # (partition_buffer._to_host) so every host's RAM table stays
            # identical.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from marius_tpu.parallel.mesh import NODE_AXIS
            n_node = mesh.shape[NODE_AXIS]
            if self.buffer.buffer_rows % n_node == 0:
                self.buffer.sharding = NamedSharding(mesh, P(NODE_AXIS, None))
            else:
                self.buffer.sharding = NamedSharding(mesh, P())

        self.params = init_model_params(jax.random.fold_in(key, 1), model)
        self.opt_state = init_optimizer(model.dense_optimizer, self.params)
        if mesh is not None and jax.process_count() > 1:
            # multi-controller: dense params/opt state must be global arrays
            from marius_tpu.parallel.mesh import replicate_tree
            self.params = replicate_tree(self.params, mesh)
            self.opt_state = replicate_tree(self.opt_state, mesh)
        self.epoch = 0

        # bucket-grouped edges: one stable sort, then per-bucket slices
        edges = np.asarray(train_edges, np.int32)
        self.has_rels = edges.shape[1] == 3
        from marius_tpu.nn.decoders.edge import normalize_decoder_method
        self.decoder_method = (normalize_decoder_method(model.decoder.decoder_method)
                               if model.decoder is not None else "CORRUPT_NODE")
        assert self.decoder_method in ("CORRUPT_NODE", "CORRUPT_REL"), \
            f"training supports CORRUPT_NODE/CORRUPT_REL, got {self.decoder_method}"
        if self.decoder_method == "CORRUPT_REL":
            assert self.has_rels, "CORRUPT_REL needs a 3-column (typed) edge list"
        reordered, sizes = partition_edges(edges, num_nodes, num_partitions)
        self.edges_by_bucket = reordered
        self.bucket_offsets = np.concatenate([[0], np.cumsum(sizes)])
        self.num_edges = len(edges)

        c, n = neg_config.num_chunks, neg_config.negatives_per_positive
        self.unique_cap = 2 * batch_size + 2 * c * n
        # same trick as LinkPredictionTrainer.dense_accum, bounded by the
        # BUFFER size (not the full table): skip sort-based dedup when a
        # buffer-shaped elementwise pass is cheaper
        self.dense_accum = (not nbr_configs and self.buffer.buffer_rows
                            * model.encoder.embedding_dim <= 8_000_000)
        self.nbr_configs = tuple(nbr_configs)
        if self.nbr_configs:
            from marius_tpu.data.samplers.neighbor import estimate_hop_caps
            self.hop_caps = tuple(estimate_hop_caps(
                self.unique_cap, self.nbr_configs, self.buffer.buffer_rows))
        else:
            self.hop_caps = ()
        self.feature_cache = None
        self._features_host = None
        if features is not None and model.encoder.has_features:
            f = np.zeros((num_nodes + 1, features.shape[1]), np.float32)
            f[:num_nodes] = features
            self._features_host = f
            from marius_tpu.storage.partition_buffer import ReadOnlyPartitionCache
            self.feature_cache = ReadOnlyPartitionCache.create(
                np.asarray(features, np.float32), num_nodes, num_partitions,
                self.capacity)
            if mesh is not None and jax.process_count() > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self.feature_cache.sharding = NamedSharding(mesh, P())
        self._state_fn = None
        self._max_batches = 0
        self._max_graph_edges = 0

    # ------------------------------------------------------------------
    def _bucket_edges(self, i: int, j: int) -> np.ndarray:
        b = i * self.num_partitions + j
        return self.edges_by_bucket[self.bucket_offsets[b]:self.bucket_offsets[b + 1]]

    def _plan_epoch(self):
        seed = self.seed + self.epoch
        n, c = self.num_partitions, self.capacity
        r = self.fine_to_coarse_ratio
        coarse_c = c // r - self.num_cache_partitions
        coarse_n = n // r - self.num_cache_partitions
        if self.ordering == "COMET" and n % r == 0 and c % r == 0 \
                and coarse_n >= 1 and (coarse_c >= 2 or coarse_c >= coarse_n):
            states = comet_ordering(n, c, r, self.num_cache_partitions, seed=seed)
        else:
            states = beta_ordering(n, c, seed=seed)
        if self.randomly_assign:
            assignment = assign_edge_buckets(states, n, seed=seed)
        else:
            assignment = greedy_assign_edge_buckets(states, n)
        return states, assignment

    # ------------------------------------------------------------------
    def _build_state_fn(self, num_batches: int):
        """One compiled function that trains `num_batches` fixed-size batches
        against the device buffer."""
        model = self.model
        cfg = self.neg_config
        b = self.batch_size
        c, nneg = cfg.num_chunks, cfg.negatives_per_positive
        psize = self.buffer.psize
        buffer_rows = self.buffer.buffer_rows
        capacity = self.capacity

        def state_fn(values, state, params, opt_state, key, dirty, edges, masks,
                     slot_valid, slot_parts, graph, feats_buf,
                     filter_keys=(None, None)):
            # filter key sets arrive as ARGUMENTS: captured device arrays
            # (jaxpr consts) break donation of the buffer pair on this
            # runtime — every batch would copy values+state in full
            # (tests/test_no_jit_captures.py pins this)
            def batch_step(carry, xs):
                values, state, params, opt_state, key, dirty = carry
                edges_b, mask_b = xs
                if self.mesh is not None:
                    # GSPMD data parallelism over the batch (dense-grad psum
                    # inserted by XLA — model.cpp:136-159 analogue)
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    from marius_tpu.parallel.mesh import DATA_AXIS
                    edges_b = jax.lax.with_sharding_constraint(
                        edges_b, NamedSharding(self.mesh, P(DATA_AXIS, None)))
                    mask_b = jax.lax.with_sharding_constraint(
                        mask_b, NamedSharding(self.mesh, P(DATA_AXIS)))
                key, k_dst, k_src = jax.random.split(key, 3)
                num_deg = int(nneg * cfg.degree_fraction)

                def in_buffer_negs(k, inverse):
                    """Mixture matching the in-memory sampler (negative.cpp:
                    313-366): `degree_fraction` of each chunk's negatives are
                    endpoints of uniformly-drawn batch edges (deg slots
                    FIRST, like torch::cat({deg_sample, uniform})), the rest
                    uniform over the resident buffer's valid rows."""
                    k1, k2, k3 = jax.random.split(k, 3)
                    slots = jax.random.randint(k1, (c, nneg), 0, capacity)
                    offs = jax.random.randint(k2, (c, nneg), 0, psize)
                    valid = slot_valid[slots]
                    uni = (slots * psize
                           + offs % jnp.maximum(valid, 1)).astype(jnp.int32)
                    if num_deg == 0:
                        return uni, None
                    rows = jax.random.randint(k3, (c, num_deg), 0, b,
                                              dtype=jnp.int32)
                    col = 0 if inverse else edges_b.shape[1] - 1
                    deg = jnp.where(mask_b[rows], edges_b[:, col][rows],
                                    uni[:, :num_deg])  # padded row -> uniform
                    return jnp.concatenate([deg, uni[:, num_deg:]], axis=1), rows

                dst_negs, dst_deg_rows = in_buffer_negs(k_dst, False)
                src_negs, src_deg_rows = in_buffer_negs(k_src, True)

                src = jnp.where(mask_b, edges_b[:, 0], buffer_rows)
                dst = jnp.where(mask_b, edges_b[:, -1], buffer_rows)
                rel = edges_b[:, 1] if self.has_rels else None

                # CORRUPT_REL (model.cpp:271-273): negatives are sampled
                # relation ids; the node-negative machinery above still runs
                # (rows gathered, zero grads) to keep one compiled layout
                corrupt_rel = self.decoder_method == "CORRUPT_REL"
                neg_rel_ids = None
                if corrupt_rel:
                    key, k_relneg = jax.random.split(key)
                    neg_rel_ids = jax.random.randint(
                        k_relneg, (c, nneg), 0, max(self.num_relations, 1),
                        dtype=jnp.int32)

                dst_filter = src_filter = None
                if self.train_filter_keys is not None:
                    # train-time false-negative filtering over the resident
                    # subgraph (negative.cpp:50-197): keys are GLOBAL, so map
                    # buffer-local ids back through the slot->partition table
                    from marius_tpu.ops.edge_keys import filter_mask_sampled

                    def to_global(lids):
                        slots = jnp.minimum(lids // psize, capacity - 1)
                        return slot_parts[slots] * psize + lids % psize

                    dst_keys, src_keys = filter_keys
                    dst_filter = filter_mask_sampled(
                        dst_keys, to_global(src), rel, to_global(dst_negs))
                    src_filter = filter_mask_sampled(
                        src_keys, to_global(dst), rel, to_global(src_negs))
                elif num_deg and (cfg.local_filter_mode or "DEG").upper() == "DEG":
                    # DEG local filter (negative.cpp:21-48): mask deg-sampled
                    # negative slots that reproduce their own source edge
                    from marius_tpu.data.samplers.negative import deg_local_filter_mask
                    dst_filter = deg_local_filter_mask(dst_deg_rows, b, nneg)
                    src_filter = deg_local_filter_mask(src_deg_rows, b, nneg)

                all_ids = jnp.concatenate(
                    [src, dst, dst_negs.reshape(-1), src_negs.reshape(-1)])
                inv_rel_on = (model.decoder.use_inverse_relations
                              and self.has_rels)

                def _shallow_feats(ids):
                    """Feature rows for shallow FEATURE stages (the
                    reference's distmult_feat family over disk storage):
                    the partition cache is slot-aligned with the embedding
                    buffer, so the same local ids index it; padding ids
                    read the sentinel-zero treatment via the mask."""
                    if feats_buf is None:
                        return None
                    f = feats_buf[jnp.minimum(ids, buffer_rows - 1)]
                    return jnp.where((ids < buffer_rows)[:, None], f, 0.0)

                def _shallow_encode(x, feats, dense_params):
                    """Shallow encoders ride encoder_forward like the
                    in-memory trainer (bias/activation/REDUCTION semantics);
                    identity for a plain EMBEDDING stage."""
                    from marius_tpu.nn.encoder import encoder_forward
                    return encoder_forward(model.encoder,
                                           dense_params["encoder"], x, feats)

                if self.nbr_configs:
                    # GNN encoder over the resident subgraph: batch unique ids
                    # seed multi-hop sampling; raw rows are gathered for the
                    # outermost hop and updates land on that hop's rows
                    # (mirrors LinkPredictionTrainer's GNN path in local ids)
                    from marius_tpu.data.samplers.neighbor import sample_neighbor_batch
                    from marius_tpu.nn.encoder import encoder_forward
                    uniq = unique_padded(all_ids, size=self.unique_cap,
                                         fill_value=buffer_rows)
                    inv_src = uniq.inverse[:b]
                    inv_dst = uniq.inverse[b:2 * b]
                    inv_dst_negs = uniq.inverse[2 * b:2 * b + c * nneg].reshape(c, nneg)
                    inv_src_negs = uniq.inverse[2 * b + c * nneg:].reshape(c, nneg)
                    k_nb, key = jax.random.split(key)
                    nbr_batch = sample_neighbor_batch(
                        k_nb, graph, uniq.ids, uniq.ids < buffer_rows,
                        self.nbr_configs, self.hop_caps)
                    update_ids = nbr_batch.node_ids[0]
                    x0 = gather_rows_auto(
                        values, jnp.minimum(update_ids, buffer_rows - 1))

                    k_drop, key = jax.random.split(key)
                    feats = None
                    if feats_buf is not None:
                        feats = feats_buf[jnp.minimum(update_ids, buffer_rows - 1)]
                        feats = jnp.where((update_ids < buffer_rows)[:, None],
                                          feats, 0.0)

                    def loss_fn(x, dense_params):
                        encoded = encoder_forward(
                            model.encoder, dense_params["encoder"], x, feats,
                            nbr_batch, degrees=graph.degrees, train=True,
                            dropout_key=k_drop)
                        if corrupt_rel:
                            loss, _ = lp_batch_loss_rel(
                                model, dense_params, encoded[inv_src],
                                encoded[inv_dst], rel, neg_rel_ids, mask_b)
                        else:
                            loss, _ = lp_batch_loss(
                                model, dense_params, encoded, inv_src, inv_dst, rel,
                                inv_dst_negs,
                                inv_src_negs if inv_rel_on else None,
                                mask_b, dst_filter,
                                src_filter if inv_rel_on else None)
                        return loss
                elif self.dense_accum:
                    update_ids = all_ids
                    x0 = gather_rows_auto(
                        values, jnp.minimum(all_ids, buffer_rows - 1))
                    feats = _shallow_feats(all_ids)

                    def loss_fn(x, dense_params):
                        enc = _shallow_encode(x, feats, dense_params)
                        d = enc.shape[-1]
                        if corrupt_rel:
                            loss, _ = lp_batch_loss_rel(
                                model, dense_params, enc[:b], enc[b:2 * b],
                                rel, neg_rel_ids, mask_b)
                        else:
                            loss, _ = lp_batch_loss_direct(
                                model, dense_params, enc[:b], enc[b:2 * b], rel,
                                enc[2 * b:2 * b + c * nneg].reshape(c, nneg, d),
                                enc[2 * b + c * nneg:].reshape(c, nneg, d)
                                if inv_rel_on else None,
                                mask_b, dst_filter,
                                src_filter if inv_rel_on else None)
                        return loss
                else:
                    uniq = unique_padded(all_ids, size=self.unique_cap,
                                         fill_value=buffer_rows)
                    update_ids = uniq.ids
                    inv_src = uniq.inverse[:b]
                    inv_dst = uniq.inverse[b:2 * b]
                    inv_dst_negs = uniq.inverse[2 * b:2 * b + c * nneg].reshape(c, nneg)
                    inv_src_negs = uniq.inverse[2 * b + c * nneg:].reshape(c, nneg)
                    x0 = gather_rows_auto(
                        values, jnp.minimum(uniq.ids, buffer_rows - 1))
                    feats = _shallow_feats(uniq.ids)

                    def loss_fn(x, dense_params):
                        enc = _shallow_encode(x, feats, dense_params)
                        if corrupt_rel:
                            loss, _ = lp_batch_loss_rel(
                                model, dense_params, enc[inv_src],
                                enc[inv_dst], rel, neg_rel_ids, mask_b)
                        else:
                            loss, _ = lp_batch_loss(
                                model, dense_params, enc, inv_src, inv_dst, rel,
                                inv_dst_negs,
                                inv_src_negs if inv_rel_on else None,
                                mask_b, dst_filter,
                                src_filter if inv_rel_on else None)
                        return loss

                loss, (gx, gdense) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(x0, params)
                if self.dense_accum:
                    G = jnp.zeros_like(values).at[update_ids].add(gx, mode="drop")
                    new_state = state + G * G
                    values = values - model.sparse_lr * G / (
                        jnp.sqrt(new_state) + ADAGRAD_EPS)
                    state = new_state
                else:
                    values, state = sparse_adagrad_update_buffer(
                        values, state, update_ids, gx, model.sparse_lr)
                if dirty is not None:
                    # dirty-row tracking for sparse eviction writeback:
                    # padding ids (== buffer_rows) drop out of range
                    dirty = dirty.at[update_ids].set(True, mode="drop")
                params, opt_state = apply_optimizer(
                    model.dense_optimizer, params, opt_state, gdense)
                return (values, state, params, opt_state, key, dirty), loss

            carry = (values, state, params, opt_state, key, dirty)
            carry, losses = jax.lax.scan(
                batch_step, carry,
                (edges.reshape(num_batches, b, edges.shape[-1]),
                 masks.reshape(num_batches, b)))
            return carry, jnp.sum(losses)

        return jax.jit(state_fn, donate_argnums=(0, 1, 2, 3, 5))

    # ------------------------------------------------------------------
    def _state_graph(self, max_edges: int):
        """Local CSR over the resident subgraph (all resident bucket pairs),
        padded to max_edges — same construction as the NC buffer path."""
        from marius_tpu import native
        from marius_tpu.data.graph import DeviceGraph

        P = self.num_partitions
        resident = [int(p) for p in self.buffer.resident if p >= 0]
        bucket_ids = np.asarray(
            [i * P + j for i in resident for j in resident], np.int32)
        local = native.gather_remap_buckets(
            self.edges_by_bucket, self.bucket_offsets, bucket_ids,
            self.buffer.part_to_slot, self.buffer.psize)
        n = self.buffer.buffer_rows
        src, dst = local[:, 0], local[:, -1]
        rel = local[:, 1] if self.has_rels else None

        def one_dir(anchor, other, rels):
            order = np.argsort(anchor, kind="stable")
            offs = native.csr_offsets(anchor[order], n).astype(np.int32)
            offs = np.concatenate([offs, offs[-1:]])
            cols = np.full(max_edges, n, np.int32)
            cols[:len(other)] = other[order]
            rel_arr = None
            if rels is not None:
                rel_arr = np.zeros(max_edges, np.int32)
                rel_arr[:len(rels)] = rels[order]
                rel_arr = _arg(rel_arr)
            return _arg(offs), _arg(cols), rel_arr

        out_offsets, out_cols, out_rels = one_dir(src, dst, rel)
        in_offsets, in_cols, in_rels = one_dir(dst, src, rel)
        deg = np.zeros(n + 1, np.int32)
        np.add.at(deg, src, 1)
        np.add.at(deg, dst, 1)
        deg[n:] = 0
        return DeviceGraph(
            out_offsets=out_offsets, out_cols=out_cols, out_rels=out_rels,
            in_offsets=in_offsets, in_cols=in_cols, in_rels=in_rels,
            degrees=_arg(deg), num_nodes=n,
            num_relations=self.num_relations)

    # ------------------------------------------------------------------
    def train_epoch(self, max_states: Optional[int] = None,
                    time_budget_s: Optional[float] = None,
                    final_flush: bool = True) -> Dict[str, float]:
        """Train one epoch over the buffer schedule. ``max_states`` /
        ``time_budget_s`` cut the schedule short after that many states /
        seconds (benchmark time-boxing; the partial epoch is still exact for
        the states it ran — evictions/flush land every update).
        ``final_flush=False`` skips the end-of-epoch host writeback of the
        resident set (benchmarks that discard the state; the next epoch's
        load() re-reads the host table, so unflushed resident updates are
        dropped)."""
        t0 = time.perf_counter()
        states, assignment = self._plan_epoch()
        from marius_tpu import native

        state_sizes = []
        P = self.num_partitions
        for buckets in assignment:
            state_sizes.append(sum(
                int(self.bucket_offsets[i * P + j + 1]
                    - self.bucket_offsets[i * P + j]) for i, j in buckets))
        # round the padded batch count up so different BETA schedules across
        # epochs reuse the same compiled state function: powers of two up to
        # 256, then ~1/16-granularity buckets (pure pow2 wastes up to 2x in
        # masked batches at thousands-of-batches states)
        max_batches = max(1, max(-(-s // self.batch_size) for s in state_sizes))
        if max_batches <= 256:
            max_batches = 1 << (max_batches - 1).bit_length()
        else:
            step = 1 << max(max_batches.bit_length() - 4, 8)
            max_batches = -(-max_batches // step) * step
        max_graph_edges = 0
        if self.nbr_configs:
            max_graph_edges = 1 << (max(1, max(
                int(sum(self.bucket_offsets[i * P + j + 1]
                        - self.bucket_offsets[i * P + j]
                        for i in st for j in st)) for st in states)) - 1).bit_length()
        if self._state_fn is None or max_batches != self._max_batches \
                or max_graph_edges != self._max_graph_edges:
            self._state_fn = self._build_state_fn(max_batches)
            self._max_batches = max_batches
            self._max_graph_edges = max_graph_edges

        key = jax.random.fold_in(jax.random.key(self.seed + 7), self.epoch)
        if self.mesh is not None and jax.process_count() > 1:
            from marius_tpu.parallel.mesh import replicate_tree
            key = replicate_tree(key, self.mesh)
        self.buffer.load(states[0])
        pad_rows = max_batches * self.batch_size
        cols = 3 if self.has_rels else 2

        # Pipeline overlap (the reference's LoadBatchWorker pool,
        # pipeline.cpp:19-49, reduced to one prefetch thread): the next
        # state's host work — native bucket gather + shuffle on GLOBAL ids —
        # runs while the device trains the current state. The global->local
        # remap is deferred to arrival because it needs that state's slots.
        import concurrent.futures as cf

        def prep(s_idx):
            buckets = assignment[s_idx]
            bucket_ids = np.asarray(
                [i * P + j for i, j in buckets], np.int32)
            identity = np.arange(P, dtype=np.int32)  # no remap yet
            e = native.gather_remap_buckets(
                self.edges_by_bucket, self.bucket_offsets, bucket_ids,
                identity, self.buffer.psize)
            return native.shuffle_rows(
                e, seed=(self.seed * 977 + self.epoch // self.epochs_per_shuffle)
                * 1009 + s_idx)

        losses = []
        edges_trained = 0
        states_run = 0
        self.last_state_timings = []
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            # storage.prefetching=false: next-state host prep runs inline
            # after the current state (the reference's synchronous IO mode)
            submit = pool.submit if self.prefetching else \
                (lambda f, *a: _Immediate(f, *a))
            fut = submit(prep, 0)
            for s_idx, st in enumerate(states):
                t_s0 = time.perf_counter()
                edges_global = fut.result()
                if s_idx + 1 < len(states):
                    fut = submit(prep, s_idx + 1)
                t_s1 = time.perf_counter()
                self.buffer.swap_to_state(st)
                if self.feature_cache is not None:
                    # mirror the embedding buffer's slots: local ids must
                    # index both tiers identically
                    self.feature_cache.mirror_layout(self.buffer.resident)
                if self.profile_states:
                    # the admit writes are dispatched async; without a
                    # barrier their device-side completion serializes ahead
                    # of the state_fn and lands in the compute bucket
                    # (costs nothing real: the state_fn's first gather
                    # data-depends on the admitted rows either way)
                    jax.block_until_ready((self.buffer.device_values,
                                           self.buffer.device_state))
                t_s2 = time.perf_counter()
                local = edges_global
                for col in (0, cols - 1):
                    local[:, col] = native.global_to_local(
                        local[:, col], self.buffer.part_to_slot,
                        self.buffer.psize, self.buffer.buffer_rows)[0]
                padded = np.zeros((pad_rows, cols), np.int32)
                padded[:len(local)] = local
                masks = np.arange(pad_rows) < len(local)

                graph = (self._state_graph(max_graph_edges)
                         if self.nbr_configs else _EMPTY_GRAPH)
                (self.buffer.device_values, self.buffer.device_state,
                 self.params, self.opt_state, key,
                 self.buffer.dirty), loss = self._state_fn(
                    self.buffer.device_values, self.buffer.device_state,
                    self.params, self.opt_state, key, self.buffer.dirty,
                    _arg(padded), _arg(masks),
                    _arg(self.buffer.slot_valid_counts()),
                    _arg(np.asarray(self.buffer.resident, np.int32)), graph,
                    self.feature_cache.device
                    if self.feature_cache is not None else None,
                    self.train_filter_keys or (None, None))
                losses.append(loss)  # lazy: don't block the dispatch queue
                edges_trained += len(local)
                states_run += 1
                if self.profile_states:
                    jax.block_until_ready(loss)
                    self.last_state_timings.append(
                        (t_s1 - t_s0, t_s2 - t_s1, time.perf_counter() - t_s2))
                if (max_states is not None and states_run >= max_states) or \
                        (time_budget_s is not None
                         and time.perf_counter() - t0 > time_budget_s):
                    break

        total_loss = float(jnp.sum(jnp.stack(losses)))
        if final_flush:
            self.buffer.flush()
        else:
            self.buffer._drain_writebacks()
        self.epoch += 1
        dt = time.perf_counter() - t0
        return {
            "loss": total_loss,
            "epoch_time_s": dt,
            "edges_per_sec": edges_trained / dt,
            "num_edges": self.num_edges,
            "edges_trained": edges_trained,
            "num_buffer_states": len(states),
            "states_run": states_run,
        }

    def train(self, num_epochs: int):
        return [self.train_epoch() for _ in range(num_epochs)]

    # ------------------------------------------------------------------
    # TrainState view for evaluators / checkpointing
    @property
    def state(self) -> TrainState:
        """Full-table TrainState view. Leaves stay HOST-side numpy so
        checkpointing never copies the table through the device; evaluators
        move it to HBM only when they actually score against it (full-table
        evaluation inherently needs the table on device)."""
        self.buffer.flush()
        n = self.num_nodes
        return TrainState(
            table=EmbeddingTable(
                values=self.buffer.host_values[:n],
                state=self.buffer.host_state[:n]),
            params=self.params,
            opt_state=self.opt_state,
            key=jax.random.key(self.seed),
            epoch=jnp.asarray(self.epoch, jnp.int32),
        )

    @state.setter
    def state(self, s: TrainState) -> None:
        n = self.num_nodes
        self.buffer.host_values[:n] = np.asarray(s.table.values)
        self.buffer.host_state[:n] = np.asarray(s.table.state)
        self.buffer.resident = None  # force reload on next epoch
        self.params = s.params
        self.opt_state = s.opt_state
        if self.mesh is not None and jax.process_count() > 1:
            # restored leaves may be host/local: re-place them globally
            from marius_tpu.parallel.mesh import replicate_tree
            self.params = replicate_tree(self.params, self.mesh)
            self.opt_state = replicate_tree(self.opt_state, self.mesh)
        self.epoch = int(s.epoch)

    # GNN-path attributes the manager probes on trainers
    graph = None

    @property
    def features(self):
        """(N+1, F) sentinel-padded device features for full-graph evaluation
        (train-time features stay in the partition cache). Transferred once on
        first access and cached; for feature tables too large for HBM use
        evaluate_from_host_table-style streaming instead."""
        if self._features_host is None:
            return None
        if getattr(self, "_features_dev", None) is None:
            self._features_dev = jnp.asarray(self._features_host)
        return self._features_dev
