"""Out-of-core node classification over partitioned features.

The TPU re-design of the reference's disk-based NC path (getNodePartition
Ordering, data/ordering.cpp:294-410 + dataloader nodeSample): node features
live in host RAM, partitioned over the node dimension; a DISPERSED or
SEQUENTIAL ordering brings `capacity` partitions at a time into an HBM cache;
each buffer state trains the resident partitions' train nodes, with neighbor
sampling restricted to the resident subgraph (exactly the reference's
approximation — MariusGNN's dispersed ordering trades neighborhood coverage
for IO).

Per state, the host (native C++ runtime) gathers the resident edge buckets,
remaps endpoints to buffer-local ids, and builds a local CSR; the device runs
one compiled scan over seed batches (sampling + encode + loss + dense update).
All per-state arrays are padded to the largest state so ONE compilation serves
the whole epoch.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.graph import DeviceGraph
from marius_tpu.data.ordering import dispersed_node_ordering, sequential_node_ordering
from marius_tpu.data.samplers.neighbor import (
    NeighborSamplingConfig,
    estimate_hop_caps,
    sample_neighbor_batch,
)
from marius_tpu.nn.encoder import encoder_forward
from marius_tpu.nn.model import NODE_CLASSIFICATION, Model, init_model_params, nc_batch_loss
from marius_tpu.nn.optimizers import apply_optimizer, init_optimizer
from marius_tpu.parallel.mesh import put_arg as _arg
from marius_tpu.storage.partition_buffer import (
    PartitionBuffer,
    ReadOnlyPartitionCache,
    sparse_adagrad_update_buffer,
)
from marius_tpu.tools.preprocess.partitioner import partition_edges
from marius_tpu.train.trainer import TrainState

Array = jax.Array


class PartitionBufferNCTrainer:
    """Feature-encoder GNN node classification with out-of-HBM features."""

    def __init__(
        self,
        model: Model,
        edges: np.ndarray,              # (E, 2) int32
        features: np.ndarray,           # (N, F) float32
        labels: np.ndarray,             # (N,) int
        train_nodes: np.ndarray,
        nbr_configs: Sequence[NeighborSamplingConfig],
        num_nodes: int,
        batch_size: int = 1000,
        num_partitions: int = 16,
        buffer_capacity: int = 8,
        ordering: str = "DISPERSED",    # DISPERSED | SEQUENTIAL
        seed: int = 0,
        mesh=None,   # jax.sharding.Mesh — data-parallel sub-batches within
                     # each buffer state: the HBM feature cache is replicated,
                     # seeds shard over the data axis, dense grads psum
                     # (model.cpp:136-159 all_reduce analogue)
        epochs_per_shuffle: int = 1,   # re-shuffle train seeds every N epochs
    ):
        assert model.learning_task == NODE_CLASSIFICATION
        # Learnable embeddings co-buffer with the features (optional NC
        # embedding storage, io.cpp:347-433): a writable PartitionBuffer
        # holds the table + Adagrad state, swapping in lockstep with the
        # feature cache so buffer-local ids index both tiers identically.
        self.has_emb = model.has_embeddings
        assert not (self.has_emb and mesh is not None), \
            "embedding-table NC over the buffer is single-controller"
        self.model = model
        self.num_nodes = num_nodes
        self.batch_size = batch_size
        self.nbr_configs = tuple(nbr_configs)
        self.ordering = ordering.upper()
        self.seed = seed
        self.num_partitions = num_partitions
        self.mesh = mesh
        local_batch = batch_size
        if mesh is not None:
            from marius_tpu.parallel.mesh import DATA_AXIS
            self._n_data = mesh.shape[DATA_AXIS]
            assert batch_size % self._n_data == 0, \
                f"batch_size {batch_size} % data axis {self._n_data} != 0"
            local_batch = batch_size // self._n_data

        self.cache = None
        if features is not None:
            self.cache = ReadOnlyPartitionCache.create(
                np.asarray(features, np.float32), num_nodes, num_partitions,
                buffer_capacity)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self.cache.sharding = NamedSharding(mesh, P())
        self.emb_buffer = None
        if self.has_emb:
            self.emb_buffer = PartitionBuffer.create(
                jax.random.fold_in(jax.random.key(seed), 3), num_nodes,
                model.encoder.embedding_dim, num_partitions, buffer_capacity)
        assert self.cache is not None or self.emb_buffer is not None, \
            "NC needs features and/or an embedding table"
        # the WRITABLE buffer owns the slot layout (its swaps drain async
        # writebacks); the read-only feature cache mirrors it
        ref = self.emb_buffer if self.emb_buffer is not None else self.cache
        self.capacity = ref.capacity
        psize = ref.psize
        self._ref = ref

        lab = np.zeros(self.num_partitions * psize, np.int32)
        lab[:num_nodes] = np.asarray(labels, np.int32)
        self.labels_host = lab

        # bucket-grouped edges (src_part, dst_part) like the LP buffer path
        e = np.asarray(edges, np.int32)[:, [0, -1]]
        grouped, sizes = partition_edges(e, num_nodes, num_partitions)
        self.edges_by_bucket = grouped
        self.bucket_offsets = np.concatenate([[0], np.cumsum(sizes)])

        # train nodes grouped by partition
        tn = np.asarray(train_nodes, np.int32)
        self.train_by_part = [tn[tn // psize == p] for p in range(num_partitions)]
        self.num_train = len(tn)

        self.hop_caps = tuple(estimate_hop_caps(
            local_batch, self.nbr_configs, self._ref.buffer_rows))

        key = jax.random.key(seed)
        self.params = init_model_params(jax.random.fold_in(key, 1), model)
        self.opt_state = init_optimizer(model.dense_optimizer, self.params)
        if mesh is not None and jax.process_count() > 1:
            # multi-controller: dense params/opt state must be global arrays
            from marius_tpu.parallel.mesh import replicate_tree
            self.params = replicate_tree(self.params, mesh)
            self.opt_state = replicate_tree(self.opt_state, mesh)
        self.epoch = 0
        self.epochs_per_shuffle = max(1, int(epochs_per_shuffle))
        self._state_fn = None
        self._shapes = None

    # ------------------------------------------------------------------
    def _swap_state(self, st) -> None:
        if self.emb_buffer is not None:
            if self.emb_buffer.resident is None:
                self.emb_buffer.load(st)
            else:
                self.emb_buffer.swap_to_state(st)
            if self.cache is not None:
                self.cache.mirror_layout(self.emb_buffer.resident)
        else:
            self.cache.swap_to_state(st)

    def flush(self) -> None:
        """Drain the embedding buffer's device slots back to host (checkpoint
        boundary; PartitionBuffer.flush analogue of buffer.cpp unload)."""
        if self.emb_buffer is not None:
            self.emb_buffer.flush()

    # ------------------------------------------------------------------
    def _plan_epoch(self) -> List[np.ndarray]:
        if self.ordering == "SEQUENTIAL":
            return sequential_node_ordering(self.num_partitions, self.capacity)
        return dispersed_node_ordering(self.num_partitions, self.capacity,
                                       seed=self.seed + self.epoch)

    def _build_state_fn(self, num_batches: int):
        model = self.model
        buffer_rows = self._ref.buffer_rows
        data_axis = None
        if self.mesh is not None:
            from marius_tpu.parallel.mesh import DATA_AXIS
            data_axis = DATA_AXIS

        has_emb = self.has_emb
        sparse_lr = model.sparse_lr

        def state_fn(params, opt_state, key, feats_buf, emb_values, emb_state,
                     graph: DeviceGraph, seeds, masks, labels):
            # seeds/masks/labels: (num_batches, b) — under shard_map the
            # trailing dim is this shard's sub-batch
            def batch_step(carry, xs):
                params, opt_state, key, emb_values, emb_state = carry
                seeds_b, mask_b, labels_b = xs
                key, k_s = jax.random.split(key)
                if data_axis is not None:
                    k_s = jax.random.fold_in(
                        k_s, jax.lax.axis_index(data_axis))
                nb = sample_neighbor_batch(k_s, graph, seeds_b, mask_b,
                                           self.nbr_configs, self.hop_caps)
                outer = nb.node_ids[0]
                valid = (outer < buffer_rows)[:, None]
                feats = None
                if feats_buf is not None:
                    feats = feats_buf[jnp.minimum(outer, buffer_rows - 1)]
                    feats = jnp.where(valid, feats, 0.0)
                emb0 = None
                if has_emb:
                    emb0 = emb_values[jnp.minimum(outer, buffer_rows - 1)]
                    emb0 = jnp.where(valid, emb0, 0.0)
                loss_mask = mask_b & nb.seed_mask

                w = 1.0
                if (data_axis is not None
                        and model.loss_reduction.upper() == "MEAN"):
                    # re-weight so the psum'd MEAN equals the global mean
                    local = jnp.sum(loss_mask.astype(jnp.float32))
                    total = jnp.maximum(
                        jax.lax.psum(local, data_axis), 1.0)
                    w = local / total

                def loss_fn(emb, dense_params):
                    logits = encoder_forward(
                        model.encoder, dense_params["encoder"], emb, feats, nb,
                        degrees=graph.degrees, train=True,
                        dropout_key=jax.random.fold_in(k_s, 99))
                    return nc_batch_loss(model, logits, labels_b,
                                         loss_mask) * w

                if has_emb:
                    loss, (g_emb, g) = jax.value_and_grad(
                        loss_fn, argnums=(0, 1))(emb0, params)
                    # hop ids are unique per batch: the row-sparse Adagrad
                    # rule applies directly on buffer-local rows
                    emb_values, emb_state = sparse_adagrad_update_buffer(
                        emb_values, emb_state, outer, g_emb, sparse_lr)
                else:
                    loss, g = jax.value_and_grad(loss_fn, argnums=1)(
                        None, params)
                if data_axis is not None:
                    g = jax.lax.psum(g, data_axis)
                    loss = jax.lax.psum(loss, data_axis)
                params, opt_state = apply_optimizer(
                    model.dense_optimizer, params, opt_state, g)
                return (params, opt_state, key, emb_values, emb_state), loss

            carry0 = (params, opt_state, key, emb_values, emb_state)
            (params, opt_state, key, emb_values, emb_state), losses = \
                jax.lax.scan(batch_step, carry0, (seeds, masks, labels))
            return (params, opt_state, key, emb_values, emb_state,
                    jnp.sum(losses))

        if self.mesh is None:
            donate = (0, 1, 4, 5) if has_emb else (0, 1)
            return jax.jit(state_fn, donate_argnums=donate)

        # mesh mode carries no embedding table (asserted in __init__):
        # shard_map sees the original feature-only signature
        def state_fn_mesh(params, opt_state, key, feats_buf, graph,
                          seeds, masks, labels):
            out = state_fn(params, opt_state, key, feats_buf, None, None,
                           graph, seeds, masks, labels)
            return out[0], out[1], out[2], out[5]

        from jax.sharding import PartitionSpec as P
        fn = jax.shard_map(
            state_fn_mesh, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(),
                      P(None, data_axis), P(None, data_axis),
                      P(None, data_axis)),
            out_specs=(P(), P(), P(), P()), check_vma=False)
        return jax.jit(fn, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def _state_graph(self, max_edges: int) -> DeviceGraph:
        """Local CSR over the resident subgraph, padded to max_edges."""
        from marius_tpu import native

        P = self.num_partitions
        resident = [int(p) for p in self._ref.resident if p >= 0]
        bucket_ids = np.asarray(
            [i * P + j for i in resident for j in resident], np.int32)
        local = native.gather_remap_buckets(
            self.edges_by_bucket, self.bucket_offsets, bucket_ids,
            self._ref.part_to_slot, self._ref.psize)
        n = self._ref.buffer_rows
        src, dst = local[:, 0], local[:, 1]

        def one_dir(anchor, other):
            order = np.argsort(anchor, kind="stable")
            offs = native.csr_offsets(anchor[order], n).astype(np.int32)
            offs = np.concatenate([offs, offs[-1:]])
            cols = np.full(max_edges, n, np.int32)
            cols[:len(other)] = other[order]
            return _arg(offs), _arg(cols)

        out_offsets, out_cols = one_dir(src, dst)
        in_offsets, in_cols = one_dir(dst, src)
        deg = np.zeros(n + 1, np.int32)
        np.add.at(deg, src, 1)
        np.add.at(deg, dst, 1)
        deg[n:] = 0
        return DeviceGraph(
            out_offsets=out_offsets, out_cols=out_cols, out_rels=None,
            in_offsets=in_offsets, in_cols=in_cols, in_rels=None,
            degrees=_arg(deg), num_nodes=n, num_relations=1)

    # ------------------------------------------------------------------
    def train_epoch(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        states = self._plan_epoch()
        rng = np.random.default_rng(
            self.seed * 131 + self.epoch // self.epochs_per_shuffle)
        psize = self._ref.psize
        P = self.num_partitions

        # pad all states to common shapes -> one compilation
        def pow2(x):
            return 1 << max(0, x - 1).bit_length()

        max_seeds = max(sum(len(self.train_by_part[p]) for p in st)
                        for st in states)
        max_batches = pow2(-(-max(max_seeds, 1) // self.batch_size))
        max_edges = pow2(max(
            int(sum(self.bucket_offsets[i * P + j + 1] - self.bucket_offsets[i * P + j]
                    for i in st for j in st)) for st in states) or 1)
        shapes = (max_batches, max_edges)
        if self._state_fn is None or self._shapes != shapes:
            self._state_fn = self._build_state_fn(max_batches)
            self._shapes = shapes

        key = jax.random.fold_in(jax.random.key(self.seed + 17), self.epoch)
        if self.mesh is not None and jax.process_count() > 1:
            from marius_tpu.parallel.mesh import replicate_tree
            key = replicate_tree(key, self.mesh)
        losses = []
        pad_rows = max_batches * self.batch_size
        fill = self._ref.buffer_rows
        for st in states:
            self._swap_state(st)
            graph = self._state_graph(max_edges)
            seeds_g = np.concatenate(
                [self.train_by_part[p] for p in st]) if len(st) else \
                np.zeros(0, np.int32)
            rng.shuffle(seeds_g)
            slot = self._ref.part_to_slot[seeds_g // psize]
            seeds_l = (slot * psize + seeds_g % psize).astype(np.int32)
            labels = self.labels_host[seeds_g]

            seeds_pad = np.full(pad_rows, fill, np.int32)
            seeds_pad[:len(seeds_l)] = seeds_l
            labels_pad = np.zeros(pad_rows, np.int32)
            labels_pad[:len(labels)] = labels
            masks = np.arange(pad_rows) < len(seeds_l)

            b = self.batch_size
            feats_dev = self.cache.device if self.cache is not None else None
            batch_args = (_arg(seeds_pad.reshape(max_batches, b)),
                          _arg(masks.reshape(max_batches, b)),
                          _arg(labels_pad.reshape(max_batches, b)))
            if self.mesh is None:
                emb_v = emb_s = None
                if self.has_emb:
                    emb_v = self.emb_buffer.device_values
                    emb_s = self.emb_buffer.device_state
                (self.params, self.opt_state, key, emb_v, emb_s,
                 loss) = self._state_fn(
                    self.params, self.opt_state, key, feats_dev,
                    emb_v, emb_s, graph, *batch_args)
                if self.has_emb:
                    self.emb_buffer.device_values = emb_v
                    self.emb_buffer.device_state = emb_s
            else:
                self.params, self.opt_state, key, loss = self._state_fn(
                    self.params, self.opt_state, key, feats_dev, graph,
                    *batch_args)
            losses.append(loss)

        total_loss = float(jnp.sum(jnp.stack(losses)))
        self.epoch += 1
        dt = time.perf_counter() - t0
        return {
            "loss": total_loss,
            "epoch_time_s": dt,
            "nodes_per_sec": self.num_train / dt,
            "num_nodes_trained": self.num_train,
            "num_buffer_states": len(states),
        }

    def train(self, num_epochs: int):
        return [self.train_epoch() for _ in range(num_epochs)]

    # ------------------------------------------------------------------
    def evaluate_nodes(self, eval_nodes: np.ndarray) -> Dict[str, float]:
        """Streaming accuracy over a node split: the same buffer-state machine
        without updates (the reference's partitioned NC evaluation)."""
        from marius_tpu.reporting.metrics import categorical_accuracy_statistics
        from marius_tpu.reporting.reporters import NodeClassificationReporter

        states = self._plan_epoch()
        psize = self._ref.psize
        en = np.asarray(eval_nodes, np.int32)
        eval_by_part = [en[en // psize == p] for p in range(self.num_partitions)]
        max_seeds = max(max(sum(len(eval_by_part[p]) for p in st)
                            for st in states), 1)
        nb_batches = -(-max_seeds // self.batch_size)
        pad_rows = nb_batches * self.batch_size
        P = self.num_partitions
        max_edges = 1 << (max(int(sum(
            self.bucket_offsets[i * P + j + 1] - self.bucket_offsets[i * P + j]
            for i in st for j in st)) for st in states) - 1).bit_length()
        fill = self._ref.buffer_rows
        model = self.model

        @jax.jit
        def eval_fn(params, feats_buf, emb_buf, graph, seeds, masks, labels):
            def body(acc, xs):
                seeds_b, mask_b, labels_b = xs
                k = jax.random.fold_in(jax.random.key(3), acc["count"].astype(jnp.int32))
                nb = sample_neighbor_batch(k, graph, seeds_b, mask_b,
                                           self.nbr_configs, self.hop_caps)
                outer = nb.node_ids[0]
                valid = (outer < fill)[:, None]
                feats = None
                if feats_buf is not None:
                    feats = feats_buf[jnp.minimum(outer, fill - 1)]
                    feats = jnp.where(valid, feats, 0.0)
                emb = None
                if emb_buf is not None:
                    emb = emb_buf[jnp.minimum(outer, fill - 1)]
                    emb = jnp.where(valid, emb, 0.0)
                logits = encoder_forward(
                    model.encoder, params["encoder"], emb, feats, nb,
                    degrees=graph.degrees, train=False)
                stats = categorical_accuracy_statistics(
                    logits, labels_b, mask_b & nb.seed_mask)
                return {k2: acc[k2] + v for k2, v in stats.items()}, None

            zero = {"correct": jnp.zeros((), jnp.float32),
                    "count": jnp.zeros((), jnp.float32)}
            b = self.batch_size
            acc, _ = jax.lax.scan(
                body, zero,
                (seeds.reshape(nb_batches, b), masks.reshape(nb_batches, b),
                 labels.reshape(nb_batches, b)))
            return acc

        totals = {"correct": 0.0, "count": 0.0}
        for st in states:
            self._swap_state(st)
            graph = self._state_graph(max_edges)
            seeds_g = np.concatenate([eval_by_part[p] for p in st]) \
                if len(st) else np.zeros(0, np.int32)
            slot = self._ref.part_to_slot[seeds_g // psize]
            seeds_l = (slot * psize + seeds_g % psize).astype(np.int32)
            labels = self.labels_host[seeds_g]
            seeds_pad = np.full(pad_rows, fill, np.int32)
            seeds_pad[:len(seeds_l)] = seeds_l
            labels_pad = np.zeros(pad_rows, np.int32)
            labels_pad[:len(labels)] = labels
            masks = np.arange(pad_rows) < len(seeds_l)
            acc = jax.device_get(eval_fn(
                self.params,
                self.cache.device if self.cache is not None else None,
                self.emb_buffer.device_values
                if self.emb_buffer is not None else None,
                graph, _arg(seeds_pad), _arg(masks),
                _arg(labels_pad)))
            totals = {k: totals[k] + float(v) for k, v in acc.items()}

        reporter = NodeClassificationReporter()
        reporter.add_statistics(totals)
        res = reporter.results()
        reporter.report()
        return res

    # ------------------------------------------------------------------
    @property
    def state(self) -> TrainState:
        return TrainState(table=None, params=self.params,
                          opt_state=self.opt_state,
                          key=jax.random.key(self.seed),
                          epoch=jnp.asarray(self.epoch, jnp.int32))

    @state.setter
    def state(self, s: TrainState) -> None:
        self.params = s.params
        self.opt_state = s.opt_state
        if self.mesh is not None and jax.process_count() > 1:
            # restored leaves may be host/local: re-place them globally
            from marius_tpu.parallel.mesh import replicate_tree
            self.params = replicate_tree(self.params, self.mesh)
            self.opt_state = replicate_tree(self.opt_state, self.mesh)
        self.epoch = int(s.epoch)

    graph = None
    features = None
