"""Trainers: compiled whole-epoch training loops.

The reference hides host latency behind a 5-stage thread pipeline with bounded
staleness (pipeline/pipeline_gpu.cpp:222-246) around a per-batch hot loop
(trainer.cpp:94-161). The TPU-native design removes the host from the loop
entirely: one jitted function runs the WHOLE epoch as `lax.scan` over
fixed-shape batches — shuffling, negative sampling, unique-id dedup, forward,
backward, dense Adam and row-sparse Adagrad updates all stay in HBM. The state
is donated, so embeddings are updated in place across epochs.

SynchronousTrainer semantics (no staleness) with pipeline-beating throughput:
batch boundaries cost nothing because XLA schedules across them.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.samplers.negative import (
    NegativeSamplingConfig,
    local_filter_masks,
    local_filters_active,
    sample_negatives,
)
from marius_tpu.nn.decoders.edge import normalize_decoder_method
from marius_tpu.nn.model import (
    LINK_PREDICTION,
    Model,
    lp_batch_loss,
    lp_batch_loss_direct,
    lp_batch_loss_rel,
)
from marius_tpu.nn.optimizers import OptState, apply_optimizer, init_optimizer
from marius_tpu.nn.encoder import encoder_forward
from marius_tpu.ops.edge_keys import EdgeKeySet, filter_mask_sampled
from marius_tpu.ops.unique import unique_padded
from marius_tpu.parallel.embedding_table import (
    EmbeddingTable,
    gather_rows,
    init_embedding_table,
    sparse_adagrad_update,
    sparse_adagrad_update_dense_accum,
)

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    table: Optional[EmbeddingTable]
    params: Any
    opt_state: OptState
    key: Array
    epoch: Array  # int32 scalar


def init_train_state(key: jax.Array, model: Model, params: Any,
                     num_nodes: int, dtype=jnp.float32) -> TrainState:
    k_table, k_state = jax.random.split(key)
    table = None
    if model.has_embeddings:
        table = init_embedding_table(k_table, num_nodes, model.encoder.embedding_dim, dtype=dtype)
    return TrainState(
        table=table,
        params=params,
        opt_state=init_optimizer(model.dense_optimizer, params),
        key=k_state,
        epoch=jnp.zeros((), jnp.int32),
    )


def pad_edges(edges: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int, int]:
    """Pad an (E, k) edge array to num_batches*batch_size rows."""
    e = np.asarray(edges, np.int32)
    num = e.shape[0]
    nb = -(-num // batch_size)
    padded = np.zeros((nb * batch_size, e.shape[1]), np.int32)
    padded[:num] = e
    return padded, num, nb


class LinkPredictionTrainer:
    """Shallow-encoder (embedding table) link-prediction training.

    One compiled epoch function: shuffle -> scan(batches) with donated state.
    """

    def __init__(
        self,
        model: Model,
        num_nodes: int,
        num_relations: int,
        train_edges: np.ndarray,
        neg_config: NegativeSamplingConfig,
        batch_size: int = 1000,
        seed: int = 0,
        train_filter_keys: Optional[Tuple[EdgeKeySet, EdgeKeySet]] = None,
        dtype=jnp.float32,
        graph=None,                 # DeviceGraph — required when the encoder has GNN stages
        nbr_configs=(),             # train-time NeighborSamplingConfigs
        features: Optional[np.ndarray] = None,   # (N, F) for FEATURE layers
        hop_caps=None,
        mesh=None,                  # jax.sharding.Mesh — shard table rows over
                                    # NODE_AXIS, batches over DATA_AXIS
        sharding_mode: str = "auto",    # "gspmd": XLA infers collectives from
                                        # sharding constraints; "explicit":
                                        # shard_map step with hand-written
                                        # psum gathers / owner-local updates
                                        # (shallow AND GNN encoders with an
                                        # embedding table); "auto": explicit
                                        # when supported — GSPMD's inferred
                                        # resharding costs ~20 collectives/
                                        # batch vs explicit's 2, and loses
                                        # 3.25x on the GNN path too
                                        # (ROUND3_NOTES.md)
        edges_backend: str = "DEVICE_MEMORY",  # DEVICE_MEMORY | HOST_MEMORY |
                                               # FLAT_FILE (storage.h:149)
        epochs_per_shuffle: int = 1,   # re-permute edges every N epochs
                                       # (training.epochs_per_shuffle)
    ):
        assert model.learning_task == LINK_PREDICTION
        assert batch_size % neg_config.num_chunks == 0, \
            "batch_size must be divisible by num_chunks (static chunking)"
        self.model = model
        self.num_nodes = num_nodes
        self.num_relations = num_relations
        self.neg_config = neg_config
        self.batch_size = batch_size
        self.train_filter_keys = train_filter_keys
        self.seed = seed
        self.epochs_per_shuffle = max(1, int(epochs_per_shuffle))

        # Edge storage tier (StorageBackend, options.h:68 / storage.h:149).
        # DEVICE_MEMORY: the whole (padded) edge list is HBM-resident and the
        # epoch is one compiled scan. HOST_MEMORY / FLAT_FILE: edges stay in
        # host RAM (or a np.memmap over the binary edge file) and stream
        # through HBM in fixed-size chunks; async dispatch overlaps each
        # chunk's host->device transfer with the previous chunk's compute.
        self.edges_backend = edges_backend.upper()
        assert self.edges_backend in ("DEVICE_MEMORY", "HOST_MEMORY", "FLAT_FILE"), \
            f"unknown edges backend {edges_backend}"
        self.has_rels = train_edges.shape[1] == 3
        # EdgeDecoderMethod dispatch (model.cpp:252-288); validated upstream,
        # asserted here for the direct-API path
        self.decoder_method = (normalize_decoder_method(model.decoder.decoder_method)
                               if model.decoder is not None else "CORRUPT_NODE")
        assert self.decoder_method in ("CORRUPT_NODE", "CORRUPT_REL"), \
            f"training supports CORRUPT_NODE/CORRUPT_REL, got {self.decoder_method}"
        if self.decoder_method == "CORRUPT_REL":
            assert self.has_rels, "CORRUPT_REL needs a 3-column (typed) edge list"
        if self.edges_backend == "DEVICE_MEMORY":
            padded, self.num_edges, self.num_batches = pad_edges(train_edges, batch_size)
            if mesh is not None:
                # replicated ACROSS the mesh (and across processes when the
                # mesh spans hosts — put_global slices per-process shards)
                from marius_tpu.parallel.mesh import put_global, replicated
                self.edges = put_global(padded, replicated(mesh))
            else:
                self.edges = jnp.asarray(padded)
            self.edges_host = None
        else:
            self.edges_host = train_edges  # np.ndarray or np.memmap — no copy
            self.num_edges = train_edges.shape[0]
            self.num_batches = -(-self.num_edges // batch_size)
            self.edges = None
            # ~2M edges per streamed chunk: big enough to amortize dispatch,
            # small enough that two in-flight chunks are noise next to the table
            self.chunk_batches = min(self.num_batches,
                                     max(1, (1 << 21) // batch_size))
        self._host_epoch = 0

        self.mesh = mesh
        self.sharding_mode = sharding_mode.lower()
        assert self.sharding_mode in ("auto", "gspmd", "explicit")
        if self.sharding_mode == "auto":
            # explicit shard_map (hand-placed psums) wherever it applies;
            # GSPMD only for shapes/encoders the explicit step doesn't cover
            ok = (mesh is not None and model.has_embeddings
                  and self.decoder_method == "CORRUPT_NODE")
            if ok:
                from marius_tpu.parallel.mesh import DATA_AXIS
                n_data = max(mesh.shape[DATA_AXIS], 1)
                ok = (batch_size % n_data == 0
                      and neg_config.num_chunks % n_data == 0)
            self.sharding_mode = "explicit" if ok else "gspmd"
        self.num_table_rows = num_nodes
        if mesh is not None and self.sharding_mode == "explicit":
            from marius_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS
            assert model.has_embeddings, \
                "explicit sharding shards the embedding table; " \
                "feature-only encoders ride GSPMD"
            assert self.decoder_method == "CORRUPT_NODE", \
                "explicit sharding implements CORRUPT_NODE; CORRUPT_REL " \
                "rides GSPMD (mesh.mode: gspmd or auto)"
            assert not nbr_configs or graph is not None
            n_node = mesh.shape[NODE_AXIS]
            n_data = mesh.shape[DATA_AXIS]
            assert batch_size % max(n_data, 1) == 0, \
                f"batch_size {batch_size} % data axis {n_data} != 0"
            assert neg_config.num_chunks % max(n_data, 1) == 0, \
                f"num_chunks {neg_config.num_chunks} % data axis {n_data} != 0"
            # round the table up so rows split evenly over the node axis;
            # padding rows only ever see masked (zero) grads
            self.num_table_rows = -(-num_nodes // n_node) * n_node

        key = jax.random.key(seed)
        from marius_tpu.nn.model import init_model_params
        params = init_model_params(jax.random.fold_in(key, 1), model, dtype)
        self.state = init_train_state(jax.random.fold_in(key, 2), model, params,
                                      self.num_table_rows, dtype)

        # unique-id capacity for a batch: 2B endpoints + both negative blocks
        # (CORRUPT_REL corrupts relations, so only the endpoints enter)
        c, n = neg_config.num_chunks, neg_config.negatives_per_positive
        self.unique_cap = (2 * batch_size if self.decoder_method == "CORRUPT_REL"
                           else 2 * batch_size + 2 * c * n)

        # Small tables skip sort-based dedup: per-occurrence grads scatter-add
        # into a table-shaped accumulator and Adagrad runs as a full-table
        # elementwise pass (see sparse_adagrad_update_dense_accum). Profiled
        # ~2x faster on FB15K-scale; large tables keep the unique path whose
        # cost is independent of num_nodes.
        self.dense_accum = (model.has_embeddings and not nbr_configs and
                            num_nodes * model.encoder.embedding_dim <= 8_000_000)

        self.graph = graph
        if mesh is not None and graph is not None and jax.process_count() > 1:
            # multi-controller: every array the compiled epoch closes over
            # must be ONE global jax.Array — replicate the graph CSR across
            # the process-spanning mesh (the NC trainer does the same)
            from marius_tpu.parallel.mesh import put_global, replicated
            repl = replicated(mesh)
            self.graph = jax.tree.map(
                lambda a: put_global(np.asarray(a), repl), graph)
        self.nbr_configs = tuple(nbr_configs)
        if self.nbr_configs:
            assert graph is not None, "GNN encoder needs a DeviceGraph"
            from marius_tpu.data.samplers.neighbor import estimate_hop_caps
            self.hop_caps = tuple(hop_caps or estimate_hop_caps(
                self.unique_cap, self.nbr_configs, num_nodes))
        else:
            self.hop_caps = ()
        self.features = None
        if features is not None:
            f = np.zeros((num_nodes + 1, features.shape[1]), np.float32)
            f[:num_nodes] = features
            if mesh is not None:
                from marius_tpu.parallel.mesh import put_global, replicated
                self.features = put_global(f, replicated(mesh))
            else:
                self.features = jnp.asarray(f)

        self._explicit_update = None
        self._explicit_gnn = False
        if mesh is not None:
            from marius_tpu.parallel.mesh import shard_train_state
            self.state = shard_train_state(self.state, mesh)
            if self.sharding_mode == "explicit":
                from marius_tpu.parallel.collectives import (
                    make_sharded_gnn_lp_update,
                    make_sharded_lp_update,
                )
                from marius_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS
                inv_rel_on = model.decoder.use_inverse_relations and self.has_rels
                use_filters = (train_filter_keys is not None
                               or local_filters_active(self.neg_config))
                if self.nbr_configs or self.features is not None:
                    # deep-encoder explicit path: per-data-shard sampling +
                    # one psum'd outer-hop gather (collectives.py)
                    n_data = max(mesh.shape[DATA_AXIS], 1)
                    c_loc = neg_config.num_chunks // max(n_data, 1)
                    b_loc = batch_size // max(n_data, 1)
                    cap_local = 2 * b_loc + 2 * c_loc * neg_config.negatives_per_positive
                    from marius_tpu.data.samplers.neighbor import (
                        estimate_hop_caps,
                    )
                    if self.nbr_configs:
                        est = estimate_hop_caps(
                            cap_local, self.nbr_configs, num_nodes)
                        if hop_caps:
                            # honor configured hop caps as per-hop UPPER
                            # bounds (model.encoder.hop_caps — memory knob);
                            # the seed slot stays cap_local so the batch's
                            # unique ids are never truncated
                            est = [est[0]] + [min(int(u), int(e)) for u, e
                                              in zip(hop_caps[1:], est[1:])]
                        caps_local = tuple(est)
                    else:
                        caps_local = (cap_local,)
                    self._explicit_caps = caps_local
                    self._explicit_update = make_sharded_gnn_lp_update(
                        model, mesh, self.num_table_rows,
                        self.nbr_configs, caps_local, cap_local, num_nodes,
                        node_axis=NODE_AXIS, data_axis=DATA_AXIS,
                        has_rels=self.has_rels, use_inverse=inv_rel_on,
                        use_filters=use_filters,
                        has_features=self.features is not None)
                    self._explicit_gnn = True
                else:
                    self._explicit_update = make_sharded_lp_update(
                        model, mesh, self.num_table_rows,
                        node_axis=NODE_AXIS, data_axis=DATA_AXIS,
                        has_rels=self.has_rels, use_inverse=inv_rel_on,
                        use_filters=use_filters)
                    self._explicit_gnn = False

        if self.edges_backend == "DEVICE_MEMORY":
            self._epoch_fn = jax.jit(self._build_epoch_fn(), donate_argnums=(0,))
        else:
            self._chunk_fn = jax.jit(self._build_chunk_fn(), donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _data_args(self):
        """Large read-only arrays (graph CSR, features, filter key sets) as
        one jit-argument pytree. Closing over them has TWO costs: they embed
        as compiled-module constants (remote compilers serialize those; a
        products-scale feature table 413s the compile request), and — far
        worse — captured device arrays (jaxpr consts) BREAK DONATION of the
        big table buffers on this runtime: a donating jit with any captured
        array falls back to copying every donated buffer per call (measured
        ~1000x on a 2x4.3 GB buffer pair; see tests/test_no_jit_captures.py).
        """
        fk = self.train_filter_keys
        return {"graph": self.graph, "feats": self.features,
                "dst_keys": fk[0] if fk is not None else None,
                "src_keys": fk[1] if fk is not None else None}

    def _batch_step(self, state: TrainState, edges_b: Array, mask_b: Array,
                    data=None):
        graph = data["graph"] if data is not None else self.graph
        features = data["feats"] if data is not None else self.features
        model = self.model
        cfg = self.neg_config
        num_nodes = self.num_nodes
        c, nneg = cfg.num_chunks, cfg.negatives_per_positive

        if self.mesh is not None and self.sharding_mode == "gspmd":
            # Data-parallel sharding: split the batch's positive edges over the
            # DATA axis; GSPMD propagates through scoring and inserts psum for
            # dense grads (the reference's NCCL all_reduce, model.cpp:136-159).
            from jax.sharding import NamedSharding, PartitionSpec as P
            from marius_tpu.parallel.mesh import DATA_AXIS
            edges_b = jax.lax.with_sharding_constraint(
                edges_b, NamedSharding(self.mesh, P(DATA_AXIS, None)))
            mask_b = jax.lax.with_sharding_constraint(
                mask_b, NamedSharding(self.mesh, P(DATA_AXIS)))

        key, k_dst, k_src = jax.random.split(state.key, 3)

        if self.decoder_method == "CORRUPT_REL":
            return self._batch_step_rel(state, edges_b, mask_b, graph,
                                        features, key, k_dst)

        # Untyped graphs train only the dst-corruption direction, matching the
        # reference (decoder_methods.cpp:99-102 skips lhs without relations)
        # and this framework's evaluator.
        inv_rel_on = model.decoder.use_inverse_relations and self.has_rels

        dst_ns = sample_negatives(k_dst, cfg, edges_b, num_nodes, inverse=False)
        dst_negs = dst_ns.ids
        src_ns = (sample_negatives(k_src, cfg, edges_b, num_nodes, inverse=True)
                  if inv_rel_on else None)
        src_negs = (src_ns.ids if inv_rel_on
                    else jnp.zeros((0,), jnp.int32).reshape(0, 0))

        src = jnp.where(mask_b, edges_b[:, 0], num_nodes)
        dst = jnp.where(mask_b, edges_b[:, -1], num_nodes)
        rel = edges_b[:, 1] if self.has_rels else None

        dst_filter = src_filter = None
        if self.train_filter_keys is not None:
            # keys ride the data pytree, never the closure (donation break)
            dst_keys = data["dst_keys"] if data is not None else self.train_filter_keys[0]
            src_keys = data["src_keys"] if data is not None else self.train_filter_keys[1]
            dst_filter = filter_mask_sampled(dst_keys, src, rel, dst_negs)
            if inv_rel_on:
                src_filter = filter_mask_sampled(src_keys, dst, rel, src_negs)
        else:
            # local (in-batch) false-negative filters, getNegatives parity
            # (negative.cpp:328-366): DEG masks deg-sampled self-collisions,
            # ALL masks any negative forming a true edge of THIS batch
            dst_filter, src_filter = local_filter_masks(
                cfg, edges_b, mask_b, dst_ns, src_ns)

        if self._explicit_update is not None:
            # first-class multi-chip path: shard_map over (data x node) with
            # explicit psum gathers, owner-local sparse Adagrad, data-axis
            # psum of dense grads (parallel/collectives.py)
            batch = {"src": src, "dst": dst, "mask": mask_b,
                     "dst_negs": dst_negs}
            if self.has_rels:
                batch["rel"] = rel
            if inv_rel_on:
                batch["src_negs"] = src_negs
            if dst_filter is not None:
                batch["dst_filter"] = dst_filter
                if inv_rel_on:
                    batch["src_filter"] = src_filter
            # consume the SAME key splits as the single-device path (k_nb for
            # GNN sampling when present, then k_drop) so the key stream — and
            # therefore the sampled negatives of every later batch — matches
            # exactly; required for the loss-trajectory equivalence guarantee
            # tested in test_sharding.py
            if self.nbr_configs:
                k_nb, key = jax.random.split(key)
            else:
                k_nb = key  # unused
            k_drop, key = jax.random.split(key)
            if self._explicit_gnn:
                batch["k_nb"] = jax.random.key_data(k_nb)
                batch["k_drop"] = jax.random.key_data(k_drop)
                values, acc, new_params, new_opt, loss = self._explicit_update(
                    state.table.values, state.table.state, state.params,
                    state.opt_state, batch, graph, features,
                    graph.degrees if graph is not None else None)
            else:
                values, acc, new_params, new_opt, loss = self._explicit_update(
                    state.table.values, state.table.state, state.params,
                    state.opt_state, batch)
            from marius_tpu.parallel.embedding_table import EmbeddingTable
            return TrainState(table=EmbeddingTable(values=values, state=acc),
                              params=new_params, opt_state=new_opt, key=key,
                              epoch=state.epoch), loss

        all_ids = jnp.concatenate([src, dst, dst_negs.reshape(-1), src_negs.reshape(-1)])
        b = self.batch_size
        if self.dense_accum:
            # no dedup: rows gathered per occurrence; positions are identity
            gather_ids = all_ids
            pos = jnp.arange(all_ids.shape[0], dtype=jnp.int32)
        else:
            uniq = unique_padded(all_ids, size=self.unique_cap, fill_value=num_nodes)
            gather_ids = uniq.ids
            pos = uniq.inverse
        inv_src = pos[:b]
        inv_dst = pos[b:2 * b]
        inv_dst_negs = pos[2 * b:2 * b + c * nneg].reshape(c, nneg)
        inv_src_negs = (pos[2 * b + c * nneg:].reshape(c, nneg)
                        if inv_rel_on else None)

        # With a GNN encoder, the batch's unique nodes become sampling seeds;
        # raw embeddings are gathered for the outermost hop set instead
        # (the reference does the same: batch unique ids -> DENSE multi-hop,
        # dataloader.cpp:417-441 + edgeSample).
        nbr_batch = None
        feats = None
        update_ids = gather_ids
        if self.nbr_configs:
            k_nb, key = jax.random.split(key)
            from marius_tpu.data.samplers.neighbor import sample_neighbor_batch
            nbr_batch = sample_neighbor_batch(
                k_nb, graph, gather_ids, gather_ids < num_nodes,
                self.nbr_configs, self.hop_caps)
            outer = nbr_batch.node_ids[0]
            update_ids = outer
            if features is not None:
                feats = features[jnp.minimum(outer, num_nodes)]
            x0 = gather_rows(state.table.values, outer) if model.has_embeddings else None
        else:
            x0 = gather_rows(state.table.values, gather_ids) \
                if model.has_embeddings else None
            if features is not None:
                # shallow FEATURE stages (the reference's distmult_feat
                # family): gather rows for the batch's ids directly
                feats = features[jnp.minimum(gather_ids, num_nodes)]

        degrees = graph.degrees if graph is not None else None

        use_direct = self.dense_accum and not self.nbr_configs
        k_drop, key = jax.random.split(key)

        def loss_fn(x, dense_params):
            encoded = encoder_forward(model.encoder, dense_params["encoder"], x,
                                      feats, nbr_batch, degrees=degrees,
                                      train=True, dropout_key=k_drop)
            if use_direct:
                # batch layout is [src; dst; dst_negs; src_negs]: slice instead
                # of gather so backward is a fused pad, not a row scatter
                d = encoded.shape[-1]
                loss, _ = lp_batch_loss_direct(
                    model, dense_params,
                    encoded[:b], encoded[b:2 * b], rel,
                    encoded[2 * b:2 * b + c * nneg].reshape(c, nneg, d),
                    encoded[2 * b + c * nneg:].reshape(c, nneg, d)
                    if inv_rel_on else None,
                    mask_b, dst_filter, src_filter)
            else:
                loss, _ = lp_batch_loss(
                    model, dense_params, encoded, inv_src, inv_dst, rel,
                    inv_dst_negs, inv_src_negs,
                    mask_b, dst_filter, src_filter)
            return loss

        if x0 is not None:
            loss, (gx, gdense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x0, state.params)
            if self.dense_accum:
                new_table = sparse_adagrad_update_dense_accum(
                    state.table, update_ids, gx, model.sparse_lr)
            else:
                new_table = sparse_adagrad_update(state.table, update_ids, gx,
                                                  model.sparse_lr)
        else:
            loss, gdense = jax.value_and_grad(loss_fn, argnums=1)(None, state.params)
            new_table = state.table

        new_params, new_opt_state = apply_optimizer(
            model.dense_optimizer, state.params, state.opt_state, gdense)

        return TrainState(table=new_table, params=new_params,
                          opt_state=new_opt_state, key=key, epoch=state.epoch), loss

    def _batch_step_rel(self, state: TrainState, edges_b: Array, mask_b: Array,
                        graph, features, key: Array, k_rel: Array):
        """CORRUPT_REL batch step (EdgeDecoderMethod::CORRUPT_REL,
        model.cpp:271-273 — declared but throwing in the reference; trained
        here): per-chunk uniform relation corruption, no node negatives."""
        model = self.model
        cfg = self.neg_config
        num_nodes = self.num_nodes
        c, nneg = cfg.num_chunks, cfg.negatives_per_positive
        b = self.batch_size

        neg_rel_ids = jax.random.randint(
            k_rel, (c, nneg), 0, max(self.num_relations, 1), dtype=jnp.int32)

        src = jnp.where(mask_b, edges_b[:, 0], num_nodes)
        dst = jnp.where(mask_b, edges_b[:, -1], num_nodes)
        rel = edges_b[:, 1]

        all_ids = jnp.concatenate([src, dst])
        if self.dense_accum:
            gather_ids = all_ids
            pos = jnp.arange(all_ids.shape[0], dtype=jnp.int32)
        else:
            uniq = unique_padded(all_ids, size=self.unique_cap, fill_value=num_nodes)
            gather_ids = uniq.ids
            pos = uniq.inverse
        inv_src, inv_dst = pos[:b], pos[b:]

        nbr_batch = None
        feats = None
        update_ids = gather_ids
        if self.nbr_configs:
            k_nb, key = jax.random.split(key)
            from marius_tpu.data.samplers.neighbor import sample_neighbor_batch
            nbr_batch = sample_neighbor_batch(
                k_nb, graph, gather_ids, gather_ids < num_nodes,
                self.nbr_configs, self.hop_caps)
            outer = nbr_batch.node_ids[0]
            update_ids = outer
            if features is not None:
                feats = features[jnp.minimum(outer, num_nodes)]
            x0 = gather_rows(state.table.values, outer) if model.has_embeddings else None
        else:
            x0 = (gather_rows(state.table.values, gather_ids)
                  if model.has_embeddings else None)
            if features is not None:
                feats = features[jnp.minimum(gather_ids, num_nodes)]

        degrees = graph.degrees if graph is not None else None
        use_direct = self.dense_accum and not self.nbr_configs
        k_drop, key = jax.random.split(key)

        def loss_fn(x, dense_params):
            encoded = encoder_forward(model.encoder, dense_params["encoder"], x,
                                      feats, nbr_batch, degrees=degrees,
                                      train=True, dropout_key=k_drop)
            if use_direct:
                src_e, dst_e = encoded[:b], encoded[b:]
            else:
                src_e, dst_e = encoded[inv_src], encoded[inv_dst]
            loss, _ = lp_batch_loss_rel(model, dense_params, src_e, dst_e,
                                        rel, neg_rel_ids, mask_b)
            return loss

        if x0 is not None:
            loss, (gx, gdense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x0, state.params)
            if self.dense_accum:
                new_table = sparse_adagrad_update_dense_accum(
                    state.table, update_ids, gx, model.sparse_lr)
            else:
                new_table = sparse_adagrad_update(state.table, update_ids, gx,
                                                  model.sparse_lr)
        else:
            loss, gdense = jax.value_and_grad(loss_fn, argnums=1)(None, state.params)
            new_table = state.table

        new_params, new_opt_state = apply_optimizer(
            model.dense_optimizer, state.params, state.opt_state, gdense)
        return TrainState(table=new_table, params=new_params,
                          opt_state=new_opt_state, key=key, epoch=state.epoch), loss

    def _build_epoch_fn(self):
        nb, b = self.num_batches, self.batch_size
        num_edges = self.num_edges

        def epoch_fn(state: TrainState, edges: Array, data=None):
            # the permutation key advances every epochs_per_shuffle epochs
            # (training.epochs_per_shuffle — shuffle cadence is free here,
            # but the trajectory should honor the configured cadence)
            k_perm = jax.random.fold_in(
                jax.random.key(12345), state.epoch // self.epochs_per_shuffle)
            perm = jax.random.permutation(k_perm, nb * b)
            shuffled = jnp.take(edges, perm, axis=0)
            masks = perm < num_edges

            def body(carry, xs):
                edges_b, mask_b = xs
                return self._batch_step(carry, edges_b, mask_b, data)

            state, losses = jax.lax.scan(
                body, state,
                (shuffled.reshape(nb, b, shuffled.shape[1]), masks.reshape(nb, b)))
            state = dataclasses.replace(state, epoch=state.epoch + 1)
            return state, jnp.sum(losses)

        return epoch_fn

    def _build_chunk_fn(self):
        """Compiled scan over ONE streamed chunk of host/disk-resident edges
        (already shuffled host-side). The FlatFile/HOST_MEMORY tier's device
        half: every chunk reuses this one compiled function."""
        cb, b = self.chunk_batches, self.batch_size

        def chunk_fn(state: TrainState, edges_chunk: Array, masks: Array,
                     data=None):
            def body(carry, xs):
                edges_b, mask_b = xs
                return self._batch_step(carry, edges_b, mask_b, data)

            state, losses = jax.lax.scan(
                body, state,
                (edges_chunk.reshape(cb, b, edges_chunk.shape[-1]),
                 masks.reshape(cb, b)))
            return state, jnp.sum(losses)

        return chunk_fn

    # ------------------------------------------------------------------
    def _train_epoch_host(self) -> float:
        """Stream an epoch of host/disk edges through the compiled chunk scan.

        Shuffle matches the reference's FlatFile semantics (storage.h:23
        MAX_SHUFFLE_SIZE chunked shuffle): RAM-resident edge arrays get a full
        permutation; memory-mapped files get a chunked shuffle (random chunk
        order + in-chunk permutation) to keep reads sequential.
        """
        shuffle_epoch = self._host_epoch // self.epochs_per_shuffle
        rng = np.random.default_rng((self.seed * 9176 + shuffle_epoch) & 0x7FFFFFFF)
        ce = self.chunk_batches * self.batch_size
        nchunks = -(-self.num_edges // ce)
        cols = self.edges_host.shape[1]

        is_mmap = isinstance(self.edges_host, np.memmap)
        if not is_mmap and self.num_edges <= 400_000_000:
            shuffled = np.asarray(self.edges_host, np.int32)[
                rng.permutation(self.num_edges)]

            def get_chunk(ci):
                return shuffled[ci * ce:(ci + 1) * ce]
        else:
            order = rng.permutation(nchunks)

            def get_chunk(k, _order=order):
                ci = int(_order[k])
                rows = np.asarray(self.edges_host[ci * ce:(ci + 1) * ce], np.int32)
                return rows[rng.permutation(len(rows))]

        from marius_tpu.parallel.mesh import put_arg

        losses = []
        for k in range(nchunks):
            rows = get_chunk(k)
            valid = len(rows)
            if valid < ce:
                padded = np.zeros((ce, cols), np.int32)
                padded[:valid] = rows
                rows = padded
            masks = np.arange(ce) < valid
            # device_put dispatches async: chunk k+1's host prep and H2D
            # overlap chunk k's compute. put_arg keeps the chunk numpy under
            # a multi-controller mesh (replicated at the jit boundary).
            self.state, loss = self._chunk_fn(
                self.state, put_arg(np.ascontiguousarray(rows)),
                put_arg(masks), self._data_args())
            losses.append(loss)
        self.state = dataclasses.replace(self.state, epoch=self.state.epoch + 1)
        self._host_epoch += 1
        return float(jnp.sum(jnp.stack(losses)))

    # ------------------------------------------------------------------
    def train_epoch(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        if self.edges_backend == "DEVICE_MEMORY":
            self.state, total_loss = self._epoch_fn(self.state, self.edges,
                                                    self._data_args())
            total_loss = float(total_loss)  # blocks until done
        else:
            total_loss = self._train_epoch_host()
        dt = time.perf_counter() - t0
        return {
            "loss": total_loss,
            "epoch_time_s": dt,
            "edges_per_sec": self.num_edges / dt,
            "num_edges": self.num_edges,
        }

    def train(self, num_epochs: int):
        return [self.train_epoch() for _ in range(num_epochs)]
