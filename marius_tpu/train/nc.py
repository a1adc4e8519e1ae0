"""Node-classification training: compiled epochs with on-device GNN sampling.

Parity with the reference NC path (marius.cpp NODE_CLASSIFICATION task,
dataloader.cpp nodeSample :473-496, model.cpp forward_nc :246-250 +
NodeClassificationReporter): batches of train nodes, multi-hop neighbor
sampling, GNN encoder, CE loss over class logits. TPU-native: the sampler
(data/samplers/neighbor.py) runs inside the jitted scan, features live in HBM,
and the optional learnable embedding block uses the same fused sparse Adagrad
as link prediction.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.data.graph import DeviceGraph
from marius_tpu.data.samplers.neighbor import (
    NeighborSamplingConfig,
    estimate_hop_caps,
    sample_neighbor_batch,
)
from marius_tpu.nn.encoder import encoder_forward
from marius_tpu.nn.model import Model, init_model_params, nc_batch_loss
from marius_tpu.nn.optimizers import apply_optimizer
from marius_tpu.parallel.embedding_table import gather_rows, sparse_adagrad_update
from marius_tpu.reporting.metrics import categorical_accuracy_statistics
from marius_tpu.reporting.reporters import NodeClassificationReporter
from marius_tpu.train.trainer import TrainState, init_train_state

Array = jax.Array


def _pad_ids(ids: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int, int]:
    ids = np.asarray(ids, np.int32)
    num = ids.shape[0]
    nb = -(-num // batch_size)
    padded = np.zeros(nb * batch_size, np.int32)
    padded[:num] = ids
    return padded, num, nb


class NodeClassificationTrainer:
    """GNN node classification with one compiled scan per epoch."""

    def __init__(
        self,
        model: Model,
        graph: DeviceGraph,
        features: Optional[np.ndarray],     # (N, F) float32 or None
        labels: np.ndarray,                 # (N,) int
        train_nodes: np.ndarray,
        nbr_configs: Sequence[NeighborSamplingConfig],
        batch_size: int = 1000,
        hop_caps: Optional[Sequence[int]] = None,
        seed: int = 0,
        dtype=jnp.float32,
        mesh=None,   # jax.sharding.Mesh — data-parallel seed-node sharding:
                     # each data shard samples/encodes its sub-batch
                     # independently, dense grads psum over the data axis
                     # (model.cpp:136-159 all_reduce analogue)
        full_graph=None,  # FullGraphAdjacency — exact-ALL mode: every batch
                          # computes all layers over ALL nodes and slices the
                          # seed rows (bit-equal to unbounded ALL sampling,
                          # data/full_graph.py); nbr_configs are ignored
        fg_seed_restrict: Optional[bool] = None,  # None = auto (on when the
                          # encoder's final stage supports it); False forces
                          # the all-N final stage (same math, used by tests)
        fg_linear_collapse: Optional[bool] = None,  # None = auto: LINEAR
                          # (activation-free) feature encoders train through
                          # the exact collapsed form (nn/linear_collapse.py)
                          # — per-batch full-graph gathers replaced by one
                          # (batch, K) row gather + small matmuls. Explicit
                          # fg_seed_restrict requests keep the general path.
        epochs_per_shuffle: int = 1,   # re-permute seeds every N epochs
    ):
        self.model = model
        self.graph = graph
        self.batch_size = batch_size
        self.epochs_per_shuffle = max(1, int(epochs_per_shuffle))
        self.nbr_configs = tuple(nbr_configs)
        self.mesh = mesh
        self.full_graph = full_graph
        self._fg_ops = None
        self._fg_collapse = None
        self._fg_sharded = False
        self._fg_struct = None   # multi-controller ring: structures passed
                                 # as jit ARGUMENTS (closures over sharded
                                 # global arrays are banned by JAX)
        self._fg_want_collapse = False
        if full_graph is not None:
            from marius_tpu.nn.full_graph_encoder import supports_full_graph
            from marius_tpu.nn.linear_collapse import (
                linear_collapse_eligible,
            )
            assert supports_full_graph(model.encoder), \
                "full-graph mode supports GraphSAGE/GCN/GAT/RGCN stages only"
            self._fg_want_collapse = (
                (fg_linear_collapse if fg_linear_collapse is not None
                 else fg_seed_restrict is None)
                and features is not None
                and linear_collapse_eligible(model.encoder, True))
            if mesh is not None and self._fg_want_collapse:
                # LINEAR encoders under a mesh train DATA-PARALLEL through
                # the collapsed form: phi replicated, the batch's seeds shard
                # over the data axis (GSPMD inserts the dense-grad psum) —
                # the fast path for models that fit phi in HBM; the
                # collective-permute ring remains the beyond-HBM path
                # (fg_linear_collapse=False forces it)
                pass
            elif mesh is not None:
                # node-sharded ring mode: activations row-shard over the
                # mesh's non-trivial axis, each layer's neighbor sum runs
                # as the collective-permute ring (full_graph_sharded.py)
                from marius_tpu.nn.full_graph_encoder import (
                    supports_sharded_full_graph,
                )
                axes = [(name, size) for name, size in mesh.shape.items()
                        if size > 1]
                assert len(axes) == 1, \
                    "sharded full-graph mode uses ONE mesh axis " \
                    f"(got shape {dict(mesh.shape)})"
                assert supports_sharded_full_graph(model.encoder), \
                    "sharded full-graph mode supports GraphSAGE/GCN/GAT/RGCN only"
                assert features is not None and not model.has_embeddings, \
                    "sharded full-graph mode needs feature inputs " \
                    "(sharded embedding tables: use the sampled path)"
                self._fg_sharded = True
                self._fg_axis = axes[0][0]
        local_batch = batch_size
        if mesh is not None and not self._fg_sharded:
            from marius_tpu.parallel.mesh import DATA_AXIS
            self._n_data = mesh.shape[DATA_AXIS]
            assert batch_size % self._n_data == 0, \
                f"batch_size {batch_size} % data axis {self._n_data} != 0"
            local_batch = batch_size // self._n_data
        self.hop_caps = tuple(hop_caps or estimate_hop_caps(
            local_batch, nbr_configs, graph.num_nodes))

        num_nodes = graph.num_nodes
        # sentinel row at index N so clamped padded gathers read zeros;
        # stored in the compute dtype — with bfloat16 the neighbor gathers
        # (the HBM-bandwidth bottleneck) move half the bytes
        if features is not None:
            f = np.zeros((num_nodes + 1, features.shape[1]), np.float32)
            f[:num_nodes] = features
            self.features = jnp.asarray(f, dtype)
        else:
            self.features = None
        lab = np.zeros(num_nodes + 1, np.int32)
        lab[:num_nodes] = np.asarray(labels, np.int32)
        self.labels = jnp.asarray(lab)

        self._fg_seed_restrict = False
        if self._fg_sharded:
            from marius_tpu.data.full_graph import host_csr_from_adjacency
            from marius_tpu.data.full_graph_sharded import (
                build_sharded_from_csr,
                place_on_mesh,
                shard_rows,
            )
            from marius_tpu.nn.full_graph_encoder import (
                prepare_sharded_full_graph,
            )
            s = mesh.shape[self._fg_axis]
            offsets, csr_nbrs = host_csr_from_adjacency(full_graph)
            self._fg_sg = place_on_mesh(build_sharded_from_csr(
                offsets, csr_nbrs, num_nodes, s), mesh, self._fg_axis)
            n_pad = self._fg_sg.padded_nodes
            self._fg_x = shard_rows(
                np.asarray(np.asarray(features, np.float32), dtype),
                self._fg_sg, mesh, self._fg_axis)

            def pad_deg(d):
                out = np.zeros((n_pad, 1), np.float32)
                out[:num_nodes, 0] = np.asarray(d, np.float32)
                return shard_rows(out, self._fg_sg, mesh,
                                  self._fg_axis)[:, 0].astype(jnp.int32)

            in_deg = pad_deg(np.asarray(full_graph.in_deg))
            out_deg = pad_deg(np.asarray(full_graph.out_deg))
            rel_sharded = None
            from marius_tpu.nn.full_graph_encoder import encoder_has_rgcn
            if encoder_has_rgcn(model.encoder):
                from marius_tpu.data.full_graph_rel import (
                    build_sharded_rel_graph,
                    edges_from_rel_graph,
                )
                assert full_graph.rel is not None, \
                    ("sharded RGCN needs the relational companion: build "
                     "the adjacency with with_relations=True")
                rel_sharded = place_on_mesh(build_sharded_rel_graph(
                    edges_from_rel_graph(full_graph.rel), num_nodes, s),
                    mesh, self._fg_axis)
            self._fg_view, self._fg_ops = prepare_sharded_full_graph(
                self._fg_sg, model.encoder, in_deg, out_deg, mesh,
                self._fg_axis, features=self._fg_x, rel_sharded=rel_sharded)
            if jax.process_count() > 1:
                # compute happens inside jit; every array the ring touches
                # rides this pytree as an argument (the eager const entries
                # included, so the big aggregation never re-runs)
                self._fg_struct = {
                    "sg": self._fg_sg, "rel": rel_sharded, "x": self._fg_x,
                    "ind": in_deg, "outd": out_deg,
                    "const": self._fg_ops["const_agg"],
                }
            assert fg_seed_restrict is not True, \
                "seed_restrict is a single-device optimization"
        elif full_graph is not None:
            from marius_tpu.nn.full_graph_encoder import (
                prepare_full_graph,
                supports_seed_restrict,
            )
            from marius_tpu.nn.linear_collapse import build_linear_collapse
            if self._fg_want_collapse:
                # exact factored form for LINEAR encoders: per-batch
                # full-graph gathers vanish (nn/linear_collapse.py). phi
                # rides the jit as an ARGUMENT (_fg_struct) — as a closure
                # constant the remote compiler would serialize the full
                # (N, K) matrix into the module
                self._fg_collapse = build_linear_collapse(
                    full_graph, model.encoder, self.features[:-1], dtype)
                if mesh is not None and jax.process_count() > 1:
                    # multi-controller: phi must be ONE global (replicated)
                    # array like every other jit input
                    from marius_tpu.parallel.mesh import put_global, replicated
                    self._fg_collapse = dataclasses.replace(
                        self._fg_collapse,
                        phi=put_global(self._fg_collapse.phi,
                                       replicated(mesh)))
                self._fg_struct = self._fg_collapse
            else:
                self.full_graph, self._fg_ops = prepare_full_graph(
                    full_graph, model.encoder,
                    None if self.features is None else self.features[:-1])
            # Seed-restricted final stage: compute the last GNN stage for the
            # batch's seed rows only (flat CSR slots fed through the scan)
            # instead of all N nodes — removes the final stage's full-
            # adjacency gather AND its backward twin from every step.
            self._fg_seed_restrict = (
                False if self._fg_collapse is not None
                else (supports_seed_restrict(model.encoder)
                      if fg_seed_restrict is None
                      else bool(fg_seed_restrict)))
            if self._fg_seed_restrict:
                assert supports_seed_restrict(model.encoder), \
                    "encoder's final stage does not support seed_restrict"
                from marius_tpu.data.full_graph import (
                    device_csr,
                    host_csr_from_adjacency,
                )
                # host offsets: per-epoch slot-budget sizing only; the flat
                # lists themselves are built on device inside the scan
                self._fg_csr = host_csr_from_adjacency(self.full_graph)
                csr_for_dev = self._fg_csr
                if self._fg_ops.get("sorted"):
                    # sorted internal mode (prepare_full_graph): flat seed
                    # lists index the SORTED row space — relabel the device
                    # CSR's neighbor ids once (sentinel N stays N)
                    n_ = self.full_graph.num_nodes
                    inv_ext = np.empty(n_ + 1, np.int32)
                    inv_ext[:n_] = np.asarray(self.full_graph.inv_pos)
                    inv_ext[n_] = n_
                    csr_for_dev = (self._fg_csr[0], inv_ext[self._fg_csr[1]])
                self._fg_csr_dev = device_csr(csr_for_dev)
                self._fg_budget = None   # sized from the first epoch's need
                # RGCN final stage: also the DIRECTED out-CSR with per-slot
                # relation ids (full_graph_rel.host_out_csr)
                self._fg_rel_csr = self._fg_rel_csr_dev = None
                self._fg_rel_budget = None
                from marius_tpu.nn.full_graph_encoder import (
                    final_stage_has_rgcn,
                )
                if final_stage_has_rgcn(model.encoder):
                    from marius_tpu.data.full_graph_rel import (
                        device_rel_csr,
                        host_out_csr,
                    )
                    assert self.full_graph.rel is not None
                    self._fg_rel_csr = host_out_csr(self.full_graph.rel)
                    self._fg_rel_csr_dev = device_rel_csr(self._fg_rel_csr)

        padded, self.num_train, self.num_batches = _pad_ids(train_nodes, batch_size)
        self._train_nodes_np = padded
        self.train_nodes = jnp.asarray(padded)

        key = jax.random.key(seed)
        params = init_model_params(jax.random.fold_in(key, 1), model, dtype)
        self.state = init_train_state(jax.random.fold_in(key, 2), model, params,
                                      num_nodes, dtype)

        # Multi-controller (multi-host) data parallelism: when the mesh spans
        # processes, every array the compiled epoch touches must be ONE
        # global jax.Array — place state/graph/features/labels replicated
        # across the mesh (parallel/multihost.py; the ring full-graph mode's
        # sharded structures instead ride the jit as arguments, _fg_struct).
        if mesh is not None and jax.process_count() > 1:
            # ring full-graph structures were placed globally above
            # (place_on_mesh); everything else replicates across the mesh
            from marius_tpu.parallel.mesh import (
                put_global,
                replicate_tree,
                replicated,
            )
            repl = replicated(mesh)

            def _g(a):
                return put_global(np.asarray(a), repl)

            if self.features is not None:
                self.features = put_global(self.features, repl)
            self.labels = _g(self.labels)
            self.train_nodes = _g(self._train_nodes_np)
            if self.graph is not None:
                self.graph = jax.tree.map(_g, self.graph)
            # replicated everywhere — matches _sharded_batch_step's P() spec
            # (a row-sharded table would be all-gathered on the first step
            # and force a second epoch compile when its sharding changed)
            self.state = replicate_tree(self.state, mesh)

        # seed-restricted full-graph: built by _fg_ensure_budget on the first
        # train_epoch (the flat-list slot budget is static in the epoch fn)
        self._epoch_fn = (None if self._fg_seed_restrict else
                          jax.jit(self._build_epoch_fn(), donate_argnums=(0,)))

    # ------------------------------------------------------------------
    def _data_args(self):
        """The sampled path's large read-only arrays (graph CSR, features,
        labels) as ONE pytree passed as a jit ARGUMENT. Closing over them
        would embed them as constants in the compiled module — the remote
        compiler serializes closure constants (a 224 MB feature table
        exceeds its request limit outright), and even locally constants
        bloat every executable. Same lesson as the full-graph path's phi
        (ROUND3_NOTES #1)."""
        return {"graph": self.graph, "feats": self.features,
                "labels": self.labels}

    def _encode_batch(self, params, table_values, key, seeds, seed_mask,
                      train: bool, hop_caps=None, data=None):
        graph = data["graph"] if data is not None else self.graph
        features = data["feats"] if data is not None else self.features
        nb = sample_neighbor_batch(key, graph, seeds, seed_mask,
                                   self.nbr_configs, hop_caps or self.hop_caps)
        outer_ids = nb.node_ids[0]
        feats = None
        if features is not None:
            feats = features[jnp.minimum(outer_ids, graph.num_nodes)]
        emb = outer_uniq = None
        if table_values is not None:
            outer_uniq = outer_ids  # hop sets are already unique & padded with N
            emb = gather_rows(table_values, outer_uniq)
        return nb, feats, emb, outer_uniq

    def _batch_step(self, state: TrainState, seeds: Array, mask_b: Array,
                    fg=None, data=None):
        """Returns (state, (loss, overflow)); overflow counts frontier ids
        dropped by tight hop caps this batch (always 0 in full-graph mode)."""
        if self.full_graph is not None:
            s, loss = self._batch_step_full_graph(state, seeds, mask_b, fg=fg)
            return s, (loss, jnp.zeros((), jnp.int32))
        if self.mesh is None:
            return self._batch_step_local(state, seeds, mask_b, None, data)
        return self._sharded_batch_step(state, seeds, mask_b, data)

    def _fg_prepare(self, fg):
        """(feats, adj, ops) for one full-graph forward. ``fg`` (the
        multi-controller structure pytree, _fg_struct) rebuilds the ring ops
        at trace time from jit ARGUMENTS; None uses the eager closures."""
        if self._fg_sharded:
            if fg is not None:
                from marius_tpu.nn.full_graph_encoder import (
                    prepare_sharded_full_graph,
                )
                adj, ops = prepare_sharded_full_graph(
                    fg["sg"], self.model.encoder, fg["ind"], fg["outd"],
                    self.mesh, self._fg_axis, features=fg["x"],
                    rel_sharded=fg["rel"], const_agg=fg["const"])
                return fg["x"], adj, ops
            return self._fg_x, self._fg_view, self._fg_ops
        feats = None if self.features is None else self.features[:-1]
        return feats, self.full_graph, self._fg_ops

    def _batch_step_full_graph(self, state: TrainState, seeds: Array,
                               mask_b: Array, flat=None, fg=None):
        """Exact-ALL batch step: all layers over ALL nodes, slice the seed
        rows. Identical math to unbounded ALL sampling, none of the per-batch
        frontier machinery. With ``flat`` = (flat_nbr, flat_seg) the final
        stage runs seed-restricted (see full_graph_encoder_forward). ``fg``
        (multi-controller ring): the structure pytree passed as a jit
        argument; ops are rebuilt at trace time from it."""
        from marius_tpu.nn.full_graph_encoder import full_graph_encoder_forward

        model = self.model
        key, k_d = jax.random.split(state.key)
        n = self.graph.num_nodes
        seeds_c = jnp.minimum(seeds, n - 1)
        labels_b = self.labels[jnp.minimum(seeds, n)]
        if self._fg_collapse is not None:
            # exact collapsed LINEAR form: logits = phi[seeds] @ M(params);
            # fg is the LinearCollapse pytree passed as a jit argument
            col = fg if fg is not None else self._fg_collapse
            if self.mesh is not None:
                # data-parallel: batch rows shard over the data axis, phi and
                # params replicate; GSPMD propagates the sharding through the
                # row gather + matmul and psums the dense grads
                # (model.cpp:136-159 analogue)
                from jax.sharding import NamedSharding, PartitionSpec as P

                from marius_tpu.parallel.mesh import DATA_AXIS
                sh = NamedSharding(self.mesh, P(DATA_AXIS))
                seeds_c = jax.lax.with_sharding_constraint(seeds_c, sh)
                mask_b = jax.lax.with_sharding_constraint(mask_b, sh)
                labels_b = jax.lax.with_sharding_constraint(labels_b, sh)

            def loss_fn_c(dense_params):
                logits = col.logits(dense_params["encoder"], seeds_c)
                return nc_batch_loss(model, logits, labels_b, mask_b)

            loss, g_dense = jax.value_and_grad(loss_fn_c)(state.params)
            new_params, new_opt = apply_optimizer(
                model.dense_optimizer, state.params, state.opt_state, g_dense)
            return TrainState(table=state.table, params=new_params,
                              opt_state=new_opt, key=key,
                              epoch=state.epoch), loss
        feats, adj, ops = self._fg_prepare(fg)
        table_values = state.table.values if state.table is not None else None
        # flat = (flat_nbr, flat_seg[, rel_flat]); the encoder reads the
        # optional relational lists as seed_restrict[3]
        sr = None if flat is None else (seeds_c,) + tuple(flat)

        def loss_fn(emb, dense_params):
            out = full_graph_encoder_forward(
                model.encoder, dense_params["encoder"], emb, feats,
                adj, ops=ops, train=True, dropout_key=k_d,
                seed_restrict=sr)
            logits = out if sr is not None else out[seeds_c]
            return nc_batch_loss(model, logits, labels_b, mask_b)

        if table_values is not None:
            loss, (g_emb, g_dense) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(table_values, state.params)
            # g_emb is already table-shaped: apply the dense-accumulator
            # Adagrad rule directly (identical math to the unique-row rule)
            from marius_tpu.parallel.embedding_table import (
                ADAGRAD_EPS,
                EmbeddingTable,
            )
            acc = state.table.state + g_emb * g_emb
            values = state.table.values - model.sparse_lr * g_emb / (
                jnp.sqrt(acc) + ADAGRAD_EPS)
            new_table = EmbeddingTable(values=values, state=acc)
        else:
            loss, g_dense = jax.value_and_grad(loss_fn, argnums=1)(
                None, state.params)
            new_table = state.table
        new_params, new_opt = apply_optimizer(
            model.dense_optimizer, state.params, state.opt_state, g_dense)
        return TrainState(table=new_table, params=new_params,
                          opt_state=new_opt, key=key, epoch=state.epoch), loss

    def _batch_step_local(self, state: TrainState, seeds: Array, mask_b: Array,
                          data_axis: Optional[str], data=None):
        """One train batch. With ``data_axis`` set this runs as a shard_map
        body: seeds/mask are the shard's sub-batch, dense grads and the
        embedding-grad accumulator psum over the axis, and MEAN losses are
        re-weighted by local/total valid counts so the global trajectory
        matches single-device math."""
        model = self.model
        key, k_s = jax.random.split(state.key)
        if data_axis is not None:
            k_s = jax.random.fold_in(k_s, jax.lax.axis_index(data_axis))

        graph = data["graph"] if data is not None else self.graph
        labels_arr = data["labels"] if data is not None else self.labels
        table_values = state.table.values if state.table is not None else None
        nb, feats, emb0, outer_ids = self._encode_batch(
            state.params, table_values, k_s, seeds, mask_b, True, data=data)
        labels_b = labels_arr[jnp.minimum(seeds, graph.num_nodes)]
        loss_mask = mask_b & nb.seed_mask

        w = 1.0
        if data_axis is not None and model.loss_reduction.upper() == "MEAN":
            local = jnp.sum(loss_mask.astype(jnp.float32))
            total = jnp.maximum(jax.lax.psum(local, data_axis), 1.0)
            w = local / total

        def loss_fn(emb, dense_params):
            logits = encoder_forward(
                model.encoder, dense_params["encoder"], emb, feats, nb,
                degrees=graph.degrees, train=True,
                dropout_key=jax.random.fold_in(k_s, 99))
            return nc_batch_loss(model, logits, labels_b, loss_mask) * w

        if emb0 is not None:
            loss, (g_emb, g_dense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                emb0, state.params)
            if data_axis is not None:
                # combine shards' row grads exactly into the dense
                # accumulator G. Two equivalent routes, chosen statically by
                # traffic: all-gathering each shard's (K, d) row grads + ids
                # costs S*K*d over ICI vs N*d for psum-ing the scattered
                # table — for large tables the row-gather route wins by
                # orders of magnitude (N >> S*K)
                from marius_tpu.parallel.embedding_table import (
                    ADAGRAD_EPS,
                    EmbeddingTable,
                )
                n_data = int(self.mesh.shape[data_axis])
                if n_data * outer_ids.shape[0] < graph.num_nodes:
                    ids_all = jax.lax.all_gather(outer_ids, data_axis)
                    g_all = jax.lax.all_gather(g_emb, data_axis)
                    G = jnp.zeros_like(state.table.values).at[
                        ids_all.reshape(-1)].add(
                        g_all.reshape(-1, g_all.shape[-1]), mode="drop")
                else:
                    G = jnp.zeros_like(state.table.values).at[outer_ids].add(
                        g_emb, mode="drop")
                    G = jax.lax.psum(G, data_axis)
                acc = state.table.state + G * G
                values = state.table.values - model.sparse_lr * G / (
                    jnp.sqrt(acc) + ADAGRAD_EPS)
                new_table = EmbeddingTable(values=values, state=acc)
            else:
                new_table = sparse_adagrad_update(state.table, outer_ids, g_emb,
                                                  model.sparse_lr)
        else:
            loss, g_dense = jax.value_and_grad(loss_fn, argnums=1)(None, state.params)
            new_table = state.table

        overflow = (nb.overflow if nb.overflow is not None
                    else jnp.zeros((), jnp.int32))
        if data_axis is not None:
            g_dense = jax.lax.psum(g_dense, data_axis)
            loss = jax.lax.psum(loss, data_axis)
            overflow = jax.lax.psum(overflow, data_axis)
        new_params, new_opt = apply_optimizer(
            model.dense_optimizer, state.params, state.opt_state, g_dense)
        return TrainState(table=new_table, params=new_params, opt_state=new_opt,
                          key=key, epoch=state.epoch), (loss, overflow)

    def _sharded_batch_step(self, state: TrainState, seeds: Array,
                            mask_b: Array, data=None):
        from jax.sharding import PartitionSpec as P

        from marius_tpu.parallel.mesh import DATA_AXIS

        fn = jax.shard_map(
            lambda s, sd, m, d: self._batch_step_local(s, sd, m, DATA_AXIS, d),
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), (P(), P())), check_vma=False)
        return fn(state, seeds, mask_b, data)

    def _build_epoch_fn(self):
        nb, b = self.num_batches, self.batch_size
        num_train = self.num_train

        if self._fg_seed_restrict:
            # Entirely on-device: the shuffle AND each batch's flat seed-CSR
            # neighbor lists are computed inside the compiled epoch (the
            # lists from the device-resident CSR — data/full_graph.py
            # device_seed_flat_lists). The slot budget is the only host
            # input, baked in statically by train_epoch.
            from marius_tpu.data.full_graph import device_seed_flat_lists
            from marius_tpu.data.full_graph_rel import (
                device_seed_flat_lists_rel,
            )

            budget = self._fg_budget
            rel_budget = self._fg_rel_budget
            n = self.graph.num_nodes
            csr_dev = self._fg_csr_dev
            rel_csr_dev = self._fg_rel_csr_dev

            def epoch_fn_fg(state: TrainState, train_nodes: Array, fg=None,
                            data=None):
                k_perm = jax.random.fold_in(jax.random.key(54321),
                                            state.epoch // self.epochs_per_shuffle)
                perm = jax.random.permutation(k_perm, nb * b)
                shuffled = jnp.take(train_nodes, perm).reshape(nb, b)
                masks = (perm < num_train).reshape(nb, b)

                def body(carry, xs):
                    flat = device_seed_flat_lists(csr_dev, xs[0], xs[1],
                                                  budget, n)
                    if rel_csr_dev is not None:
                        flat = flat + (device_seed_flat_lists_rel(
                            rel_csr_dev, xs[0], xs[1], rel_budget, n),)
                    return self._batch_step_full_graph(
                        carry, xs[0], xs[1], flat)

                state, losses = jax.lax.scan(body, state, (shuffled, masks))
                return (dataclasses.replace(state, epoch=state.epoch + 1),
                        (jnp.sum(losses), jnp.zeros((), jnp.int32)))

            return epoch_fn_fg

        def epoch_fn(state: TrainState, train_nodes: Array, fg=None,
                     data=None):
            k_perm = jax.random.fold_in(jax.random.key(54321),
                                            state.epoch // self.epochs_per_shuffle)
            perm = jax.random.permutation(k_perm, nb * b)
            shuffled = jnp.take(train_nodes, perm)
            masks = perm < num_train

            def body(carry, xs):
                return self._batch_step(carry, xs[0], xs[1], fg, data)

            state, (losses, ovs) = jax.lax.scan(
                body, state, (shuffled.reshape(nb, b), masks.reshape(nb, b)))
            return (dataclasses.replace(state, epoch=state.epoch + 1),
                    (jnp.sum(losses), jnp.sum(ovs)))

        return epoch_fn

    # ------------------------------------------------------------------
    def _fg_perm_host(self, period: int) -> np.ndarray:
        """The epoch permutation, computed WITHOUT waiting on the TPU queue
        (threefry is platform-deterministic, so the CPU backend reproduces
        the in-scan permutation bit-exactly — validated once against the
        device on first use, falling back to the device path if ever not)."""
        nb, b = self.num_batches, self.batch_size

        def on_cpu():
            with jax.default_device(jax.devices("cpu")[0]):
                k = jax.random.fold_in(jax.random.key(54321), period)
                return np.asarray(jax.random.permutation(k, nb * b))

        if not hasattr(self, "_fg_cpu_rng_ok"):
            k = jax.random.fold_in(jax.random.key(54321), period)
            dev = np.asarray(jax.device_get(
                jax.random.permutation(k, nb * b)))
            try:
                self._fg_cpu_rng_ok = bool((on_cpu() == dev).all())
            except Exception:
                self._fg_cpu_rng_ok = False
            return dev
        if self._fg_cpu_rng_ok:
            return on_cpu()
        k = jax.random.fold_in(jax.random.key(54321), period)
        return np.asarray(jax.device_get(jax.random.permutation(k, nb * b)))

    def _fg_epoch_need(self, epoch: int):
        """(need, need_r): the max per-batch flat-slot counts of the given
        epoch's permutation. Cached per shuffle period; prefetched for the
        NEXT epoch while the device runs the current one (train_epoch), so
        the host sizing work never leaves the chip idle."""
        period = epoch // self.epochs_per_shuffle
        cache = getattr(self, "_fg_need_cache", None)
        if cache is not None and cache[0] == period:
            return cache[1]
        nb, b = self.num_batches, self.batch_size
        n = self.graph.num_nodes
        perm = self._fg_perm_host(period)
        shuffled = self._train_nodes_np[perm].reshape(nb, b)
        masks = (perm < self.num_train).reshape(nb, b)
        offsets, _ = self._fg_csr
        seeds = np.minimum(shuffled.astype(np.int64), n - 1)
        need = int(((offsets[seeds + 1] - offsets[seeds]) * masks)
                   .sum(axis=1).max())
        need_r = None
        if self._fg_rel_csr is not None:
            r_off = self._fg_rel_csr[0]
            need_r = int(((r_off[seeds + 1] - r_off[seeds]) * masks)
                         .sum(axis=1).max())
        self._fg_need_cache = (period, (need, need_r))
        return need, need_r

    def _fg_ensure_budget(self, epoch: int):
        """Size the flat-list slot budget for the upcoming epoch: draw the
        SAME permutation the compiled epoch will (key(54321) folded with the
        epoch counter — trajectory identical to fg_seed_restrict=False) and
        take the max batch degree-sum. Sticky with 25% slack so growth
        (= a retrace, budget is static in the epoch fn) is rare."""
        need, need_r = self._fg_epoch_need(epoch)
        retrace = False
        if self._fg_budget is None or need > self._fg_budget:
            self._fg_budget = max(128, -(-int(need * 1.25) // 128) * 128)
            retrace = True
        if need_r is not None:
            if self._fg_rel_budget is None or need_r > self._fg_rel_budget:
                self._fg_rel_budget = max(
                    128, -(-int(need_r * 1.25) // 128) * 128)
                retrace = True
        if retrace:
            self._epoch_fn = jax.jit(self._build_epoch_fn(),
                                     donate_argnums=(0,))

    def train_epoch(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        epoch = None
        if self._fg_seed_restrict:
            # epoch index from device state (correct across ckpt resume /
            # external state replacement); instant when the prior epoch
            # already synced
            epoch = int(jax.device_get(self.state.epoch))
            self._fg_ensure_budget(epoch)
        self.state, (total_loss, overflow) = self._epoch_fn(
            self.state, self.train_nodes, self._fg_struct,
            None if self.full_graph is not None else self._data_args())
        if epoch is not None:
            # size the NEXT epoch's budget while the chip runs this one
            self._fg_epoch_need(epoch + 1)
        # ONE host round-trip for both scalars (a second device_get costs a
        # full dispatch latency per epoch on remote-attached runtimes)
        total_loss, overflow = jax.device_get((total_loss, overflow))
        total_loss = float(total_loss)
        overflow = int(overflow)
        if overflow:
            import logging
            logging.getLogger("marius_tpu").warning(
                "hop caps truncated %d frontier ids this epoch (drops the "
                "highest-id NEW neighbors — id-correlated, not uniform, "
                "under sequential id remaps; raise hop_caps or the "
                "empirical margin for exact frontiers)", overflow)
        dt = time.perf_counter() - t0
        return {"loss": total_loss, "epoch_time_s": dt,
                "nodes_per_sec": self.num_train / dt,
                "num_nodes": self.num_train,
                "truncated_frontier_ids": overflow}

    def train(self, num_epochs: int):
        return [self.train_epoch() for _ in range(num_epochs)]


class NodeClassificationEvaluator:
    """Accuracy over a node split, compiled as one scan (evaluator.cpp NC path)."""

    def __init__(self, trainer: NodeClassificationTrainer, eval_nodes: np.ndarray,
                 batch_size: Optional[int] = None, seed: int = 11):
        self.trainer = trainer
        self.batch_size = batch_size or trainer.batch_size
        # hop caps must cover THIS batch size, not the trainer's — an
        # undersized cap makes unique_padded silently truncate hop sets
        self.hop_caps = tuple(estimate_hop_caps(
            self.batch_size, trainer.nbr_configs, trainer.graph.num_nodes))
        padded, self.num_eval, self.num_batches = _pad_ids(eval_nodes, self.batch_size)
        from marius_tpu.parallel.mesh import put_arg
        self.eval_nodes = put_arg(padded)
        self.seed = seed
        self._eval_fn = jax.jit(self._build_eval_fn())

    def _full_graph_logits(self, table_values, params, nodes, fg=None):
        """One full-graph pass; logits for the requested node ids. ``fg``:
        multi-controller ring structures passed as jit arguments."""
        tr = self.trainer
        rows = jnp.minimum(nodes, tr.graph.num_nodes - 1)
        if tr._fg_collapse is not None:
            col = fg if fg is not None else tr._fg_collapse
            return col.logits(params["encoder"], rows)
        from marius_tpu.nn.full_graph_encoder import full_graph_encoder_forward
        feats, adj, ops = tr._fg_prepare(fg)
        logits_all = full_graph_encoder_forward(
            tr.model.encoder, params["encoder"], table_values, feats,
            adj, ops=ops)
        return logits_all[rows]

    def _build_eval_fn(self):
        tr = self.trainer
        model = tr.model
        nb_, b = self.num_batches, self.batch_size

        if tr.full_graph is not None:
            def eval_fn_fg(table_values, params, eval_nodes, fg=None,
                           data=None):
                logits = self._full_graph_logits(table_values, params,
                                                 eval_nodes, fg=fg)
                labels = tr.labels[jnp.minimum(eval_nodes, tr.graph.num_nodes)]
                mask = jnp.arange(nb_ * b) < self.num_eval
                return categorical_accuracy_statistics(logits, labels, mask)
            return eval_fn_fg

        def eval_fn(table_values, params, eval_nodes, fg=None, data=None):
            def body(acc, xs):
                seeds, mask_b, idx = xs
                k = jax.random.fold_in(jax.random.key(self.seed), idx)
                graph = data["graph"] if data is not None else tr.graph
                labels_arr = data["labels"] if data is not None else tr.labels
                nbatch, feats, emb, _ = tr._encode_batch(
                    params, table_values, k, seeds, mask_b, False,
                    hop_caps=self.hop_caps, data=data)
                logits = encoder_forward(
                    model.encoder, params["encoder"], emb, feats, nbatch,
                    degrees=graph.degrees, train=False)
                labels_b = labels_arr[jnp.minimum(seeds, graph.num_nodes)]
                stats = categorical_accuracy_statistics(
                    logits, labels_b, mask_b & nbatch.seed_mask)
                return {k2: acc[k2] + v for k2, v in stats.items()}, None

            zero = {"correct": jnp.zeros((), jnp.float32),
                    "count": jnp.zeros((), jnp.float32)}
            acc, _ = jax.lax.scan(
                body, zero,
                (eval_nodes.reshape(nb_, b),
                 (jnp.arange(nb_ * b) < self.num_eval).reshape(nb_, b),
                 jnp.arange(nb_)))
            return acc

        return eval_fn

    def evaluate(self, state: TrainState) -> Dict[str, float]:
        table_values = state.table.values if state.table is not None else None
        tr = self.trainer
        data = None if tr.full_graph is not None else tr._data_args()
        stats = jax.device_get(self._eval_fn(
            table_values, state.params, self.eval_nodes,
            getattr(tr, "_fg_struct", None), data))
        reporter = NodeClassificationReporter()
        reporter.add_statistics(stats)
        res = reporter.results()
        reporter.report()
        return res

    def predict_labels(self, state: TrainState) -> np.ndarray:
        """Predicted class per eval node — marius_predict's NC labels export
        (NodeClassificationReporter::save, reporting.cpp:227-289)."""
        tr = self.trainer
        model = tr.model
        nb_, b = self.num_batches, self.batch_size

        if tr.full_graph is not None:
            @jax.jit
            def labels_fn_fg(table_values, params, eval_nodes, fg=None):
                logits = self._full_graph_logits(
                    table_values, params, eval_nodes, fg=fg)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

            table_values = state.table.values if state.table is not None else None
            preds = np.asarray(labels_fn_fg(
                table_values, state.params, self.eval_nodes,
                getattr(tr, "_fg_struct", None)))
            return preds[:self.num_eval]

        @jax.jit
        def labels_fn(table_values, params, eval_nodes, data=None):
            def body(_, xs):
                seeds, mask_b, idx = xs
                k = jax.random.fold_in(jax.random.key(self.seed), idx)
                graph = data["graph"] if data is not None else tr.graph
                nbatch, feats, emb, _ = tr._encode_batch(
                    params, table_values, k, seeds, mask_b, False,
                    hop_caps=self.hop_caps, data=data)
                logits = encoder_forward(
                    model.encoder, params["encoder"], emb, feats, nbatch,
                    degrees=graph.degrees, train=False)
                return None, jnp.argmax(logits, axis=-1).astype(jnp.int32)

            _, preds = jax.lax.scan(
                body, None,
                (eval_nodes.reshape(nb_, b),
                 (jnp.arange(nb_ * b) < self.num_eval).reshape(nb_, b),
                 jnp.arange(nb_)))
            return preds.reshape(-1)

        table_values = state.table.values if state.table is not None else None
        preds = np.asarray(labels_fn(table_values, state.params,
                                     self.eval_nodes, tr._data_args()))
        return preds[:self.num_eval]
