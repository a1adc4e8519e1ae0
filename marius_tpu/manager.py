"""Driver: config -> storage -> trainer/evaluator -> epoch loop.

Parity with the reference manager (src/cpp/src/marius.cpp): `marius_init` (:38)
builds the model, storage and dataloaders from one config; `marius_train`
(:105) runs the epoch loop with eval cadence, interval checkpoints and a final
save; `marius_eval` (:165) restores a trained model and evaluates;
`encode_and_export` (:13) writes full-graph encoder outputs.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

from marius_tpu.config.schema import MariusConfig, load_config
from marius_tpu.data.graph import build_device_graph
from marius_tpu.nn.model import LINK_PREDICTION, NODE_CLASSIFICATION
from marius_tpu.ops.edge_keys import build_edge_key_set
from marius_tpu.reporting.logger import get_logger
from marius_tpu.storage import checkpoint as ckpt
from marius_tpu.storage.dataset import (
    load_features,
    load_labels,
    load_node_split,
    load_split,
    load_stats,
)
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.nc import NodeClassificationEvaluator, NodeClassificationTrainer
from marius_tpu.train.trainer import LinkPredictionTrainer


@dataclasses.dataclass
class MariusRuntime:
    """Everything marius_init builds (marius.cpp:38-103 returns the
    model/storage/dataloader tuple; here one object)."""

    config: MariusConfig
    trainer: Any
    valid_evaluator: Optional[Any]
    test_evaluator: Optional[Any]
    epochs_processed: int = 0

    @property
    def state(self):
        return self.trainer.state

    @state.setter
    def state(self, s):
        self.trainer.state = s


def _dtype(cfg: MariusConfig):
    from marius_tpu.config.schema import resolve_dtype
    return resolve_dtype(cfg.storage.embeddings_dtype)


def _load_lp_data(cfg: MariusConfig):
    ds = cfg.storage.dataset
    stats = None
    if ds.dataset_dir and os.path.exists(os.path.join(ds.dataset_dir, "dataset.yaml")):
        stats = load_stats(ds.dataset_dir)
    # FLAT_FILE edge tier: memory-map the binary file so train edges are
    # paged from disk instead of materialized (storage.h:149 FlatFile)
    train = load_split(ds.dataset_dir, "train", stats,
                       mmap=cfg.storage.edges_backend == "FLAT_FILE")
    valid = test = None
    try:
        valid = load_split(ds.dataset_dir, "valid", stats)
    except FileNotFoundError:
        pass
    try:
        test = load_split(ds.dataset_dir, "test", stats)
    except FileNotFoundError:
        pass
    return train, valid, test


def _build_mesh(cfg: MariusConfig):
    """training.mesh -> jax.sharding.Mesh (None when single-device)."""
    t = cfg.training
    import jax

    if t.mesh_data in (0, 1) and t.mesh_node in (0, 1):
        return None
    from marius_tpu.parallel.mesh import make_mesh
    n_dev = len(jax.devices())
    node = t.mesh_node if t.mesh_node > 0 else max(1, n_dev // max(t.mesh_data, 1))
    data = t.mesh_data if t.mesh_data > 0 else max(1, n_dev // node)
    return make_mesh(num_data=data, num_node=node,
                     devices=jax.devices()[:data * node])


class _HostStreamLPEval:
    """evaluation.host_streaming=true: the raw table never enters HBM whole —
    tiled device encoding + streamed scoring (LinkPredictionEvaluator.
    evaluate_from_host_table) instead of the in-HBM compiled scan."""

    def __init__(self, ev, features_host):
        self.ev = ev
        self.features_host = features_host

    def evaluate(self, state):
        host = None if state.table is None else np.asarray(state.table.values)
        return self.ev.evaluate_from_host_table(
            host, state.params, features_host=self.features_host)


def marius_init(cfg: MariusConfig, train: bool = True) -> MariusRuntime:
    log = get_logger(cfg.storage.model_dir or None,
                     console_level=cfg.storage.log_level)
    ds = cfg.storage.dataset
    model = cfg.model
    mesh = _build_mesh(cfg)
    if mesh is not None:
        log.info("Device mesh: %s (mode=%s)", dict(mesh.shape), cfg.training.mesh_mode)

    if cfg.learning_task == LINK_PREDICTION:
        train_edges, valid_edges, test_edges = _load_lp_data(cfg)
        num_nodes, num_rels = ds.num_nodes, max(ds.num_relations, 1)
        log.info("Loaded dataset: %d nodes, %d relations, %d train edges",
                 num_nodes, num_rels, len(train_edges))

        graph = None
        features = None
        train_nbr, eval_nbr = cfg.train_neighbor_sampling, cfg.eval_neighbor_sampling
        if cfg.train_neighbor_sampling:
            graph = build_device_graph(train_edges, num_nodes, num_rels)
            from marius_tpu.data.samplers.neighbor import resolve_all_caps
            train_nbr = resolve_all_caps(train_nbr, graph.in_offsets, graph.out_offsets,
                                         cap_limit=cfg.all_cap_limit)
            eval_nbr = resolve_all_caps(eval_nbr, graph.in_offsets, graph.out_offsets,
                                        cap_limit=cfg.all_cap_limit)
        if model.encoder.has_features:
            features = load_features(ds.dataset_dir)

        train_filter = None
        if cfg.training.negative_sampling.filtered:
            train_filter = (build_edge_key_set(train_edges, corrupt_dst=True),
                            build_edge_key_set(train_edges, corrupt_dst=False))

        # Async pipeline mapping (PipelineTrainer, trainer.cpp:35-74): K
        # staleness-bound batches read ONE table snapshot and their updates
        # merge — expressed as a K-times-larger compiled step with K-times
        # the negative chunks, preserving each sub-batch's chunk structure.
        # Applies in BOTH storage modes (the reference pipelines over the
        # buffer the same way).
        batch_size = cfg.training.batch_size
        neg = cfg.training.negative_sampling
        if not cfg.training.sync and cfg.training.staleness_bound > 1:
            k = cfg.training.staleness_bound
            batch_size *= k
            neg = dataclasses.replace(neg, num_chunks=neg.num_chunks * k)
            if model.loss_reduction.upper() == "MEAN":
                # the merged step must apply the SUM of the K sub-batch
                # mean-gradients (K reference steps at one snapshot), not
                # their average (see Model.loss_scale)
                model = dataclasses.replace(model, loss_scale=float(k))
            log.info("Async pipeline: staleness_bound=%d -> step of %d edges", k, batch_size)

        if cfg.storage.embeddings_backend == "PARTITION_BUFFER":
            from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer
            trainer = PartitionBufferLPTrainer(
                model, num_nodes, num_rels, train_edges,
                neg,
                batch_size=batch_size,
                num_partitions=cfg.storage.num_partitions,
                buffer_capacity=cfg.storage.buffer_capacity,
                seed=cfg.training.seed,
                ordering=cfg.storage.edge_bucket_ordering,
                fine_to_coarse_ratio=cfg.storage.fine_to_coarse_ratio,
                num_cache_partitions=cfg.storage.num_cache_partitions,
                randomly_assign_edge_buckets=cfg.storage.randomly_assign_edge_buckets,
                dtype=_dtype(cfg),
                nbr_configs=train_nbr,
                features=features,
                mesh=mesh,
                prefetching=cfg.storage.prefetching,
                epochs_per_shuffle=cfg.training.epochs_per_shuffle,
                train_filter_keys=train_filter,
                sparse_writeback=cfg.storage.sparse_writeback,
            )
        else:
            trainer = LinkPredictionTrainer(
                model, num_nodes, num_rels, train_edges,
                neg,
                batch_size=batch_size,
                seed=cfg.training.seed,
                train_filter_keys=train_filter,
                graph=graph,
                nbr_configs=train_nbr,
                features=features,
                hop_caps=cfg.hop_caps or None,
                dtype=_dtype(cfg),
                mesh=mesh,
                sharding_mode=cfg.training.mesh_mode,
                edges_backend=cfg.storage.edges_backend,
                epochs_per_shuffle=cfg.training.epochs_per_shuffle,
            )

        all_edges_list = [train_edges] + [e for e in (valid_edges, test_edges) if e is not None]
        all_edges = np.concatenate(all_edges_list, axis=0)
        host_streaming = cfg.evaluation.host_streaming
        # host streaming keeps features host-side too; don't trigger the
        # trainer's device mirror
        eval_features = None if host_streaming else trainer.features

        # exact-ALL full-graph encoding for GNN evaluation: when every eval
        # sampler is ALL and the encoder supports it, all-node encoding is
        # ONE full-graph pass (no per-batch frontiers, no all_cap_limit
        # truncation — the reference's unbounded ALL, neighbor.cpp:9)
        eval_full_graph = eval_fg_ops = None
        if (eval_nbr and graph is not None and not host_streaming
                and getattr(cfg, "full_graph", "AUTO").upper() != "OFF"
                and all(n.sampling_type.upper() == "ALL" for n in eval_nbr)):
            from marius_tpu.nn.full_graph_encoder import (
                prepare_full_graph,
                supports_full_graph,
            )
            if supports_full_graph(model.encoder):
                from marius_tpu.data.full_graph import (
                    build_full_graph_adjacency,
                )
                from marius_tpu.nn.full_graph_encoder import encoder_has_rgcn
                adj = build_full_graph_adjacency(
                    train_edges, num_nodes,
                    with_relations=encoder_has_rgcn(model.encoder))
                feats = None if eval_features is None else eval_features[:-1]
                # prepare once (const first-stage agg, GAT inverse map);
                # valid and test evaluators share the result
                eval_full_graph, eval_fg_ops = prepare_full_graph(
                    adj, model.encoder, feats)
                log.info("Evaluation uses exact-ALL full-graph encoding")

        def make_eval(edges):
            if edges is None or len(edges) == 0:
                return None
            ev = LinkPredictionEvaluator(
                model, num_nodes, num_rels, edges,
                all_edges=all_edges,
                batch_size=cfg.evaluation.batch_size,
                filtered=cfg.evaluation.negative_sampling.filtered,
                neg_config=cfg.evaluation.negative_sampling,
                graph=graph,
                nbr_configs=eval_nbr,
                features=eval_features,
                full_graph=eval_full_graph,
                fg_ops=eval_fg_ops,
            )
            if host_streaming:
                return _HostStreamLPEval(ev, features)
            return ev

        runtime = MariusRuntime(cfg, trainer, make_eval(valid_edges), make_eval(test_edges))

    elif cfg.learning_task == NODE_CLASSIFICATION:
        stats = load_stats(ds.dataset_dir)
        edges = load_split(ds.dataset_dir, "train", stats)
        features = load_features(ds.dataset_dir) if model.encoder.has_features else None
        labels = load_labels(ds.dataset_dir)
        train_nodes = load_node_split(ds.dataset_dir, "train")
        num_nodes = ds.num_nodes
        graph = None
        full_graph = None
        train_nbr = cfg.train_neighbor_sampling
        # out-of-core NC engages when EITHER node tier is buffered: features,
        # or the optional learnable embedding table (io.cpp:347-433)
        nc_buffered = (
            cfg.storage.features_backend == "PARTITION_BUFFER"
            or (model.has_embeddings
                and cfg.storage.embeddings_backend == "PARTITION_BUFFER"))
        if not nc_buffered:
            # buffer mode keeps the graph host-side; only resident subgraphs
            # ever reach HBM
            graph = build_device_graph(edges, num_nodes, max(ds.num_relations, 1))
            # exact-ALL fast path: when every hop samples ALL and the encoder
            # is aggregation-style, compute layers over the full padded
            # adjacency instead of per-batch frontiers (data/full_graph.py) —
            # exact semantics (no cap truncation) and no index machinery.
            # AUTO engages it when a typical batch's k-hop frontier covers
            # a sizable fraction of the graph (then per-batch sampling does
            # near-full-graph work anyway, plus dedup/remap overhead).
            from marius_tpu.nn.full_graph_encoder import (
                supports_full_graph,
                supports_sharded_full_graph,
            )
            fg_mode = getattr(cfg, "full_graph", "AUTO").upper()
            # multi-chip: the node-sharded collective-permute ring path
            # (full_graph_sharded.py) needs feature inputs, SAGE/GCN layers,
            # and exactly one non-trivial mesh axis
            fg_mesh_ok = mesh is None or (
                features is not None
                and not model.has_embeddings
                and supports_sharded_full_graph(model.encoder)
                and sum(1 for v in mesh.shape.values() if v > 1) == 1)
            if (fg_mode != "OFF" and fg_mesh_ok and train_nbr
                    and all(c.sampling_type.upper() == "ALL" for c in train_nbr)
                    and supports_full_graph(model.encoder)):
                depth = len(train_nbr)
                avg_deg = 2.0 * len(edges) / max(num_nodes, 1)
                frontier = cfg.training.batch_size * max(avg_deg, 1.0) ** depth
                if fg_mode == "ON" or frontier >= num_nodes / 4:
                    from marius_tpu.data.full_graph import (
                        build_full_graph_adjacency,
                    )
                    from marius_tpu.nn.full_graph_encoder import (
                        encoder_has_rgcn,
                    )
                    full_graph = build_full_graph_adjacency(
                        edges, num_nodes,
                        with_relations=encoder_has_rgcn(model.encoder))
                if full_graph is not None:
                    log.info("Full-graph ALL mode: %d padded slots over "
                             "%d degree buckets, exact ALL",
                             full_graph.total_slots, len(full_graph.nbrs))
            if full_graph is None:
                from marius_tpu.data.samplers.neighbor import resolve_all_caps
                train_nbr = resolve_all_caps(
                    train_nbr, graph.in_offsets, graph.out_offsets,
                    cap_limit=cfg.all_cap_limit)
        else:
            from marius_tpu.data.samplers.neighbor import resolve_all_caps_from_edges
            train_nbr = resolve_all_caps_from_edges(train_nbr, edges, num_nodes,
                                                    cap_limit=cfg.all_cap_limit)
        log.info("Loaded NC dataset: %d nodes, %d edges, %d train nodes",
                 num_nodes, len(edges), len(train_nodes))

        # Async pipeline mapping for NC (PipelineTrainer, trainer.cpp:35-74):
        # K staleness-bound seed batches read ONE parameter snapshot and
        # their updates merge — with SUM-reduction CE that is exactly a
        # K-times-larger seed batch (sub-batch grads at the same params add);
        # with MEAN reduction the merged loss is scaled by K so the gradient
        # is the SUM of the sub-batch mean-gradients (see Model.loss_scale).
        # In full-graph mode this also amortizes the all-node GNN layers
        # over K batches of seeds.
        nc_batch_size = cfg.training.batch_size
        if not cfg.training.sync and cfg.training.staleness_bound > 1:
            k = cfg.training.staleness_bound
            nc_batch_size *= k
            if model.loss_reduction.upper() == "MEAN":
                model = dataclasses.replace(model, loss_scale=float(k))
            log.info("Async pipeline: staleness_bound=%d -> step of %d seeds",
                     k, nc_batch_size)

        if nc_buffered:
            from marius_tpu.train.nc_buffer import PartitionBufferNCTrainer
            trainer = PartitionBufferNCTrainer(
                model, edges, features, labels, train_nodes,
                train_nbr, num_nodes=num_nodes,
                batch_size=nc_batch_size,
                num_partitions=cfg.storage.num_partitions,
                buffer_capacity=cfg.storage.buffer_capacity,
                ordering=cfg.storage.node_partition_ordering,
                seed=cfg.training.seed,
                mesh=mesh,
                epochs_per_shuffle=cfg.training.epochs_per_shuffle,
            )

            class _BufferNCEval:
                def __init__(self, nodes):
                    self.nodes = nodes

                def evaluate(self, state):
                    return trainer.evaluate_nodes(self.nodes)

            def make_nc_eval(split):
                try:
                    nodes = load_node_split(ds.dataset_dir, split)
                except FileNotFoundError:
                    return None
                return _BufferNCEval(nodes) if len(nodes) else None
        else:
            auto_caps = None
            from marius_tpu.ops.unique import PREFIX_BITMAP_LIMIT
            if cfg.hop_caps_auto and not cfg.hop_caps and train_nbr and \
                    not any(c.sampling_type.upper() == "ALL" for c in train_nbr) \
                    and num_nodes <= PREFIX_BITMAP_LIMIT:
                # `hop_caps: auto`: size caps from the graph's observed
                # frontier growth instead of the geometric worst case; safe
                # ONLY below the prefix-bitmap limit, where the sampler
                # degrades overflow to counted (highest-id-first) neighbor
                # truncation (beyond
                # it the sorted dedup path would alias dropped ids, so we
                # keep worst-case caps there)
                from marius_tpu.data.samplers.neighbor import (
                    estimate_hop_caps_empirical,
                )
                auto_caps = estimate_hop_caps_empirical(
                    edges, num_nodes, train_nbr, nc_batch_size,
                    seed=cfg.training.seed, seed_pool=train_nodes)
                log.info("empirical hop caps: %s", auto_caps)
            elif cfg.hop_caps_auto and num_nodes > PREFIX_BITMAP_LIMIT:
                log.warning(
                    "hop_caps: auto ignored at %d nodes (> prefix-bitmap "
                    "limit %d): tight caps would alias on the sorted dedup "
                    "path; using worst-case caps", num_nodes,
                    PREFIX_BITMAP_LIMIT)
            trainer = NodeClassificationTrainer(
                model, graph, features, labels, train_nodes,
                train_nbr,
                batch_size=nc_batch_size,
                hop_caps=cfg.hop_caps or auto_caps,
                seed=cfg.training.seed,
                dtype=_dtype(cfg),
                mesh=mesh,
                full_graph=full_graph,
                epochs_per_shuffle=cfg.training.epochs_per_shuffle,
            )

            def make_nc_eval(split):
                try:
                    nodes = load_node_split(ds.dataset_dir, split)
                except FileNotFoundError:
                    return None
                if len(nodes) == 0:
                    return None
                return NodeClassificationEvaluator(
                    trainer, nodes, batch_size=cfg.evaluation.batch_size)

        runtime = MariusRuntime(cfg, trainer, make_nc_eval("valid"), make_nc_eval("test"))
    else:
        raise ValueError(f"Unknown learning task: {cfg.learning_task}")

    # resume (marius.cpp:59-76)
    t = cfg.training
    if train and (t.resume_training or t.resume_from_checkpoint):
        path = t.resume_from_checkpoint or cfg.storage.model_dir
        state, meta = ckpt.load_state(path, runtime.trainer.state)
        runtime.trainer.state = state
        runtime.epochs_processed = int(meta.get("epochs_processed", 0))
        log.info("Resumed from %s at epoch %d", path, runtime.epochs_processed)
        if meta.get("missing_leaves"):
            log.warning("Checkpoint %s was saved with save_state=false: "
                        "optimizer state restarts fresh (%d leaves)", path,
                        len(meta["missing_leaves"]))
    elif not train:
        # evaluation.checkpoint_dir overrides model_dir (marius.cpp:81-84)
        model_dir = cfg.evaluation.checkpoint_dir or cfg.storage.model_dir
        if model_dir and not cfg.evaluation.checkpoint_dir \
                and not os.path.exists(os.path.join(model_dir, "meta.yaml")):
            # AUTO-versioned model_dir (schema._next_model_dir) resolves to
            # the next FREE model_<i> at load time; for eval, fall back to
            # the most recently trained sibling. Never applied to an
            # explicitly-set checkpoint_dir — a typo there must fail loudly,
            # not silently evaluate a different model.
            base = os.path.dirname(model_dir)
            tail = os.path.basename(model_dir)
            if tail.startswith("model_") and tail[6:].isdigit():
                # highest-index sibling holding a trained model — the most
                # recently ALLOCATED by _next_model_dir, deterministic under
                # mtime perturbation (copies/restores/touch), unlike raw
                # mtime ordering
                best = None
                for i in range(11):
                    cand = os.path.join(base, f"model_{i}")
                    if os.path.exists(os.path.join(cand, "meta.yaml")):
                        best = cand
                if best is not None:
                    log.info(
                        "storage.model_dir %s holds no trained model; "
                        "evaluating the latest sibling %s instead (set "
                        "evaluation.checkpoint_dir to pin an exact model)",
                        model_dir, best)
                    model_dir = best
        if model_dir and os.path.exists(os.path.join(model_dir, "meta.yaml")):
            state, meta = ckpt.load_state(model_dir, runtime.trainer.state)
            runtime.trainer.state = state
            runtime.epochs_processed = int(meta.get("epochs_processed", 0))
            log.info("Loaded trained model from %s", model_dir)

    return runtime


def marius_train(config, model_dir: Optional[str] = None) -> Dict[str, Any]:
    """Full config-driven training (marius_train, marius.cpp:105-163)."""
    cfg = config if isinstance(config, MariusConfig) else load_config(config, model_dir)
    log = get_logger(cfg.storage.model_dir or None)
    rt = marius_init(cfg, train=True)
    t = cfg.training

    epoch_stats: List[Dict[str, float]] = []
    eval_stats: List[Dict[str, float]] = []
    best_metric: Optional[float] = None   # training.checkpoint.save_best
    if t.save_best and cfg.storage.model_dir:
        # resume: a previously saved best must not be overwritten by a
        # worse first post-resume validation
        meta_path = os.path.join(cfg.storage.model_dir, "meta.yaml")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev_meta = yaml.safe_load(f) or {}
            if prev_meta.get("best_valid_metric") is not None:
                best_metric = float(prev_meta["best_valid_metric"])
                log.info("save_best: previous best valid metric %.5f in %s",
                         best_metric, cfg.storage.model_dir)
    for epoch in range(rt.epochs_processed, t.num_epochs):
        stats = rt.trainer.train_epoch()
        rt.epochs_processed = epoch + 1
        epoch_stats.append(stats)
        rate_key = "edges_per_sec" if "edges_per_sec" in stats else "nodes_per_sec"
        log.info("Epoch %d: loss=%.4f time=%.3fs %s=%.0f", epoch + 1,
                 stats["loss"], stats["epoch_time_s"], rate_key, stats.get(rate_key, 0))

        if rt.valid_evaluator is not None and (epoch + 1) % max(t.epochs_per_eval, 1) == 0:
            res = rt.valid_evaluator.evaluate(rt.trainer.state)
            res["split"] = "valid"
            res["epoch"] = epoch + 1
            eval_stats.append(res)
            # save_best: keep the best-valid model in model_dir (MRR for LP,
            # accuracy for NC — higher is better for both)
            metric = res.get("mrr", res.get("accuracy"))
            if (t.save_best and cfg.storage.model_dir and metric is not None
                    and (best_metric is None or metric > best_metric)):
                best_metric = float(metric)
                ckpt.save_state(cfg.storage.model_dir, rt.trainer.state,
                                metadata={**_meta(rt), "best_valid_metric": best_metric})
                log.info("New best valid metric %.5f at epoch %d — saved",
                         best_metric, epoch + 1)

        if t.checkpoint_interval > 0 and (epoch + 1) % t.checkpoint_interval == 0 \
                and cfg.storage.model_dir:
            ckpt.create_checkpoint(cfg.storage.model_dir, rt.trainer.state, epoch + 1,
                                   metadata=_meta(rt),
                                   save_optim_state=t.checkpoint_save_state)
            log.info("Checkpoint at epoch %d", epoch + 1)

    # with save_best, final metrics come from the best saved model, not the
    # last epoch's
    if best_metric is not None:
        state, _ = ckpt.load_state(cfg.storage.model_dir, rt.trainer.state)
        rt.trainer.state = state
        log.info("save_best: restored best model (valid metric %.5f) for "
                 "final evaluation", best_metric)

    final: Dict[str, Any] = {"epochs": epoch_stats, "evals": eval_stats}
    if rt.test_evaluator is not None:
        res = rt.test_evaluator.evaluate(rt.trainer.state)
        res["split"] = "test"
        final["test"] = res

    if cfg.storage.save_model and cfg.storage.model_dir and best_metric is None:
        os.makedirs(cfg.storage.model_dir, exist_ok=True)
        ckpt.save_state(cfg.storage.model_dir, rt.trainer.state, metadata=_meta(rt))
        log.info("Saved model to %s", cfg.storage.model_dir)
    if cfg.storage.export_encoded_nodes:
        # encode_and_export (marius.cpp:159-162)
        encode_and_export(rt)
        log.info("Exported encoded nodes")
    final["runtime"] = rt
    return final


def marius_eval(config, model_dir: Optional[str] = None) -> Dict[str, Any]:
    """Evaluate a trained model (marius_eval, marius.cpp:165-185)."""
    cfg = config if isinstance(config, MariusConfig) else load_config(config, model_dir)
    rt = marius_init(cfg, train=False)
    out: Dict[str, Any] = {}
    if rt.test_evaluator is not None:
        out["test"] = rt.test_evaluator.evaluate(rt.trainer.state)
    elif rt.valid_evaluator is not None:
        out["valid"] = rt.valid_evaluator.evaluate(rt.trainer.state)
    out["runtime"] = rt
    return out


def encode_and_export(rt: MariusRuntime, path: Optional[str] = None) -> np.ndarray:
    """Full-graph encoder outputs to <model_dir>/encoded_nodes.bin
    (encode_and_export, marius.cpp:13-36)."""
    from marius_tpu.train.graph_encoder import encode_all_nodes

    tr = rt.trainer
    state = tr.state
    table_values = state.table.values if state.table is not None else None
    # full-graph trainers keep their nbr_configs UNRESOLVED (ALL caps are
    # never sized — the full-graph path needs none); export must ride the
    # same exact-ALL path, not the sampled fallback, whose default cap
    # would silently truncate hub neighborhoods. Ring-sharded trainers
    # re-prepare single-device ops from the plain adjacency.
    full_graph = getattr(tr, "full_graph", None)
    fg_ops = (None if getattr(tr, "_fg_sharded", False)
              else getattr(tr, "_fg_ops", None))
    encoded = np.asarray(encode_all_nodes(
        rt.config.model, state.params, table_values,
        graph=getattr(tr, "graph", None),
        nbr_configs=getattr(tr, "nbr_configs", ()),
        features=getattr(tr, "features", None),
        batch_size=rt.config.evaluation.batch_size,
        full_graph=full_graph, fg_ops=fg_ops))
    out = path or (os.path.join(rt.config.storage.model_dir, "encoded_nodes.bin")
                   if rt.config.storage.model_dir else None)
    if out:
        os.makedirs(os.path.dirname(out), exist_ok=True)
        encoded.astype(np.float32).tofile(out)
    return encoded


def _meta(rt: MariusRuntime) -> Dict[str, Any]:
    return {
        "epochs_processed": rt.epochs_processed,
        "learning_task": rt.config.learning_task,
        "timestamp": time.time(),
    }
