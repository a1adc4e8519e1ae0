"""Worker for tests/test_multihost.py: one process of a 2-process
multi-controller LP training run. Launched with its own env (4 virtual CPU
devices, NO conftest) — argv: process_id num_processes port. Also imported
by the test for ``build_trainer`` (module import has no side effects beyond
forcing the CPU platform)."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_trainer(mesh, sharding_mode="gspmd", edges_backend="DEVICE_MEMORY"):
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.trainer import LinkPredictionTrainer

    num_nodes, num_rels, dim = 64, 4, 16
    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, num_nodes, 400),
                      rng.integers(0, num_rels, 400),
                      rng.integers(0, num_nodes, 400)], 1).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=dim),),))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("DISTMULT", num_rels, dim))
    return LinkPredictionTrainer(
        model, num_nodes, num_rels, edges,
        NegativeSamplingConfig(num_chunks=4, negatives_per_positive=8),
        batch_size=40, seed=0, mesh=mesh, sharding_mode=sharding_mode,
        edges_backend=edges_backend)


def evaluate_lp(trainer):
    """Filtered MRR of the trained state — exercises the evaluator stack
    (streamed filtered ranks, edge key sets) under the trainer's placement."""
    from marius_tpu.train.evaluator import LinkPredictionEvaluator

    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, 64, 400),
                      rng.integers(0, 4, 400),
                      rng.integers(0, 64, 400)], 1).astype(np.int32)
    ev = LinkPredictionEvaluator(
        trainer.model, 64, 4, edges[:100], all_edges=edges,
        batch_size=50, filtered=True)
    return float(ev.evaluate(trainer.state)["mrr"])


def evaluate_nc(trainer):
    from marius_tpu.train.nc import NodeClassificationEvaluator

    ev = NodeClassificationEvaluator(trainer,
                                     np.arange(64, 80, dtype=np.int32))
    return float(ev.evaluate(trainer.state)["accuracy"])


def build_gnn_lp_trainer(mesh, sharding_mode="explicit"):
    """GNN LP over the process-spanning mesh (explicit shard_map path:
    collectives.make_sharded_gnn_lp_update). ALL sampling is deterministic,
    so 2-process trajectories must match the single-process run."""
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import (
        NeighborSamplingConfig,
        resolve_all_caps_from_edges,
    )
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.trainer import LinkPredictionTrainer

    num_nodes, num_rels, dim = 64, 4, 16
    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, num_nodes, 400),
                      rng.integers(0, num_rels, 400),
                      rng.integers(0, num_nodes, 400)], 1).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=dim),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE",
                     aggregator="MEAN", input_dim=dim, output_dim=dim),),
    ))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("DISTMULT", num_rels, dim))
    nbr = resolve_all_caps_from_edges(
        (NeighborSamplingConfig("ALL"),), edges, num_nodes)
    return LinkPredictionTrainer(
        model, num_nodes, num_rels, edges,
        NegativeSamplingConfig(num_chunks=4, negatives_per_positive=8),
        batch_size=40, seed=0, mesh=mesh, sharding_mode=sharding_mode,
        graph=build_device_graph(edges, num_nodes, num_rels),
        nbr_configs=nbr)


def build_buffer_trainer(mesh):
    from marius_tpu.data.samplers.negative import NegativeSamplingConfig
    from marius_tpu.nn.decoders.edge import EdgeDecoder
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import LINK_PREDICTION, Model
    from marius_tpu.train.buffer_trainer import PartitionBufferLPTrainer

    num_nodes, num_rels, dim = 64, 4, 16
    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, num_nodes, 400),
                      rng.integers(0, num_rels, 400),
                      rng.integers(0, num_nodes, 400)], 1).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=dim),),))
    model = Model(learning_task=LINK_PREDICTION, encoder=enc,
                  decoder=EdgeDecoder("DISTMULT", num_rels, dim))
    return PartitionBufferLPTrainer(
        model, num_nodes, num_rels, edges,
        NegativeSamplingConfig(num_chunks=4, negatives_per_positive=8),
        batch_size=40, num_partitions=4, buffer_capacity=2, seed=0,
        mesh=mesh)


def build_nc_trainer(mesh):
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
    from marius_tpu.nn.optimizers import OptimizerConfig
    from marius_tpu.train.nc import NodeClassificationTrainer

    n, f, c = 80, 8, 4
    rng = np.random.default_rng(1)
    edges = np.stack([rng.integers(0, n, 500),
                      rng.integers(0, n, 500)], 1).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE",
                     aggregator="MEAN", input_dim=f, output_dim=c,
                     bias=True),),
    ))
    model = Model(learning_task=NODE_CLASSIFICATION, encoder=enc,
                  decoder=None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM",
                  dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    return NodeClassificationTrainer(
        model, build_device_graph(edges, n), feats, labels,
        np.arange(64, dtype=np.int32),
        [NeighborSamplingConfig("UNIFORM", max_neighbors=4)],
        batch_size=32, seed=0, mesh=mesh)


def build_ring_trainer(ring_mesh):
    """Node-sharded exact-ALL full-graph NC over the collective-permute
    ring — multi-controller: structures placed globally (place_on_mesh) and
    passed to the epoch jit as arguments (trainer._fg_struct)."""
    from marius_tpu.data.full_graph import build_full_graph_adjacency
    from marius_tpu.data.graph import build_device_graph
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
    from marius_tpu.nn.optimizers import OptimizerConfig
    from marius_tpu.train.nc import NodeClassificationTrainer

    n, f, c = 80, 8, 4
    rng = np.random.default_rng(1)
    edges = np.stack([rng.integers(0, n, 500),
                      rng.integers(0, n, 500)], 1).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE",
                     aggregator="MEAN", input_dim=f, output_dim=c,
                     bias=True),),
    ))
    model = Model(learning_task=NODE_CLASSIFICATION, encoder=enc,
                  decoder=None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM",
                  dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    adj = build_full_graph_adjacency(edges, n)
    return NodeClassificationTrainer(
        model, build_device_graph(edges, n), feats, labels,
        np.arange(64, dtype=np.int32), (), batch_size=16, seed=0,
        full_graph=adj, mesh=ring_mesh)


def build_nc_buffer_trainer(mesh):
    from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
    from marius_tpu.nn.encoder import EncoderConfig, LayerConfig
    from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
    from marius_tpu.nn.optimizers import OptimizerConfig
    from marius_tpu.train.nc_buffer import PartitionBufferNCTrainer

    n, f, c = 80, 8, 4
    rng = np.random.default_rng(1)
    edges = np.stack([rng.integers(0, n, 500),
                      rng.integers(0, n, 500)], 1).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    enc = EncoderConfig(stages=(
        (LayerConfig(layer_type="FEATURE", output_dim=f),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE",
                     aggregator="MEAN", input_dim=f, output_dim=c,
                     bias=True),),
    ))
    model = Model(learning_task=NODE_CLASSIFICATION, encoder=enc,
                  decoder=None, loss_type="CROSS_ENTROPY",
                  loss_reduction="SUM",
                  dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01))
    return PartitionBufferNCTrainer(
        model, edges, feats, labels, np.arange(64, dtype=np.int32),
        (NeighborSamplingConfig("UNIFORM", max_neighbors=4),),
        num_nodes=n, batch_size=32, num_partitions=4, buffer_capacity=2,
        ordering="SEQUENTIAL", seed=0, mesh=mesh)


def main():
    pid, nproc, port = (int(sys.argv[1]), int(sys.argv[2]),
                        int(sys.argv[3]))
    from marius_tpu.parallel import multihost
    from marius_tpu.parallel.mesh import make_mesh

    multihost.initialize(f"localhost:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 8, jax.device_count()
    mesh = make_mesh(num_data=4, num_node=2)
    trainer = build_trainer(mesh)
    losses = [trainer.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES " + json.dumps(losses), flush=True)
    # filtered evaluation against the global trained state
    print("MRR " + json.dumps(evaluate_lp(trainer)), flush=True)
    # host-streamed edge tier under the same multi-process mesh
    trainer_h = build_trainer(mesh, edges_backend="HOST_MEMORY")
    losses_h = [trainer_h.train_epoch()["loss"] for _ in range(2)]
    print("LOSSES_HOST " + json.dumps(losses_h), flush=True)
    # the explicit shard_map collective step over the same global mesh
    trainer_x = build_trainer(mesh, sharding_mode="explicit")
    losses_x = [trainer_x.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES_X " + json.dumps(losses_x), flush=True)
    # GNN LP through the explicit shard_map step (sharded table + in-jit
    # sampling against the globally-replicated graph CSR)
    trainer_xg = build_gnn_lp_trainer(mesh)
    losses_xg = [trainer_xg.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES_XG " + json.dumps(losses_xg), flush=True)
    # data-parallel node classification (shard_map over seed nodes)
    trainer_nc = build_nc_trainer(mesh)
    losses_nc = [trainer_nc.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES_NC " + json.dumps(losses_nc), flush=True)
    print("NC_ACC " + json.dumps(evaluate_nc(trainer_nc)), flush=True)
    # out-of-core buffer training: replicated HBM working set, host-RAM
    # table, data-sharded batches, swaps/evictions across the ring of states
    trainer_buf = build_buffer_trainer(mesh)
    losses_buf = [trainer_buf.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES_BUF " + json.dumps(losses_buf), flush=True)
    # checkpoint-style state round-trip: the setter must re-place restored
    # host leaves as global arrays before the next multi-process epoch
    import jax.numpy as jnp

    def _to_host(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype,
                                                  jax.dtypes.prng_key):
            return a
        return np.asarray(a)

    trainer_buf.state = jax.tree.map(_to_host, trainer_buf.state)
    extra = trainer_buf.train_epoch()["loss"]
    print("BUF_RESUME " + json.dumps(float(extra)), flush=True)
    # out-of-core node classification (partition feature cache + swaps)
    trainer_ncb = build_nc_buffer_trainer(mesh)
    losses_ncb = [trainer_ncb.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES_NCB " + json.dumps(losses_ncb), flush=True)
    # ring-sharded exact-ALL full-graph NC over a 1x8 mesh spanning both
    # processes, evaluated against the global state
    ring_mesh = make_mesh(num_data=1, num_node=8)
    trainer_ring = build_ring_trainer(ring_mesh)
    losses_ring = [trainer_ring.train_epoch()["loss"] for _ in range(3)]
    print("LOSSES_RING " + json.dumps(losses_ring), flush=True)
    print("RING_ACC " + json.dumps(evaluate_nc(trainer_ring)), flush=True)


if __name__ == "__main__":
    main()
