"""ogbn-arxiv GraphSAGE node classification via the Python API.

The marius_tpu equivalent of the reference's examples/python/ogbn_arxiv_nc.py:
download + preprocess the dataset with the built-in preprocessor, build a
3-layer GraphSAGE model programmatically, train with the compiled-epoch
trainer, and report categorical accuracy.

Run: python ogbn_arxiv_nc.py [output_dir]   (download needs internet; point
output_dir at an existing preprocessed copy to skip it)
"""

import os
import sys

from marius_tpu.data.graph import build_device_graph
from marius_tpu.data.samplers.neighbor import NeighborSamplingConfig
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import NODE_CLASSIFICATION, Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.storage.dataset import (
    load_features,
    load_labels,
    load_node_split,
    load_split,
    load_stats,
)
from marius_tpu.tools.preprocess.datasets import DATASET_REGISTRY
from marius_tpu.train.nc import NodeClassificationEvaluator, NodeClassificationTrainer

DATASET_DIR = sys.argv[1] if len(sys.argv) > 1 else "datasets/ogbn_arxiv/"
NUM_EPOCHS = 10
BATCH_SIZE = 1000
FANOUT = 15


def init_model(feature_dim: int, num_classes: int) -> Model:
    # FEATURE input stage + 3 GraphSAGE stages, last one emitting class
    # logits (the reference example's init_model, ogbn_arxiv_nc.py:11-47);
    # decoder=None is the NoOp node decoder
    stages = (
        (LayerConfig(layer_type="FEATURE", output_dim=feature_dim),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE", bias=True,
                     input_dim=feature_dim, output_dim=feature_dim,
                     activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE", bias=True,
                     input_dim=feature_dim, output_dim=feature_dim,
                     activation="RELU"),),
        (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE", bias=True,
                     input_dim=feature_dim, output_dim=num_classes),),
    )
    return Model(
        learning_task=NODE_CLASSIFICATION,
        encoder=EncoderConfig(stages=stages),
        decoder=None,
        loss_type="CROSS_ENTROPY",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01),
    )


def main():
    if not os.path.exists(os.path.join(DATASET_DIR, "dataset.yaml")):
        ds = DATASET_REGISTRY["ogbn_arxiv"](DATASET_DIR)
        ds.download()
        ds.preprocess()

    stats = load_stats(DATASET_DIR)
    edges = load_split(DATASET_DIR, "train", stats)
    features = load_features(DATASET_DIR, stats)
    labels = load_labels(DATASET_DIR, stats)
    train_nodes = load_node_split(DATASET_DIR, "train")
    test_nodes = load_node_split(DATASET_DIR, "test")

    graph = build_device_graph(edges, stats.num_nodes)
    model = init_model(stats.feature_dim, stats.num_classes)
    samplers = [NeighborSamplingConfig("UNIFORM", max_neighbors=FANOUT)] * 3

    trainer = NodeClassificationTrainer(
        model, graph, features, labels, train_nodes, samplers,
        batch_size=BATCH_SIZE)
    evaluator = NodeClassificationEvaluator(trainer, test_nodes)

    for epoch in range(NUM_EPOCHS):
        s = trainer.train_epoch()
        print(f"epoch {epoch + 1}: loss={s['loss']:.1f} "
              f"{s['nodes_per_sec']:.0f} nodes/s")
    results = evaluator.evaluate(trainer.state)
    print({k: round(float(v), 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
