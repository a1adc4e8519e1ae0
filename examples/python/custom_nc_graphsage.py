"""Custom node-classification dataset (CORA) + GraphSAGE via the Python API.

The marius_tpu equivalent of the reference's examples/python/
custom_nc_graphsage.py: define an NC dataset class that downloads CORA,
converts the citation edges with EdgeListConverter, remaps node features/
labels/splits, then trains a 2-layer GraphSAGE classifier programmatically.

Run: python custom_nc_graphsage.py [output_dir]
"""

import sys
import tarfile
from pathlib import Path

import numpy as np

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
from marius_tpu.tools.preprocess.converter import EdgeListConverter
from marius_tpu.tools.preprocess.datasets import (
    NodeClassificationDataset,
    remap_node_data,
)
from marius_tpu.storage.dataset import save_node_array, save_stats
from marius_tpu.tools.preprocess.utils import download_url
from marius_tpu.train.nc import NodeClassificationEvaluator, NodeClassificationTrainer

OUTPUT_DIR = sys.argv[1] if len(sys.argv) > 1 else "datasets/cora/"
NUM_EPOCHS = 10

CLASS_NAMES = [
    "Neural_Networks", "Rule_Learning", "Reinforcement_Learning",
    "Probabilistic_Methods", "Theory", "Genetic_Algorithms", "Case_Based",
]


class Cora(NodeClassificationDataset):
    """CORA citation graph: 2708 papers, 1433-dim bag-of-words features,
    7 classes (custom_nc_graphsage.py:36-120)."""

    dataset_name = "cora"
    dataset_url = "http://www.cs.umd.edu/~sen/lbc-proj/data/cora.tgz"

    def download(self, overwrite: bool = False) -> None:
        content = self.output_directory / "cora" / "cora.content"
        cites = self.output_directory / "cora" / "cora.cites"
        if not (content.exists() and cites.exists()) or overwrite:
            archive = download_url(self.dataset_url, self.output_directory,
                                   overwrite)
            with tarfile.open(archive) as tf:
                tf.extractall(self.output_directory)
        self.content_file, self.cites_file = content, cites

    def preprocess(self, num_partitions: int = 1, remap_ids: bool = True,
                   splits=(0.8, 0.1, 0.1), **kwargs):
        # cora.content rows: <paper_id> <1433 x 0/1 words> <class_name>
        rows = [line.split() for line in open(self.content_file)]
        paper_ids = np.array([int(r[0]) for r in rows], np.int64)
        features = np.array([[float(x) for x in r[1:-1]] for r in rows],
                            np.float32)
        labels = np.array([CLASS_NAMES.index(r[-1]) for r in rows], np.int32)
        # features/labels are ordered by row; key them by raw paper id so the
        # converter's remap can reorder them
        order = np.argsort(paper_ids)
        paper_ids, features, labels = paper_ids[order], features[order], labels[order]

        rng = np.random.default_rng(0)
        perm = rng.permutation(len(paper_ids))
        n_train = int(splits[0] * len(perm))
        n_valid = int(splits[1] * len(perm))
        node_splits = {
            "train": paper_ids[perm[:n_train]],
            "valid": paper_ids[perm[n_train:n_train + n_valid]],
            "test": paper_ids[perm[n_train + n_valid:]],
        }

        result = EdgeListConverter(
            output_dir=str(self.output_directory),
            train_edges=str(self.cites_file),
            delim="\t",
            src_column=0,
            dst_column=1,
            edge_type_column=None,
            remap_ids=remap_ids,
            known_node_ids=[paper_ids],
            num_partitions=num_partitions,
        ).convert()

        if remap_ids:
            # remap_node_data indexes feature rows by raw id: build dense
            # raw-indexed arrays first
            dense_feat = np.zeros((paper_ids.max() + 1, features.shape[1]),
                                  np.float32)
            dense_feat[paper_ids] = features
            dense_lab = np.zeros(paper_ids.max() + 1, np.int32)
            dense_lab[paper_ids] = labels
            node_splits, features, labels = remap_node_data(
                result.node_mapping, node_splits, dense_feat, dense_lab)

        out = str(self.output_directory)
        save_node_array(out, "features", features)
        save_node_array(out, "labels", labels)
        for s in ("train", "valid", "test"):
            save_node_array(out, f"{s}_nodes", node_splits[s].astype(np.int32))
        stats = result.stats
        stats.num_train = len(node_splits["train"])
        stats.num_valid = len(node_splits["valid"])
        stats.num_test = len(node_splits["test"])
        stats.feature_dim = features.shape[1]
        stats.num_classes = len(CLASS_NAMES)
        save_stats(out, stats)
        return result


def main():
    ds = Cora(Path(OUTPUT_DIR))
    if not (ds.output_directory / "dataset.yaml").exists():
        ds.download()
        ds.preprocess()

    stats = load_stats(OUTPUT_DIR)
    graph = build_device_graph(load_split(OUTPUT_DIR, "train", stats),
                               stats.num_nodes)
    features = load_features(OUTPUT_DIR, stats)
    labels = load_labels(OUTPUT_DIR, stats)

    model = Model(
        learning_task=NODE_CLASSIFICATION,
        encoder=EncoderConfig(stages=(
            (LayerConfig(layer_type="FEATURE", output_dim=stats.feature_dim),),
            (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE", bias=True,
                         input_dim=stats.feature_dim, output_dim=64,
                         activation="RELU"),),
            (LayerConfig(layer_type="GNN", gnn_type="GRAPH_SAGE", bias=True,
                         input_dim=64, output_dim=stats.num_classes),),
        )),
        decoder=None,
        loss_type="CROSS_ENTROPY",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.01),
    )

    trainer = NodeClassificationTrainer(
        model, graph, features, labels,
        load_node_split(OUTPUT_DIR, "train"),
        [NeighborSamplingConfig("UNIFORM", max_neighbors=10)] * 2,
        batch_size=500)
    evaluator = NodeClassificationEvaluator(
        trainer, load_node_split(OUTPUT_DIR, "test"))

    for epoch in range(NUM_EPOCHS):
        s = trainer.train_epoch()
        print(f"epoch {epoch + 1}: loss={s['loss']:.1f} "
              f"{s['nodes_per_sec']:.0f} nodes/s")
    print({k: round(float(v), 4)
           for k, v in evaluator.evaluate(trainer.state).items()})


if __name__ == "__main__":
    main()
