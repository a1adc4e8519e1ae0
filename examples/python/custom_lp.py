"""Custom link-prediction dataset + programmatic model.

The marius_tpu equivalent of the reference's examples/python/custom_lp.py:
define a dataset class (download + preprocess with EdgeListConverter), build
a DistMult model through the Python API, train, and evaluate filtered MRR.

Run: python custom_lp.py [output_dir]
"""

import sys
from pathlib import Path

import numpy as np

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.storage.dataset import load_split, load_stats
from marius_tpu.tools.preprocess.converter import EdgeListConverter
from marius_tpu.tools.preprocess.datasets import LinkPredictionDataset
from marius_tpu.tools.preprocess.utils import download_url, extract_file
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.trainer import LinkPredictionTrainer

OUTPUT_DIR = sys.argv[1] if len(sys.argv) > 1 else "datasets/custom_lp/"
EMBEDDING_DIM = 50
NUM_EPOCHS = 10


class MyDataset(LinkPredictionDataset):
    """Edge CSV from a URL -> train/valid/test splits (custom_lp.py:13-49)."""

    dataset_name = "my_dataset"
    dataset_url = "http://snap.stanford.edu/ogb/data/nodeproppred/arxiv.zip"

    def download(self, overwrite: bool = False) -> None:
        self.input_train_edges_file = self.output_directory / "edge.csv"
        if not self.input_train_edges_file.exists():
            archive = download_url(self.dataset_url, self.output_directory,
                                   overwrite)
            extract_file(archive, remove_input=False)
            extract_file(self.output_directory / "arxiv" / "raw" / "edge.csv.gz")
            (self.output_directory / "arxiv" / "raw" / "edge.csv").rename(
                self.input_train_edges_file)

    def preprocess(self, num_partitions: int = 1, remap_ids: bool = True,
                   splits=(0.8, 0.1, 0.1), **kwargs):
        converter = EdgeListConverter(
            output_dir=str(self.output_directory),
            train_edges=str(self.input_train_edges_file),
            delim=",",
            src_column=0,
            dst_column=1,
            edge_type_column=None,      # the CSV has no relation column
            splits=list(splits),
            remap_ids=remap_ids,
            num_partitions=num_partitions,
        )
        return converter.convert()


def main():
    ds = MyDataset(Path(OUTPUT_DIR))
    if not (ds.output_directory / "dataset.yaml").exists():
        ds.download()
        ds.preprocess()

    stats = load_stats(OUTPUT_DIR)
    train_edges = load_split(OUTPUT_DIR, "train", stats)
    valid_edges = load_split(OUTPUT_DIR, "valid", stats)
    test_edges = load_split(OUTPUT_DIR, "test", stats)

    encoder = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=EMBEDDING_DIM),),))
    model = Model(
        learning_task=LINK_PREDICTION,
        encoder=encoder,
        decoder=EdgeDecoder("DISTMULT", max(stats.num_relations, 1),
                            EMBEDDING_DIM, use_inverse_relations=True),
        loss_type="SOFTMAX_CE",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.1),
        sparse_lr=0.1,
    )

    trainer = LinkPredictionTrainer(
        model, stats.num_nodes, max(stats.num_relations, 1), train_edges,
        NegativeSamplingConfig(num_chunks=10, negatives_per_positive=500),
        batch_size=1000)

    all_edges = np.concatenate([train_edges, valid_edges, test_edges])
    evaluator = LinkPredictionEvaluator(
        model, stats.num_nodes, max(stats.num_relations, 1), test_edges,
        all_edges=all_edges, batch_size=1000, filtered=True)

    for epoch in range(NUM_EPOCHS):
        s = trainer.train_epoch()
        print(f"epoch {epoch + 1}: loss={s['loss']:.1f} "
              f"{s['edges_per_sec']:.0f} edges/s")
    print({k: round(float(v), 4)
           for k, v in evaluator.evaluate(trainer.state).items()})


if __name__ == "__main__":
    main()
