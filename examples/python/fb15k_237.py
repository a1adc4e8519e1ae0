"""FB15K-237 DistMult link prediction via the Python API.

The marius_tpu equivalent of the reference's examples/python/fb15k_237.py:
build the model programmatically, train with the compiled-epoch trainer, and
evaluate filtered MRR. Run `marius_preprocess --dataset fb15k_237
--output_directory datasets/fb15k_237/` first (needs internet), or point
DATASET_DIR at an existing preprocessed copy.
"""

import sys

import numpy as np

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.storage.dataset import load_split, load_stats
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.trainer import LinkPredictionTrainer

DATASET_DIR = sys.argv[1] if len(sys.argv) > 1 else "datasets/fb15k_237/"
EMBEDDING_DIM = 50
NUM_EPOCHS = 10


def main():
    stats = load_stats(DATASET_DIR)
    train_edges = load_split(DATASET_DIR, "train", stats)
    valid_edges = load_split(DATASET_DIR, "valid", stats)
    test_edges = load_split(DATASET_DIR, "test", stats)

    encoder = EncoderConfig(stages=(
        (LayerConfig(layer_type="EMBEDDING", output_dim=EMBEDDING_DIM),),))
    model = Model(
        learning_task=LINK_PREDICTION,
        encoder=encoder,
        decoder=EdgeDecoder("DISTMULT", stats.num_relations, EMBEDDING_DIM,
                            use_inverse_relations=True),
        loss_type="SOFTMAX_CE",
        loss_reduction="SUM",
        dense_optimizer=OptimizerConfig("ADAM", learning_rate=0.1),
        sparse_lr=0.1,
    )

    trainer = LinkPredictionTrainer(
        model, stats.num_nodes, stats.num_relations, train_edges,
        NegativeSamplingConfig(num_chunks=10, negatives_per_positive=500),
        batch_size=1000)

    all_edges = np.concatenate([train_edges, valid_edges, test_edges])
    evaluator = LinkPredictionEvaluator(
        model, stats.num_nodes, stats.num_relations, test_edges,
        all_edges=all_edges, batch_size=1000, filtered=True)

    for epoch in range(NUM_EPOCHS):
        s = trainer.train_epoch()
        print(f"epoch {epoch + 1}: loss={s['loss']:.1f} "
              f"{s['edges_per_sec']:.0f} edges/s")
    results = evaluator.evaluate(trainer.state)
    print({k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
