"""FB15K-237 DistMult link prediction over a TPU device mesh.

The marius_tpu twin of the reference's examples/python/fb15k_237_gpu.py —
except the scale-out is declarative: the same trainer takes a
``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism; dense grads
psum over ICI, the NCCL all_reduce analogue) and a ``node`` axis (embedding
table rows sharded across chips' HBM). ``sharding_mode="gspmd"`` lets XLA
infer the collectives from sharding constraints; ``"explicit"`` routes
through the hand-written shard_map step (parallel/collectives.py).

Multi-HOST: launch this same script once per host with
``marius_tpu.parallel.multihost.initialize(coordinator, num_processes,
process_id)`` before any other JAX call — the mesh then spans all hosts'
devices and nothing else changes (see tests/test_multihost.py).

Run `marius_preprocess --dataset fb15k_237 --output_directory
datasets/fb15k_237/` first, or point DATASET_DIR at a preprocessed copy.
"""

import sys

import numpy as np

from marius_tpu.data.samplers.negative import NegativeSamplingConfig
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig
from marius_tpu.nn.layers import LayerConfig
from marius_tpu.nn.model import LINK_PREDICTION, Model
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.parallel.mesh import make_mesh
from marius_tpu.storage.dataset import load_split, load_stats
from marius_tpu.train.evaluator import LinkPredictionEvaluator
from marius_tpu.train.trainer import LinkPredictionTrainer

DATASET_DIR = sys.argv[1] if len(sys.argv) > 1 else "datasets/fb15k_237/"
EMBEDDING_DIM = 50
NUM_EPOCHS = 10


def main():
    import jax

    stats = load_stats(DATASET_DIR)
    train_edges = load_split(DATASET_DIR, "train", stats)
    valid_edges = load_split(DATASET_DIR, "valid", stats)
    test_edges = load_split(DATASET_DIR, "test", stats)

    # all local devices: batch over `data`, table rows over `node`
    n_dev = len(jax.devices())
    num_node = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh(num_data=n_dev // num_node, num_node=num_node)
    print(f"mesh: {dict(mesh.shape)}")

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
        batch_size=1000, mesh=mesh, sharding_mode="gspmd")

    all_edges = np.concatenate([train_edges, valid_edges, test_edges])
    evaluator = LinkPredictionEvaluator(
        model, stats.num_nodes, stats.num_relations, test_edges,
        all_edges=all_edges, batch_size=1000, filtered=True)

    for epoch in range(NUM_EPOCHS):
        s = trainer.train_epoch()
        print(f"epoch {epoch + 1}: loss={s['loss']:.1f} "
              f"({s['edges_per_sec']:.0f} edges/s)")

    metrics = evaluator.evaluate(trainer.state)
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
