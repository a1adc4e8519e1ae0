"""Custom layer / decoder / loss registration — the marius_tpu equivalent of
subclassing the reference's Python-trampolined Layer/decoder/loss classes
(src/cpp/python_bindings/nn/layers/layer_wrap.cpp:10-22) and using them from
a YAML config.

A custom component is a pair of pure functions (init, forward) registered
under a name; after registration the name is valid anywhere the built-in
names are — including YAML configs — with no edits to the package.

Run:  python examples/python/custom_layer.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.config.schema import load_config
from marius_tpu.manager import marius_train
from marius_tpu.nn import registry
from marius_tpu.nn.initialization import initialize_tensor
from marius_tpu.ops.segment import masked_mean
from marius_tpu.tools.preprocess import generate_random_dataset_lp


# -- 1. a custom GNN layer: mean-of-neighbors residual ----------------------

def maxres_init(key, cfg, dtype):
    return {"w": initialize_tensor(key, cfg.init,
                                   (cfg.input_dim, cfg.output_dim), dtype)}


def maxres_forward(cfg, params, x, adj, **ctx):
    """(self + mean over in-neighbors) @ w — any pure JAX function of the
    padded adjacency works; ctx carries degrees/node_ids_outer/train/
    dropout_key for layers that need them."""
    nbr = masked_mean(x[adj.in_nbr_idx], adj.in_mask)
    return (x[adj.self_idx] + nbr) @ params["w"]


registry.register_gnn_layer("MEAN_RESIDUAL", maxres_init, maxres_forward)


# -- 2. a custom edge decoder: scaled DistMult ------------------------------

registry.register_relation_op("SCALED_HADAMARD",
                              lambda embs, rels: embs * rels * 0.5
                              if rels is not None else embs)
registry.register_edge_decoder("SCALED_DISTMULT", "DOT", "SCALED_HADAMARD",
                               relation_init="ones")


# -- 3. a custom loss: squared softmax-CE -----------------------------------

def sq_softmax_ce(pos, neg, *, reduction="MEAN", mask=None, neg_mask=None):
    from marius_tpu.nn.losses import softmax_ce
    base = softmax_ce(pos, neg, reduction=reduction, mask=mask,
                      neg_mask=neg_mask)
    return base + 0.01 * base ** 2


registry.register_loss("SQUARED_SOFTMAX_CE", sq_softmax_ce)


CONFIG = {
    "model": {
        "learning_task": "LINK_PREDICTION",
        "encoder": {
            "layers": [
                [{"type": "EMBEDDING", "output_dim": 16}],
                [{"type": "GNN", "input_dim": 16, "output_dim": 16,
                  "options": {"type": "MEAN_RESIDUAL"}}],
            ],
            "train_neighbor_sampling": [
                {"type": "UNIFORM", "options": {"max_neighbors": 4}}],
        },
        "decoder": {"type": "SCALED_DISTMULT", "options": {"input_dim": 16}},
        "loss": {"type": "SQUARED_SOFTMAX_CE", "options": {"reduction": "SUM"}},
        "dense_optimizer": {"type": "ADAM", "options": {"learning_rate": 0.1}},
        "sparse_optimizer": {"type": "ADAGRAD", "options": {"learning_rate": 0.1}},
    },
    "storage": {"dataset": {"dataset_dir": ""}, "save_model": False},
    "training": {
        "batch_size": 100,
        "negative_sampling": {"num_chunks": 4, "negatives_per_positive": 16},
        "num_epochs": 3,
    },
    "evaluation": {"batch_size": 100, "negative_sampling": {"filtered": True}},
}


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        generate_random_dataset_lp(d, num_nodes=80, num_edges=800,
                                   num_relations=5)
        CONFIG["storage"]["dataset"]["dataset_dir"] = d
        result = marius_train(load_config(CONFIG))
    print("losses:", [round(e["loss"], 1) for e in result["epochs"]])
    print("test MRR:", round(result["test"]["mrr"], 4))


if __name__ == "__main__":
    main()
