"""Generate training YAML configs from dataset stats + flags.

Parity with marius_config_generator (tools/marius_config_generator.py, 310
LoC): given a preprocessed dataset directory, emit a complete config for a
chosen model/task with sensible defaults.
"""

from __future__ import annotations

import os
from typing import Optional

import yaml

from marius_tpu.storage.dataset import load_stats

LP_DECODERS = ("DISTMULT", "COMPLEX", "TRANSE")


def generate_config(
    dataset_dir: str,
    output_path: Optional[str] = None,
    task: str = "LINK_PREDICTION",
    model: str = "DISTMULT",
    embedding_dim: int = 50,
    num_epochs: int = 10,
    batch_size: int = 1000,
    learning_rate: float = 0.1,
    num_partitions: int = 1,
    buffer_capacity: int = 8,
) -> dict:
    stats = load_stats(dataset_dir)
    task = task.upper()
    model = model.upper()

    if task == "LINK_PREDICTION":
        if model in LP_DECODERS:
            encoder = {"layers": [[{"type": "EMBEDDING", "output_dim": embedding_dim}]]}
            decoder = {"type": model, "options": {"input_dim": embedding_dim}}
        else:  # GNN link prediction
            encoder = {
                "layers": [
                    [{"type": "EMBEDDING", "output_dim": embedding_dim}],
                    [{"type": "GNN", "input_dim": embedding_dim,
                      "output_dim": embedding_dim,
                      "options": {"type": model, "aggregator": "MEAN"}}],
                ],
                "train_neighbor_sampling": [
                    {"type": "UNIFORM", "options": {"max_neighbors": 10}}],
            }
            decoder = {"type": "DISTMULT", "options": {"input_dim": embedding_dim}}
        cfg_model = {
            "learning_task": task,
            "encoder": encoder,
            "decoder": decoder,
            "loss": {"type": "SOFTMAX_CE", "options": {"reduction": "SUM"}},
            "dense_optimizer": {"type": "ADAM",
                                "options": {"learning_rate": learning_rate}},
            "sparse_optimizer": {"type": "ADAGRAD",
                                 "options": {"learning_rate": learning_rate}},
        }
        training = {
            "batch_size": batch_size,
            "negative_sampling": {"num_chunks": 10, "negatives_per_positive": 500,
                                  "degree_fraction": 0.0, "filtered": False},
            "num_epochs": num_epochs,
        }
        evaluation = {"batch_size": batch_size,
                      "negative_sampling": {"filtered": True}}
    else:  # NODE_CLASSIFICATION
        feat_dim = max(stats.feature_dim, 1)
        cfg_model = {
            "learning_task": task,
            "encoder": {
                "layers": [
                    [{"type": "FEATURE", "output_dim": feat_dim}],
                    [{"type": "GNN", "input_dim": feat_dim, "output_dim": embedding_dim,
                      "options": {"type": model if model not in LP_DECODERS else "GRAPH_SAGE",
                                  "aggregator": "MEAN"}, "activation": "RELU"}],
                    [{"type": "GNN", "input_dim": embedding_dim,
                      "output_dim": max(stats.num_classes, 2),
                      "options": {"type": model if model not in LP_DECODERS else "GRAPH_SAGE",
                                  "aggregator": "MEAN"}}],
                ],
                "train_neighbor_sampling": [
                    {"type": "UNIFORM", "options": {"max_neighbors": 10}},
                    {"type": "UNIFORM", "options": {"max_neighbors": 10}}],
            },
            "loss": {"type": "CROSS_ENTROPY", "options": {"reduction": "SUM"}},
            "dense_optimizer": {"type": "ADAM",
                                "options": {"learning_rate": learning_rate / 10}},
        }
        training = {"batch_size": batch_size, "num_epochs": num_epochs}
        evaluation = {"batch_size": batch_size}

    storage: dict = {"device_type": "tpu",
                     "dataset": {"dataset_dir": os.path.abspath(dataset_dir)}}
    if num_partitions > 1:
        storage["embeddings"] = {
            "type": "PARTITION_BUFFER",
            "options": {"num_partitions": num_partitions,
                        "buffer_capacity": buffer_capacity}}

    raw = {"model": cfg_model, "storage": storage,
           "training": training, "evaluation": evaluation}
    if output_path:
        with open(output_path, "w") as f:
            yaml.safe_dump(raw, f, sort_keys=False)
    return raw
