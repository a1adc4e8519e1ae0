"""Batch inference on a trained model: metrics + scores/ranks/labels export.

Parity with marius_predict (tools/marius_predict.py:520 run_predict): rebuild
the model from the saved model_dir, evaluate a chosen split (or custom input
edges), report metrics, and optionally write ranks/scores (LP) or labels (NC)
CSVs to the output directory.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

from marius_tpu.config.schema import MariusConfig, load_config
from marius_tpu.manager import marius_init
from marius_tpu.storage.dataset import load_split, load_stats
from marius_tpu.train.evaluator import LinkPredictionEvaluator


def run_predict(
    config: Any,
    output_dir: str,
    split: str = "test",
    metrics: Optional[List[str]] = None,
    save_scores: bool = False,
    save_ranks: bool = False,
    save_labels: bool = False,
    input_file: Optional[str] = None,
) -> Dict[str, float]:
    cfg = config if isinstance(config, MariusConfig) else load_config(config)
    rt = marius_init(cfg, train=False)
    os.makedirs(output_dir, exist_ok=True)

    if cfg.learning_task == "LINK_PREDICTION":
        if input_file is not None:
            stats = load_stats(cfg.storage.dataset.dataset_dir)
            ncols = 3 if stats.num_relations > 1 else 2
            edges = np.fromfile(input_file, np.int32).reshape(-1, ncols)
            tr = rt.trainer
            evaluator = LinkPredictionEvaluator(
                cfg.model, cfg.storage.dataset.num_nodes,
                max(cfg.storage.dataset.num_relations, 1), edges,
                all_edges=np.concatenate(
                    [load_split(cfg.storage.dataset.dataset_dir, s)
                     for s in ("train", "valid", "test")
                     if _split_exists(cfg.storage.dataset.dataset_dir, s)] + [edges]),
                batch_size=cfg.evaluation.batch_size,
                filtered=cfg.evaluation.negative_sampling.filtered,
                neg_config=cfg.evaluation.negative_sampling,
                graph=tr.graph, nbr_configs=cfg.eval_neighbor_sampling,
                features=tr.features)
        else:
            evaluator = rt.test_evaluator if split == "test" else rt.valid_evaluator
            assert evaluator is not None, f"no {split} edges in the dataset"

        results = evaluator.evaluate(rt.trainer.state)
        if save_ranks or save_scores:
            ranks, scores = evaluator.compute_all_ranks(rt.trainer.state)
            if save_ranks:
                np.savetxt(os.path.join(output_dir, "ranks.csv"),
                           ranks.T, fmt="%d", delimiter=",")
            if save_scores:
                np.savetxt(os.path.join(output_dir, "scores.csv"),
                           scores.T, fmt="%.6f", delimiter=",")
    else:
        evaluator = rt.test_evaluator if split == "test" else rt.valid_evaluator
        assert evaluator is not None, f"no {split} nodes in the dataset"
        results = evaluator.evaluate(rt.trainer.state)
        if save_labels and hasattr(evaluator, "predict_labels"):
            preds = evaluator.predict_labels(rt.trainer.state)
            np.savetxt(os.path.join(output_dir, "labels.csv"),
                       preds, fmt="%d", delimiter=",")

    with open(os.path.join(output_dir, "metrics.txt"), "w") as f:
        for k, v in results.items():
            f.write(f"{k}: {v}\n")
    return results


def _split_exists(dataset_dir: str, split: str) -> bool:
    from marius_tpu.storage.dataset import EDGE_FILES
    return os.path.exists(os.path.join(dataset_dir, EDGE_FILES[split]))
