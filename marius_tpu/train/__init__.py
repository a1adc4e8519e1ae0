from marius_tpu.train import evaluator, graph_encoder, nc, trainer  # noqa: F401
from marius_tpu.train.evaluator import LinkPredictionEvaluator  # noqa: F401
from marius_tpu.train.nc import (  # noqa: F401
    NodeClassificationEvaluator,
    NodeClassificationTrainer,
)
from marius_tpu.train.trainer import LinkPredictionTrainer, TrainState  # noqa: F401
