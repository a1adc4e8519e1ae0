from marius_tpu.train import evaluator, trainer  # noqa: F401
