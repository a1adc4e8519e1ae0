from marius_tpu.nn import initialization, losses, optimizers  # noqa: F401
from marius_tpu.nn import decoders, layers, encoder, model  # noqa: F401
from marius_tpu.nn import registry  # noqa: F401  (custom-component registry)
