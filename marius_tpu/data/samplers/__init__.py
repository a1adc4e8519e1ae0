from marius_tpu.data.samplers import negative, neighbor  # noqa: F401
