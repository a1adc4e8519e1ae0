from marius_tpu.nn.decoders import edge, node  # noqa: F401
