from marius_tpu.ops import edge_keys, segment, unique  # noqa: F401
