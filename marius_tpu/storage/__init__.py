from marius_tpu.storage import checkpoint, dataset, flat_file  # noqa: F401
