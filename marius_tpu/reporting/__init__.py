from marius_tpu.reporting import metrics, reporters  # noqa: F401
