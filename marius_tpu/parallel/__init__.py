from marius_tpu.parallel import embedding_table, mesh  # noqa: F401
