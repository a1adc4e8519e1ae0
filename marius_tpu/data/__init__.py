from marius_tpu.data import batch, dataloader, graph, ordering, samplers  # noqa: F401
