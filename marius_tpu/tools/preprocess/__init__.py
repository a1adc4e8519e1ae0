from marius_tpu.tools.preprocess.generate import (  # noqa: F401
    generate_random_dataset_lp,
    generate_random_dataset_nc,
)
