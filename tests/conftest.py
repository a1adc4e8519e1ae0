"""Test configuration: run on CPU with 8 virtual devices so sharding paths are
exercised without TPU hardware (SURVEY §4: multi-device behavior is tested by
simulation, which the reference lacks entirely).

The axon TPU plugin (sitecustomize) force-registers the TPU backend regardless
of JAX_PLATFORMS in the environment, so we override via jax.config, which wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
