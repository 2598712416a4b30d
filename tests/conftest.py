"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware.

Note: the environment's sitecustomize registers the axon TPU backend and
pins JAX_PLATFORMS=axon for every interpreter; `jax.config.update` after
import is the override that actually sticks.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
