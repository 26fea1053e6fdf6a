"""Test configuration: force CPU with 8 virtual devices BEFORE importing jax.

This lets sharding/mesh tests run without TPU hardware, per the driver's
multi-chip dry-run contract.
"""

import os

# NOTE: a sitecustomize (PYTHONPATH) pre-sets JAX_PLATFORMS=axon; override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Keep matmuls in full f32 for numerical golden tests.
jax.config.update("jax_default_matmul_precision", "highest")
