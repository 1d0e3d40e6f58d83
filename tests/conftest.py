"""Test environment: CPU backend with 8 virtual devices, float64 available.

Mirrors the reference's testing model (SURVEY.md section 4): the same code
runs serially or distributed; multi-chip sharding is validated on a
virtual CPU mesh without TPU hardware.
"""

import os

# This image pins JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize; tests
# run on a virtual 8-device CPU mesh instead, so override through jax.config
# (which wins over the env var).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
