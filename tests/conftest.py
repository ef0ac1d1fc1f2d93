"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes, so this conftest is imported first.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# keep the CPU test cache separate from the TPU cache (the TPU-side AOT
# entries trigger noisy machine-feature warnings when loaded on CPU)
os.environ.setdefault("ORBSLAM3_TPU_JAX_CACHE", "/tmp/orbslam3_jax_cache_cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms to "axon,cpu"; pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
