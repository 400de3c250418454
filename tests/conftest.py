"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference never tests multi-device paths (SURVEY.md §4); we validate
the pjit data/model-parallel paths on CPU via
``xla_force_host_platform_device_count`` — this must be set before jax
initialises a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers/initialises a TPU backend before
# conftest runs, so the env var alone is not enough — force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
