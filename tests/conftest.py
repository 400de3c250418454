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

# Persistent compile cache: without it every suite run recompiles all CPU
# programs from scratch (~13 min for the fast lane on the 1-core host;
# warm cache cuts the bulk of it).  Platform is part of the cache key, so
# sharing the dir with TPU runs is safe.
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        os.path.expanduser("~/.cache/jax_comp"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
