"""Persistent XLA compilation cache (shared by the CLIs and bench)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax
    cache = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
