"""Persistent XLA compilation cache.

First compiles of the big programs cost 15–300 s on TPU; enabling JAX's
on-disk compilation cache makes every later process start (resume, bench,
inference) hit the cache instead. Called by the CLIs and bench.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compile cache (idempotent). Returns the dir."""
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "ntts_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
