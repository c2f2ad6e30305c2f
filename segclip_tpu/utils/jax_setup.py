"""Process-level JAX configuration shared by all entry points."""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (first compiles of the big
    train/eval graphs take minutes on tunneled backends; the cache makes
    every later process start warm)."""
    import jax
    cache = cache_dir or os.environ.get("SEGCLIP_JAX_CACHE",
                                        "/tmp/segclip_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
