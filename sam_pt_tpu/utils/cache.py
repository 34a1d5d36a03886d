"""Persistent XLA compilation cache.

First compiles through the remote-attached TPU toolchain take 30 s – 10+ min
per program (the PIPS linking while-loop measured ~13 min); the persistent
cache makes every later process reuse the serialized executable (~0.1 s,
measured). Enabled by every entry point (bench, demo, eval mains,
__graft_entry__); a user-set JAX_COMPILATION_CACHE_DIR wins.
"""
from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Default: $JAX_COMPILATION_CACHE_DIR if set, else `<repo>/.jax_cache`.
    Safe to call multiple times and before/after jax backend init.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took real compile time (default threshold is
    # 1 s) — unless the user pinned their own threshold via env
    if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
