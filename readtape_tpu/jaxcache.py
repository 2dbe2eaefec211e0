"""Persistent XLA compilation cache.

The TPU environments this framework targets can have very slow cold
compilation (remote compile services, cold toolchains). Compiled executables
are content-addressed, so caching them on disk makes compilation a one-time
cost across processes and runs.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str = None) -> str:
    global _enabled
    path = path or os.environ.get("READTAPE_JAX_CACHE", DEFAULT_DIR)
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return path
    _enabled = True
    return path
