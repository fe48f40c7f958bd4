"""Persistent XLA compilation cache.

Compiling the global-grid pipeline through a tunneled TPU backend takes
minutes; with the persistent cache, repeat runs of any driver start in
seconds.  Call :func:`enable` before building jitted functions (safe to
call any number of times, and after jax is initialized).
"""
from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache; returns the directory."""
    global _enabled
    import jax
    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/jax_comp"))
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return cache_dir
