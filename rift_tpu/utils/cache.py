"""Persistent XLA compilation cache.

The tunneled TPU backend compiles slowly (minutes for the fused world tick);
caching compiled executables on disk makes every process after the first
start in seconds. Call once before building any jitted program.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    path = os.path.abspath(cache_dir or DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
