"""Persistent XLA compilation cache setup.

Compiles through the axon remote-compile tunnel cost minutes per program
(measured: 155-400s for a single solve program); the persistent cache cuts
repeat runs to seconds (measured: 3.6s). Every entry point (bench, example
CLIs, tests, driver hooks) calls `enable_compile_cache()` first.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax at a persistent on-disk compilation cache (idempotent)."""
    import jax

    path = path or os.environ.get("MULTIGRIDCMT_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
