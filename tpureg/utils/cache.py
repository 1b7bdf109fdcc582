"""Persistent XLA compilation cache for the CLIs.

Every CLI invocation otherwise pays a fresh 1-4 minute compile of the model
graph (verify finding). One call at driver startup makes repeat invocations
near-instant. Cache location: $TPUREG_CACHE_DIR or ~/.cache/tpureg-xla.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:  # already configured (e.g. by the test conftest) — keep it
        return current
    path = path or os.environ.get(
        "TPUREG_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpureg-xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
