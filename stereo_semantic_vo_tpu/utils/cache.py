"""Persistent XLA compilation cache.

The full tracking step is a large XLA program (~2-4 min first compile on a
TPU backend).  Enabling JAX's persistent cache makes every subsequent
process start in seconds — essential for the CLI, benchmarks, and tests that
respawn interpreters.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(repo_root, ".jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
