"""Persistent XLA compile-cache activation that survives jax preloading.

Remote compiles through the TPU tunnel take minutes; the persistent cache makes warm
re-runs skip them entirely (probe-measured: 76.8 s cold -> 0.5 s warm for one small
jit on this backend). The subtlety this module exists for: the environment's
sitecustomize imports jax BEFORE user code runs, so `jax_compilation_cache_dir`'s
env-var default (`JAX_COMPILATION_CACHE_DIR`) has already been read — setting the env
var in-process is a silent no-op and the cache stays "disabled/not initialized"
(exactly the round-2 empty-`.jax_cache` symptom). `jax.config.update` after import is
the only reliable switch, so every entry point calls this helper instead of touching
the env var.
"""
from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(path: str | os.PathLike | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (created if missing).

    Default: the JAX_COMPILATION_CACHE_DIR env var, else `.jax_cache/` next to the
    repo root. Returns the activated path. Safe to call multiple times.
    """
    import jax

    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    path = os.fspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # remote compiles are worth caching no matter how quick the client-side wait is
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
