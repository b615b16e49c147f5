"""Persistent XLA/Mosaic compilation cache.

First compiles of the fused rollout kernels go through a remote compile
service and cost minutes per (task, K, T, solver) shape (BENCH.md:318).
Enabling jax's persistent compilation cache makes every process after the
first start in seconds for already-seen shapes — a parameter sweep over
(K, T) then pays each compile once per machine, not once per process.

Entry points that want the cache (bench.py, the CLI, __graft_entry__,
profiling scripts) call `enable_compilation_cache()` explicitly; library
imports stay side-effect free.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mpopis_tpu_jax_cache"
)


def enable_compilation_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (created if
    needed) and drop the min-compile-time/min-entry-size gates so even
    small-but-remote compiles are cached. Honors MPOPIS_JAX_CACHE; set
    MPOPIS_JAX_CACHE=0 to disable. Returns the cache dir ('' if disabled).
    """
    env = os.environ.get("MPOPIS_JAX_CACHE")
    if env == "0":
        return ""
    path = path or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
