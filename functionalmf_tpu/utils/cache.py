"""Persistent XLA compilation cache (VERDICT round-4 item 6).

The constrained sweep at GDELT shape takes ~35s to compile and the
roofline shape ~90s; every bench script, app, and example pays it again on
each process start. jax ships a persistent compilation cache keyed on the
HLO — enabling it makes the second process start of any of these ~free.

The reference has no equivalent (it compiles nothing); this is part of the
TPU-native runtime story (SURVEY.md §5 tracing/profiling & config axis).

Usage (bench/apps call this before the first jit execution)::

    from functionalmf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()          # ~/.cache/functionalmf_tpu/xla
    enable_compilation_cache("/tmp/x")  # explicit dir

Env override: FMF_COMPILATION_CACHE_DIR sets the directory,
FMF_COMPILATION_CACHE=0 disables (e.g. for compile-time measurements).
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "functionalmf_tpu", "xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at `cache_dir` and lower
    the min-compile-time/entry-size gates so the many small sweep
    executables (sub-second CPU test compiles included) are cached too.
    Returns the directory in effect, or None when disabled via env."""
    if os.environ.get("FMF_COMPILATION_CACHE", "1") in ("0", "false", ""):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("FMF_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
