"""Persistent-XLA-compile-cache helper (SURVEY.md §5.7 usability).

Large-N particle programs pay real XLA compile time: the first compile of an
N=1e6 `batch_filter` scan on a TPU takes ~5 minutes, and every SMC2
particle-doubling (a genuine shape change) recompiles the fused rejuvenation
stack (~50 s measured). JAX's persistent compilation cache makes each of
those a once-per-shape cost across *processes*: enable it at program start
and repeat runs (or post-doubling re-runs) load the compiled executable from
disk instead of recompiling.

This is the same wiring ``bench.py`` and the test suite use internally —
exposed here so library users don't have to know the three config knobs.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "pyfilter_tpu_xla")


def enable_compile_cache(
    path: str = None, min_compile_time_secs: float = 1.0
) -> str | None:
    """Enable JAX's persistent compilation cache at ``path``.

    Call once, BEFORE the first jitted call (already-compiled programs are
    not retroactively cached). Programs whose compile took at least
    ``min_compile_time_secs`` are persisted; tiny programs stay in-memory
    only. Returns the cache directory, or None when the backend plugin does
    not support persistent caching (the call is then a no-op, never an
    error).
    """
    path = path or DEFAULT_CACHE_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
        )
        return path
    except Exception:  # cache support varies by backend plugin
        return None
