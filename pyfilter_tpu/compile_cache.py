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

import hashlib
import os
import platform

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "pyfilter_tpu_xla")


def host_fingerprint() -> str:
    """A short stable hash of this host's CPU micro-architecture features.

    XLA's CPU backend AOT-compiles against the features of the machine that
    ran the compile (AVX-512, AMX, ...). JAX's persistent-cache key does NOT
    include those features, so a cache directory shared between
    different-CPU hosts silently loads mismatched executables — XLA warns
    ("... is not supported on the host machine") and float results change
    run-to-run. Keying the cache directory by this fingerprint makes each
    host population use its own cache and removes the hazard.

    The fingerprint covers the jax version (cache format), the machine
    architecture, and (on Linux) processor 0's flag set AND model identity
    (vendor / family / model / stepping / model name). The model identity
    matters even when the flag sets match: XLA's CPU tuning pseudo-features
    (``prefer-no-scatter`` / ``prefer-no-gather``) key off the detected CPU
    MODEL, so two hosts with identical flags can still write mutually
    poisonous AOT entries (observed in this project's CI: a mid-session VM
    migration reproduced the mismatch warnings — and a spurious float
    divergence — from a cache this same session had written).
    """
    parts = [jax.__version__, platform.machine()]
    try:
        wanted = (
            "flags",
            "Features",
            "vendor_id",
            "cpu family",
            "model",
            "model name",
            "stepping",
        )
        seen = {}
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                key = line.split(":", 1)[0].strip()
                if key in wanted and key not in seen:
                    seen[key] = " ".join(sorted(line.split(":", 1)[1].split()))
                if key == "" and seen:  # end of processor 0's block
                    break
        parts.extend(f"{k}={seen[k]}" for k in sorted(seen))
    except OSError:
        parts.append(platform.processor() or "unknown-cpu")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(
    path: str = None,
    min_compile_time_secs: float = 1.0,
    per_host: bool = True,
) -> str | None:
    """Enable JAX's persistent compilation cache under ``path``.

    Call once, BEFORE the first jitted call (already-compiled programs are
    not retroactively cached). Programs whose compile took at least
    ``min_compile_time_secs`` are persisted; tiny programs stay in-memory
    only.

    With ``per_host=True`` (the default) the cache actually lives in
    ``path/<host_fingerprint()>`` so that hosts with different CPU features
    never load each other's AOT executables (see :func:`host_fingerprint`
    for why sharing them corrupts float results). Pass ``per_host=False``
    only when every machine touching ``path`` is feature-identical.

    Returns the effective cache directory, or None when the backend plugin
    does not support persistent caching (the call is then a no-op, never an
    error).
    """
    path = path or DEFAULT_CACHE_DIR
    if per_host:
        path = os.path.join(path, host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
        )
        return path
    except Exception:  # cache support varies by backend plugin
        return None
