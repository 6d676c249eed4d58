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

**Classifying the AOT feature-mismatch warning.** On EVERY persistent-cache
reload — same host included — XLA:CPU logs an ERROR-level wall of text from
``cpu_aot_loader.cc`` ("Target machine feature +prefer-no-scatter is not
supported on the host machine ... could lead to execution errors such as
SIGILL"). Decision rule, validated in round 4's poisoning post-mortem:

- *benign* (the overwhelmingly common case): the compile/host feature lists
  differ ONLY in the ``+prefer-no-scatter``/``+prefer-no-gather``
  pseudo-features — those are LLVM *tuning* hints keyed off the detected CPU
  model, not ISA bits, and XLA never re-emits them into the host's
  feature-detection list. Same-host reloads always produce this warning.
- *poison*: float results CHANGE run-to-run (the round-4 symptom: one NaN
  lane appearing with a foreign cache warm). The probe-based fingerprint
  (:func:`xla_cpu_target_signature`) plus :func:`purge_foreign_entries`
  prevent this class; if result-changing behavior reappears, something
  bypassed :func:`enable_compile_cache` — fix the caller, do not filter the
  log.

The log line comes from native code before Python can intercept it; the only
blanket silencer (``TF_CPP_MIN_LOG_LEVEL=3``) would also hide real native
errors, so this module deliberately does NOT set it.
"""

from __future__ import annotations

import glob
import hashlib
import os
import platform
import re

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "pyfilter_tpu_xla")

# The target config XLA's CPU backend embeds in every persisted executable:
# an LLVM feature list like "+64bit,+adx,...,-zu", preceded (in the proto)
# by the target triple and the LLVM-detected CPU name.
_FEATURE_RUN = re.compile(rb"[+-][0-9A-Za-z_.-]+(?:,[+-][0-9A-Za-z_.-]+){8,}")


def _decompress_cache_blob(raw: bytes) -> bytes:
    if raw[:4] == b"\x28\xb5\x2f\xfd":  # zstd frame magic
        try:
            import zstandard

            return zstandard.ZstdDecompressor().decompressobj().decompress(raw)
        except Exception:
            return raw
    return raw


def _extract_target_signature(blob: bytes) -> str | None:
    """``"<cpu-name>|<feature-list>"`` from a persisted CPU executable."""
    m = _FEATURE_RUN.search(blob)
    if m is None:
        return None
    # the CPU name sits just before the feature list in the target-config
    # proto (…\x12\x0demeraldrapids\x1a…); take the last name-like token
    # that is not the target triple
    pre = blob[max(0, m.start() - 96) : m.start()]
    tokens = [
        t for t in re.findall(rb"[a-z0-9][a-z0-9_.-]{3,48}", pre) if b"-unknown-" not in t
    ]
    name = tokens[-1].decode() if tokens else ""
    return name + "|" + m.group(0).decode()


def xla_cpu_target_signature() -> str | None:
    """The CPU name + feature string XLA's CPU backend ACTUALLY compiles
    against on this host, read back from a tiny probe executable.

    This is the ground truth that ``/proc/cpuinfo`` cannot provide: on
    live-migration VM pools the hypervisor normalizes CPUID, so two
    different micro-architectures (observed: ``sapphirerapids`` with the
    ``prefer-no-scatter``/``prefer-no-gather`` tuning pseudo-features vs
    ``emeraldrapids`` without) expose IDENTICAL cpuinfo — flags, family,
    model, stepping, model name, all of it — yet write mutually poisonous
    AOT cache entries. The only reliable signature is the one XLA itself
    embeds in the executables, so: compile a trivial program into a
    throwaway cache directory and extract the embedded target config.

    Returns None when the probe cannot run (no CPU backend, no persisted
    entry, unknown blob format) — callers fall back to cpuinfo. The probe
    runs once per process (memoized: one ~50 ms CPU compile).
    """
    global _PROBED_SIGNATURE
    if _PROBED_SIGNATURE is not _UNPROBED:
        return _PROBED_SIGNATURE
    _PROBED_SIGNATURE = _probe_target_signature()
    return _PROBED_SIGNATURE


_UNPROBED = object()
_PROBED_SIGNATURE = _UNPROBED


def _reset_jax_cache_object() -> None:
    """Drop JAX's lazily-initialized persistent-cache singleton so the next
    compile re-reads ``jax_compilation_cache_dir``. The singleton is created
    at most once per process (jax._src.compilation_cache._get_cache), so a
    config update alone leaves compiles writing to the OLD directory —
    for the probe below, a deleted tempdir."""
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        pass


def _probe_target_signature() -> str | None:
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="pyfilter_xla_probe_")
    try:
        prev_dir = jax.config.jax_compilation_cache_dir
        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update("jax_compilation_cache_dir", tmp)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _reset_jax_cache_object()
        try:
            import jax.numpy as jnp

            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
                jax.jit(lambda a: (jnp.sin(a) @ a.T).sum())(x).block_until_ready()
        finally:
            jax.config.update("jax_compilation_cache_dir", prev_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min
            )
            _reset_jax_cache_object()
        for fn in sorted(glob.glob(os.path.join(tmp, "*"))):
            with open(fn, "rb") as fh:
                sig = _extract_target_signature(_decompress_cache_blob(fh.read()))
            if sig is not None:
                return sig
        return None
    except Exception:
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def host_fingerprint() -> str:
    """A short stable hash of the CPU target XLA compiles against here.

    XLA's CPU backend AOT-compiles against the features of the machine that
    ran the compile (AVX-512, AMX, ...). JAX's persistent-cache key does NOT
    include those features, so a cache directory shared between
    different-CPU hosts silently loads mismatched executables — XLA warns
    ("... is not supported on the host machine") and float results change
    run-to-run. Keying the cache directory by this fingerprint makes each
    host population use its own cache and removes the hazard.

    The fingerprint covers the jax version (cache format), the machine
    architecture, the PROBED XLA target signature (LLVM-detected CPU name +
    feature list — see :func:`xla_cpu_target_signature`; this is the part
    that actually distinguishes hosts on live-migration VM pools, where
    cpuinfo is normalized to the cluster baseline and lies), and (on Linux)
    processor 0's cpuinfo flag set and model identity as a fallback for
    environments where the probe cannot run.
    """
    parts = [jax.__version__, platform.machine()]
    probed = xla_cpu_target_signature()
    if probed is not None:
        parts.append(probed)
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


def purge_foreign_entries(cache_dir: str, signature: str | None = None) -> int:
    """Delete persisted CPU executables whose embedded target signature
    differs from this host's. Returns the number of entries removed.

    Per-host cache directories (see :func:`enable_compile_cache`) stop
    DIFFERENT hosts from sharing entries, but a live VM migration can move
    this very process to a different micro-architecture mid-run — after the
    fingerprint was computed — leaving foreign AOT entries in the now-local
    directory (observed: one poisoned entry silently flipping a float lane
    to NaN in a downstream test). Running this at program start makes the
    directory self-healing: every entry's EMBEDDED target config (the same
    bytes XLA checks at load) is compared against the probed host signature,
    and mismatches are removed so they recompile natively.

    Entries without a recognizable signature (non-CPU backends, tiny
    non-AOT programs, future format changes) are left alone — absence of
    evidence is not treated as poison.
    """
    sig = signature if signature is not None else xla_cpu_target_signature()
    if sig is None:
        return 0
    removed = 0
    for fn in glob.glob(os.path.join(cache_dir, "*-cache")):
        try:
            with open(fn, "rb") as fh:
                entry_sig = _extract_target_signature(_decompress_cache_blob(fh.read()))
            if entry_sig is not None and entry_sig != sig:
                os.remove(fn)
                removed += 1
        except OSError:
            continue
    return removed


def enable_compile_cache(
    path: str = None,
    min_compile_time_secs: float = 1.0,
    per_host: bool = True,
    purge_foreign: bool = True,
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

    With ``purge_foreign=True`` (the default) entries whose EMBEDDED target
    signature mismatches this host's probed one are deleted first — the
    self-healing pass that covers live VM migration landing this process on
    a different micro-architecture mid-run (:func:`purge_foreign_entries`).

    Returns the effective cache directory, or None when the backend plugin
    does not support persistent caching (the call is then a no-op, never an
    error).
    """
    path = path or DEFAULT_CACHE_DIR
    if per_host:
        path = os.path.join(path, host_fingerprint())
    try:
        os.makedirs(path, exist_ok=True)
        if purge_foreign:
            purge_foreign_entries(path)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
        )
        # the host-fingerprint probe above may already have initialized
        # JAX's once-per-process cache singleton (against its tempdir) —
        # drop it so the next compile picks up ``path``
        _reset_jax_cache_object()
        return path
    except Exception:  # cache support varies by backend plugin
        return None
