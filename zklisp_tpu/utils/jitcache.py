"""Persistent XLA compilation cache.

Device-prover stages are traced/compiled once per (program, segment
shape) configuration; with the persistent cache the compiled
executables also survive process restarts, so a fresh bench/CLI run
pays only tracing (fast) instead of full XLA compiles (minutes over a
tunneled TPU).  Enabled by bench.py, the test conftest and the prover's
ZKL_DEVICE=jax path; opt out with ZKL_NO_JIT_CACHE=1.

The cache directory is keyed by a host fingerprint: XLA:CPU AOT
executables embed the compile machine's CPU feature set, and loading
them on a different host triggers feature-mismatch warnings (and can
SIGILL).  Keying the directory by CPU flags keeps a stale cache from a
different machine from ever being consulted.
"""

from __future__ import annotations

import hashlib
import os
import platform

_BASE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def _host_fingerprint() -> str:
    """Short stable id for this host's CPU feature set AND the
    jax/jaxlib build.

    The jaxlib version is part of the key: XLA:CPU AOT entries written
    by a different XLA build load with target-machine pseudo-feature
    mismatches (cpu_aot_loader "prefer-no-gather" errors) even on the
    same CPU, and deserializing/serializing across builds has produced
    hard crashes — a stale-by-version cache must never be consulted."""
    parts = [platform.machine()]
    try:
        import jax
        import jaxlib
        parts.append(f"jax={jax.__version__}")
        parts.append(f"jaxlib={getattr(jaxlib, '__version__', '?')}")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    h = hashlib.blake2s("\n".join(parts).encode(), digest_size=6)
    return h.hexdigest()


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("ZKL_NO_JIT_CACHE"):
        return
    import jax

    # XLA:CPU LoadedExecutable serialization is BROKEN in jaxlib 0.9.0
    # for several of this project's executables: serialize, deserialize
    # and compile-and-load all SIGSEGV/abort deterministically on
    # specific programs (first the quotient family, then a second
    # family in the FRI path — there is no reliable way to enumerate
    # them).  A persistent cache that can crash any later process that
    # READS a poisoned entry is worse than no cache, so the CPU backend
    # runs uncached by default.  ZKL_JIT_CACHE_CPU=1 force-enables it
    # for environments with a healthy jaxlib.  Device backends (axon
    # TPU) keep the cache — their serialization path is separate and
    # has been exercised by every bench round.
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu" and \
            os.environ.get("ZKL_JIT_CACHE_CPU", "") != "1":
        _enabled = True     # treat as enabled: never retry per process
        return
    base = cache_dir or os.environ.get("ZKL_JIT_CACHE_DIR", _BASE_DIR)
    path = os.path.join(base, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # ZKL_JIT_CACHE_WRITES=0: read-only mode — cache hits still load,
    # but nothing new is written.  Escape hatch for environments where
    # XLA:CPU executable serialization crashes on specific large
    # programs (observed: deterministic SIGSEGV inside
    # LoadedExecutable.serialize() for the serial-path quotient
    # executable on jaxlib 0.9.0/CPU; the min-compile-time gate runs
    # BEFORE serialize, so a huge threshold suppresses the crash).
    if os.environ.get("ZKL_JIT_CACHE_WRITES", "") == "0":
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e9)
    else:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    _patch_cache()
    _enabled = True


def _patch_cache() -> None:
    """Exclude 'zkl_nocache*'-named executables from the persistent
    cache.

    XLA:CPU LoadedExecutable serialize AND deserialize SIGSEGV on
    specific large programs in jaxlib 0.9.0 (observed deterministically
    for the quotient executable — both when writing its entry and when
    loading it back in a later process).  Functions that hit this are
    named with a zkl_nocache prefix (stark_device._quotient_fn); this
    wrapper makes both cache directions skip them, so they are simply
    recompiled per process."""
    from jax._src import compilation_cache as cc

    if getattr(cc, "_zkl_nocache_patched", False):
        return

    orig_put = cc.put_executable_and_time

    def put_executable_and_time(cache_key, module_name, *a, **kw):
        if "zkl_nocache" in str(module_name):
            return None        # never serialized, so never re-loaded
        return orig_put(cache_key, module_name, *a, **kw)

    # writes carry module_name; reads are keyed by the module hash
    # (name included), so with writes skipped no poison entry can ever
    # exist for a zkl_nocache key and the read path needs no patch
    cc.put_executable_and_time = put_executable_and_time
    cc._zkl_nocache_patched = True
