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
    """Short stable id for this host's CPU feature set."""
    parts = [platform.machine()]
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
    base = cache_dir or os.environ.get("ZKL_JIT_CACHE_DIR", _BASE_DIR)
    path = os.path.join(base, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
