"""Persistent XLA compilation cache.

Device-prover stages are traced/compiled once per (program, segment
shape) configuration; with the persistent cache the compiled
executables also survive process restarts, so a fresh bench/CLI run
pays only tracing (fast) instead of full XLA compiles (minutes over a
tunneled TPU).  Enabled by bench.py, the test conftest and the prover's
ZKL_DEVICE=jax path; opt out with ZKL_NO_JIT_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("ZKL_NO_JIT_CACHE"):
        return
    import jax
    path = cache_dir or os.environ.get("ZKL_JIT_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
