#!/usr/bin/env python
"""Benchmark: the north-star metric — end-to-end proved rows/s on one chip.

Default mode proves a full 2^16-row trace at the reference rollup-bench
config (BASELINE.md: queries=64, blowup=16, grind=16) with the jit-staged
device prover — 16 segments + STARK-in-STARK aggregation — and reports
proved rows/s over the total wall clock (trace build + prove + aggregate).
First run on a cold XLA cache pays kernel compiles (~6-8 min); the
persistent cache in .jax_cache/ makes subsequent runs steady-state.

`--lde-commit` keeps the previous kernel-level metric (trace LDE +
Merkle commitment throughput of one 4096x219 segment).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": N}

vs_baseline is reported against the reference's published numbers; the
reference repo publishes none (BASELINE.md), so 1.0 is used as the
placeholder denominator.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")


def main_e2e(small: bool) -> None:
    """North star: full prove+aggregate of a 2^16-row trace (1 chip)."""
    import runpy

    os.environ.setdefault("ZKL_DEVICE", "jax")
    here = os.path.dirname(os.path.abspath(__file__))
    sys.argv = [sys.argv[0]]
    if small:
        sys.argv += ["--rows", "8192", "--queries", "8", "--blowup", "8",
                     "--grind", "0", "--security-bits", "0"]
    runpy.run_path(os.path.join(here, "scripts", "bench_e2e.py"),
                   run_name="__main__")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Allow CPU fallback for local smoke testing: bench.py --cpu
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    small = "--small" in sys.argv
    n = 512 if small else 4096          # trace rows (segment)
    width = 219                          # baseline trace width
    blowup = 4 if small else 16
    N = n * blowup                       # LDE rows (65536 = 2^16)
    chunk = min(N, 4096)
    partition_size = 16                  # utils.rs policy for width > 32

    from zklisp_tpu.prove import kernels

    dev = jax.devices()[0]
    t_warm0 = time.time()
    # Warm up the device<->host path first (the tunneled TPU in this
    # environment has a very expensive first transfer).
    _ = jax.device_get(jnp.zeros((8,), jnp.uint32))
    warmup_s = time.time() - t_warm0

    rng = np.random.default_rng(7)
    cols = rng.integers(0, 1 << 16, size=(width, n, 8), dtype=np.uint32)
    cols_d = jax.device_put(jnp.asarray(cols), dev)

    lde_fn = kernels.lde_columns_fn(n, blowup)
    leaf_fn = kernels.leaf_hash_fn(width, partition_size)
    tree_fn = kernels.merkle_levels_fn(N)

    def run_once():
        lde = lde_fn(cols_d)                       # (width, N, 8)
        rows = jnp.transpose(lde, (1, 0, 2))       # (N, width, 8)
        # chunked leaf hashing to bound peak memory
        leaves = []
        for off in range(0, N, chunk):
            leaves.append(leaf_fn(rows[off:off + chunk]))
        leaves = jnp.concatenate(leaves, axis=0)
        levels = tree_fn(leaves)
        return levels[-1]

    # compile + first run
    t0 = time.time()
    root = run_once()
    root.block_until_ready()
    compile_s = time.time() - t0

    iters = 1 if small else 2
    t0 = time.time()
    for _ in range(iters):
        root = run_once()
    root.block_until_ready()
    steady = (time.time() - t0) / iters

    rows_per_sec = N / steady

    print(json.dumps({
        "metric": "lde_commit_rows_per_sec_2e16",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": 1.0,
        "detail": {
            "trace_rows": n, "lde_rows": N, "width": width,
            "blowup": blowup, "steady_s": round(steady, 3),
            "compile_s": round(compile_s, 1),
            "warmup_s": round(warmup_s, 1),
            "device": str(dev),
        },
    }))


if __name__ == "__main__":
    small = "--small" in sys.argv or "--cpu" in sys.argv
    if "--cpu" in sys.argv:
        # the sandbox sitecustomize force-selects the axon TPU platform;
        # env vars are ignored, only a config update before backend init
        # wins (same trick as tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--lde-commit" in sys.argv:
        main()
    else:
        main_e2e(small)
