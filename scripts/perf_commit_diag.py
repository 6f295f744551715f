#!/usr/bin/env python
"""Localize the trace-commit phase bottleneck on the real device.

PERF.md found trace commit runs ~200x below the measured Poseidon
permutation ceiling (12.6 s/round vs ~0.07 s of pure permutation
work).  This script times, at the north-star segment shape
(w=219, N=65536, partition 16):

  1. permute12_batch alone at the commit's total permutation count
  2. hash_rows_partitioned on pre-transposed rows (sponge wrapping)
  3. the full _commit_cols_fn executable (transpose + hash + tree)
  4. variant with ZKL_NO_PALLAS_POSEIDON=1 for comparison

Usage: ZKL_DEVICE=jax python scripts/perf_commit_diag.py [--n 4096]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--blowup", type=int, default=16)
    ap.add_argument("--width", type=int, default=219)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zklisp_tpu.crypto import poseidon_jax as pj
    from zklisp_tpu.prove import stark_device as sd
    from zklisp_tpu.utils import jitcache
    jitcache.enable()

    w, N = args.width, args.n * args.blowup
    ps = 16
    rng = np.random.default_rng(0)
    out = {"w": w, "N": N, "partition_size": ps,
           "device": str(jax.devices()[0])}

    def steady(fn, *xs, iters=args.iters):
        r = fn(*xs)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = fn(*xs)
        jax.block_until_ready(r)
        return (time.time() - t0) / iters

    # 1. raw permutation at the commit's per-segment perm count
    nperm = N * ((w // (2 * ps) + (1 if w % (2 * ps) else 0)) + 2) + N
    B = 1 << 20
    states = jnp.asarray(
        rng.integers(0, 1 << 16, (B, 12, 8), dtype=np.uint32))
    perm_fn = jax.jit(
        lambda s: pj.permute12_batch(s, pj.pos.HASHER_SUITE_ID, jnp))
    t = steady(perm_fn, states)
    out["perm_batch_1M_s"] = round(t, 4)
    out["perm_per_s"] = round(B / t)
    out["commit_perms_per_segment"] = nperm
    out["ideal_perm_time_s"] = round(nperm / (B / t), 4)

    # 2. sponge wrapping: leaf hash on pre-transposed rows, chunked rows
    chunk = 16384
    rows = jnp.asarray(
        rng.integers(0, 1 << 16, (chunk, w, 8), dtype=np.uint32))
    leaf_fn = jax.jit(
        lambda r: pj.hash_rows_partitioned(r, ps, jnp))
    t = steady(leaf_fn, rows)
    out["leaf_hash_16k_rows_s"] = round(t, 4)
    out["leaf_rows_per_s"] = round(chunk / t)
    out["leaf_full_segment_s"] = round(N / (chunk / t), 4)

    # 3. the real commit executable (column-major input)
    cols = jnp.asarray(
        rng.integers(0, 1 << 16, (w, N, 8), dtype=np.uint32))
    cfn = sd._commit_cols_fn(w, N, min(sd.ROW_CHUNK, N), ps)
    t = steady(cfn, cols)
    out["commit_cols_full_s"] = round(t, 4)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
