#!/usr/bin/env python
"""A/B the Poseidon Pallas kernel MDS variants on the real chip.

Compares the VPU limb-convolution MDS against the bf16 MXU conv-matmul
MDS (ZKL_PALLAS_MXU_MDS) at production-like batch sizes, checking
exactness against the host permutation.

Run with an otherwise-idle TPU and no concurrent CPU load:
  python scripts/exp_poseidon_mxu_ab.py [--batch 65536]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zklisp_tpu.crypto import poseidon_jax as pj
    from zklisp_tpu.crypto import poseidon_pallas as pp
    from zklisp_tpu.field import f128, limb

    B = args.batch
    rng = np.random.default_rng(2)
    fes = rng.integers(0, 1 << 16, size=(B, 12, 8), dtype=np.uint32)
    states = fes  # 16-bit limbs are always canonical field elements
    sj = jax.device_put(jnp.asarray(states))
    ref = pj.permute12_batch(states[:4], pj.pos.HASHER_SUITE_ID, np)

    def bench(name: str, mxu: bool) -> float:
        fn = pp._permute_fn(bytes(pj.pos.HASHER_SUITE_ID), 27, False,
                            mxu_mds=mxu)

        def run(s):
            lf = jnp.transpose(s, (1, 2, 0))
            return fn(lf)

        t0 = time.time()
        out = np.asarray(run(sj))
        print(f"{name}: first call {time.time() - t0:.1f}s")
        got = np.transpose(out, (2, 0, 1))[:4]
        ok = (got == ref).all()
        print(f"{name}: exact {'PASS' if ok else 'FAIL'}")
        t0 = time.time()
        for _ in range(args.iters):
            out = run(sj)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        print(f"{name}: steady {dt * 1000:.1f} ms / {B} "
              f"= {dt / B * 1e6:.2f} us/perm")
        return dt

    t_vpu = bench("vpu", False)
    t_mxu = bench("mxu", True)
    print(f"speedup: {t_vpu / t_mxu:.2f}x")


if __name__ == "__main__":
    main()
