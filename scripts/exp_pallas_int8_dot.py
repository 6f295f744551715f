#!/usr/bin/env python
"""Probe: does Mosaic lower an int8 dot_general -> int32 on this TPU?

If yes, the Poseidon Pallas kernel's MDS layer (currently VPU limb
convolutions, the kernel's dominant cost) can ride the MXU as an
int8-split matmul like field/mxu.py does at the XLA level.

Run on the TPU: python scripts/exp_pallas_int8_dot.py
Prints PASS/FAIL per variant plus timing for the winning one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    K, M, B = 96, 192, 512     # contraction, out rows, batch lanes

    rng = np.random.default_rng(0)
    w8 = rng.integers(0, 128, size=(M, K), dtype=np.uint8)
    x8 = rng.integers(0, 128, size=(K, B), dtype=np.uint8)
    want = (w8.astype(np.int64) @ x8.astype(np.int64)).astype(np.uint32)

    def make(dtype_in, pref):
        def kernel(w_ref, x_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                w_ref[...].astype(dtype_in), x_ref[...].astype(dtype_in),
                (((1,), (0,)), ((), ())),
                preferred_element_type=pref).astype(jnp.uint32)

        def run(w, x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((M, B), jnp.uint32),
                in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                          pl.BlockSpec((K, B), lambda: (0, 0))],
                out_specs=pl.BlockSpec((M, B), lambda: (0, 0)),
            )(w, x)

        return jax.jit(run)

    variants = [
        ("int8->int32", jnp.int8, jnp.int32),
        ("uint8->uint32", jnp.uint8, jnp.uint32),
        ("int32->int32", jnp.int32, jnp.int32),
        ("bf16->f32", jnp.bfloat16, jnp.float32),
    ]
    for name, di, pref in variants:
        try:
            fn = make(di, pref)
            t0 = time.time()
            out = np.asarray(fn(jnp.asarray(w8), jnp.asarray(x8)))
            dt = time.time() - t0
            if name == "bf16->f32":
                # bf16 mantissa can't hold the exact sums; only check
                # that it lowered at all
                ok = out.shape == want.shape
            else:
                ok = bool((out == want).all())
            print(f"{name}: {'PASS' if ok else 'WRONG-RESULT'} "
                  f"(first call {dt:.1f}s)")
            if ok and name != "bf16->f32":
                t0 = time.time()
                for _ in range(10):
                    out = fn(jnp.asarray(w8), jnp.asarray(x8))
                out.block_until_ready()
                print(f"   steady: {(time.time()-t0)/10*1e6:.0f} us/call")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})")


if __name__ == "__main__":
    main()
