"""Isolate the leveled-executor cost on the live backend.

Synthetic (K, C, 8) batches over a (R, C, 8) table, shaped like the
rollup program's schedule: which primitive dominates — the gathers,
the dynamic_update_slice chain, or the limb arithmetic?

Usage: ZKL_DEVICE=jax python scripts/exp_cvm_patterns.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from zklisp_tpu.field import limb

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # rollup-shaped schedule: (kind, K) per batch, 18 levels
    SCHED = [[("add", 137), ("sub", 99), ("mul", 334)],
             [("add", 180), ("sub", 11), ("mul", 120)],
             [("add", 200), ("mul", 14)],
             [("add", 40), ("sub", 3), ("mul", 3)],
             [("add", 20), ("sub", 8), ("mul", 7)],
             [("add", 14), ("sub", 2), ("mul", 11)],
             [("add", 10), ("sub", 2), ("mul", 14)],
             [("add", 14), ("sub", 3), ("mul", 4)],
             [("add", 4), ("mul", 3)],
             [("add", 2)], [("add", 2)], [("add", 2)],
             [("mul", 11)], [("add", 11)], [("add", 11)],
             [("sub", 11)], [("mul", 11)], [("add", 11)]]
    R = 2506
    S = 4                  # vmap lanes

    def build(C, n_chunks, mode):
        sched = []
        pos = 571
        for lvl in SCHED:
            out = []
            for kind, K in lvl:
                a = rng.integers(0, min(pos, R), size=K).astype(np.int32)
                b = rng.integers(0, min(pos, R), size=K).astype(np.int32)
                out.append((kind, a, b, min(pos, R - K)))
                pos += K
            sched.append(out)

        def fn(U0):
            def body(carry, ci):
                U = U0
                acc = None
                for lvl in sched:
                    for kind, a_idx, b_idx, start in lvl:
                        if mode == "no_gather":
                            A = lax.dynamic_slice(
                                U, (0, 0, 0), (len(a_idx), C, 8))
                            B = lax.dynamic_slice(
                                U, (8, 0, 0), (len(b_idx), C, 8))
                        else:
                            A = U[jnp.asarray(a_idx)]
                            B = U[jnp.asarray(b_idx)]
                        if kind == "mul":
                            Rv = limb.mul(A, B, jnp)
                        elif kind == "add":
                            Rv = limb.add(A, B, jnp)
                        else:
                            Rv = limb.sub(A, B, jnp)
                        if mode == "no_dus":
                            acc = (Rv[0] if acc is None
                                   else limb.add(acc, Rv[0], jnp))
                        else:
                            U = lax.dynamic_update_slice(
                                U, Rv, (start, 0, 0))
                out = (acc if mode == "no_dus"
                       else U[R - 1])
                return carry, out
            _, o = lax.scan(body, 0, jnp.arange(n_chunks,
                                                dtype=jnp.int32))
            return o

        return jax.jit(jax.vmap(fn))

    for C, n_chunks in ((2048, 16), (1024, 32), (4096, 8)):
        U0 = jnp.asarray(rng.integers(
            0, 1 << 16, size=(S, R, C, 8), dtype=np.uint32))
        for mode in ("full", "no_dus", "no_gather"):
            t0 = time.time()
            f = build(C, n_chunks, mode)
            r = f(U0)
            jax.block_until_ready(r)
            tc = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(U0))
                ts.append(time.time() - t0)
            print(f"C={C} chunks={n_chunks} {mode}: "
                  f"{min(ts)*1e3:.0f} ms (compile {tc:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
