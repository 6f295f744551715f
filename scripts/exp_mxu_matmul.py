#!/usr/bin/env python
"""Experiment: field matrix-multiply on the MXU via int8-split limbs.

A field matmul  out[b, i] = sum_j A[b, j] * W[j, i]  (f128 elements as
8x16-bit limbs) can be expressed as an integer matmul over limb columns:

  out_cols[b, i*16 + k] = sum_{j, l} a[b, j*8 + l] * Wmat[j*8 + l, i*16 + k]
  with Wmat[j*8+l, i*16+k] = limb_{k-l}(W[j, i])   (0 <= k-l < 8)

With 16-bit limbs split into 8-bit halves the products fit int8 x int8
-> int32 MXU tiles: 4 dots (lo*lo, lo*hi, hi*lo, hi*hi) recombined with
shifts.  Accumulation bound: J*8 terms * 255^2 < 2^31 for J <= 4096.

This script times the MXU path vs the current limb.dot VPU path on the
Poseidon MDS shape (J=K=12, B=65536) and the four-step NTT shape
(J=K=256, B=8192), and checks exactness against the host path.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from zklisp_tpu.field import f128, limb  # noqa: E402


def build_wmat(W_ints, K16=16):
    """W_ints: (J, K) python ints -> (J*8, K*K16) int32 limb matrix."""
    J = len(W_ints)
    K = len(W_ints[0])
    Wm = np.zeros((J * 8, K * K16), dtype=np.int32)
    for j in range(J):
        for i in range(K):
            v = W_ints[j][i]
            for l in range(8):
                for k in range(l, min(l + 8, K16)):
                    Wm[j * 8 + l, i * K16 + k] = (v >> (16 * (k - l))) & 0xFFFF
    return Wm


def mxu_field_matmul(a_limbs, Wm, jnp, jax):
    """a_limbs: (B, J, 8) uint32 -> (B, K, 8) reduced field elements."""
    B, J, _ = a_limbs.shape
    K16 = 16
    K = Wm.shape[1] // K16
    a = a_limbs.reshape(B, J * 8)
    a_lo = (a & 0xFF).astype(jnp.uint8)
    a_hi = (a >> 8).astype(jnp.uint8)
    w_lo = (Wm & 0xFF).astype(jnp.uint8)
    w_hi = (Wm >> 8).astype(jnp.uint8)

    def dot(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.uint32)

    ll = dot(a_lo, w_lo)
    lh = dot(a_lo, w_hi)
    hl = dot(a_hi, w_lo)
    hh = dot(a_hi, w_hi)
    # true column value = ll + (lh+hl)*2^8 + hh*2^16; keep every
    # contribution u32-safe by splitting the *2^8 term at a byte and
    # pushing the high parts into the next 16-bit column (products only
    # reach column 14, so the k+1 shift never drops a nonzero).
    mid = lh + hl                              # <= 2^29 for J <= 4096
    at_k = ll + ((mid & 0xFF) << 8)            # <= 2^28 + 2^16
    at_k1 = (mid >> 8) + hh                    # <= 2^21 + 2^28
    cols = at_k.reshape(B, K, K16)
    carry = at_k1.reshape(B, K, K16)
    cols = cols + jnp.pad(carry, [(0, 0), (0, 0), (1, 0)])[:, :, :K16]
    from zklisp_tpu.field.limb import _reduce_cols_xla
    bound = sum(((1 << 32) - 1) << (16 * k) for k in range(K16))
    return _reduce_cols_xla(cols, jnp, bound)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    from zklisp_tpu.crypto import poseidon as pos

    for (J, K, B, iters) in [(12, 12, 1 << 16, 20), (256, 256, 1 << 13, 5)]:
        W_ints = [[int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % f128.P
                   for _ in range(K)] for _ in range(J)]
        Wm = build_wmat(W_ints)
        a_ints = [[int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % f128.P
                   for _ in range(J)] for _ in range(B // 256)]
        # replicate rows to size B to keep host prep fast
        a_l = np.asarray(limb.from_ints(a_ints), dtype=np.uint32)
        a_l = np.tile(a_l, (256, 1, 1))[:B]

        a_dev = jnp.asarray(a_l)
        Wm_dev = jnp.asarray(Wm)

        f_mxu = jax.jit(lambda x: mxu_field_matmul(x, Wm_dev, jnp, jax))
        W_limbs = jnp.asarray(np.asarray(limb.from_ints(W_ints)))

        def vpu(x):
            # out[b, i] = sum_j x[b, j] * W[j, i] -> limb.dot over j
            # arrange (B, K, J, 8) * (K, J, 8)
            xt = x[:, None, :, :]
            wt = jnp.transpose(W_limbs, (1, 0, 2))[None]
            return limb.dot(jnp.broadcast_to(xt, (x.shape[0], K, J, 8)),
                            jnp.broadcast_to(wt, (x.shape[0], K, J, 8)),
                            jnp)
        f_vpu = jax.jit(vpu)

        r_mxu = f_mxu(a_dev); r_mxu.block_until_ready()
        r_vpu = f_vpu(a_dev); r_vpu.block_until_ready()

        # exactness vs host
        exp0 = [sum(a_ints[0][j] * W_ints[j][i] for j in range(J)) % f128.P
                for i in range(K)]
        got_mxu = [int(v) for v in limb.to_ints(np.asarray(r_mxu[0]))]
        got_vpu = [int(v) for v in limb.to_ints(np.asarray(r_vpu[0]))]
        assert got_vpu == exp0, "VPU path mismatch!?"
        ok = got_mxu == exp0
        print(f"J={J} K={K} B={B}: mxu exact={ok}")
        if not ok:
            print(" first diff:", next((i, a, b) for i, (a, b) in
                                       enumerate(zip(got_mxu, exp0)) if a != b))
            continue

        for name, f in (("mxu", f_mxu), ("vpu", f_vpu)):
            t0 = time.time()
            for _ in range(iters):
                r = f(a_dev)
            r.block_until_ready()
            dt = (time.time() - t0) / iters
            fmacs = B * J * K
            print(f"  {name}: {dt*1e3:.2f} ms  "
                  f"({fmacs/dt/1e9:.2f} Gfield-MAC/s)")


if __name__ == "__main__":
    main()
