"""MXU-path f128 linear algebra: field matmuls as int8-split limb dots.

The TPU's systolic array (MXU) does int8 x int8 -> int32 matmuls at
hundreds of TOPS, while the VPU limb path manages ~1 Gfield-MAC/s.  Any
field-element matrix product  out[b, i] = sum_j A[b, j] * W[j, i]  with a
CONSTANT W (NTT/DFT matrices, the Poseidon MDS layer) can be lowered to
integer matmuls over limb columns:

  out_cols[b, i*16 + k] = sum_{j, l} a[b, j*8 + l] * Wm[j*8 + l, i*16 + k]
  Wm[j*8 + l, i*16 + k] = limb_{k-l}(W[j, i])        (0 <= k-l < 8)

16-bit limbs split into 8-bit halves make every product fit the MXU's
int8 tiles; four dots (ll, lh, hl, hh) recombine with byte shifts into
u32-safe 16-bit columns, which the standard carry-lookahead reduction
(`limb._reduce_cols_xla`) folds back to canonical elements.  Measured on
one chip: 32 Gfield-MAC/s at J=K=256 (the four-step NTT shape) — ~60x
the VPU limb path — and exact (cross-checked against host ints).

Accumulation bound: J*8 terms * 255^2 < 2^31 requires J <= 4096.

Used by: field/ntt.py (four-step NTT), crypto/poseidon_jax.py (MDS).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import numpy as _np

from . import f128, limb

K16 = 16  # output column count per element (products reach column 14)


def wmat_from_ints(W_ints: Sequence[Sequence[int]]) -> _np.ndarray:
    """(J, K) field constants -> (J*8, K*16) uint16 limb-convolution
    matrix (host, call once per constant matrix and cache)."""
    J = len(W_ints)
    K = len(W_ints[0])
    assert J * 8 <= 4096 * 8, "accumulation bound"
    Wm = _np.zeros((J * 8, K * K16), dtype=_np.uint16)
    for j in range(J):
        row = W_ints[j]
        for i in range(K):
            v = int(row[i])
            for l in range(8):
                for k in range(l, l + 8):
                    Wm[j * 8 + l, i * K16 + k] = (v >> (16 * (k - l))) & 0xFFFF
    return Wm


def wmat_planes(Wm: _np.ndarray) -> Tuple[_np.ndarray, _np.ndarray]:
    """Split a uint16 weight matrix into (lo8, hi8) uint8 planes."""
    return ((Wm & 0xFF).astype(_np.uint8), (Wm >> 8).astype(_np.uint8))


def field_matmul(a_limbs, w_lo, w_hi, jnp):
    """a_limbs: (..., J, 8) uint32 x constant planes (J*8, K*16) uint8
    -> (..., K, 8) canonical field elements.  Leading dims are batch.

    Safe for J <= 4096 (int32 accumulators) — asserted by wmat_from_ints.
    """
    import jax

    lead = a_limbs.shape[:-2]
    J = a_limbs.shape[-2]
    K = w_lo.shape[1] // K16
    a = a_limbs.reshape(lead + (J * 8,))
    a_lo = (a & 0xFF).astype(jnp.uint8)
    a_hi = (a >> 8).astype(jnp.uint8)

    nd = a.ndim

    def dot(x, w):
        return jax.lax.dot_general(
            x, w, (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.uint32)

    ll = dot(a_lo, w_lo)
    lh = dot(a_lo, w_hi)
    hl = dot(a_hi, w_lo)
    hh = dot(a_hi, w_hi)
    # value = ll + (lh+hl)*2^8 + hh*2^16; byte-split the *2^8 term so all
    # contributions stay u32; the k+1 shift never drops a nonzero column
    # (products reach column 14 < 15).
    mid = lh + hl
    at_k = (ll + ((mid & 0xFF) << 8)).reshape(lead + (K, K16))
    at_k1 = ((mid >> 8) + hh).reshape(lead + (K, K16))
    pad = [(0, 0)] * (len(lead) + 1) + [(1, 0)]
    cols = at_k + jnp.pad(at_k1, pad)[..., :K16]
    bound = sum(((1 << 32) - 1) << (16 * k) for k in range(K16))
    return limb._reduce_cols_xla(cols, jnp, bound)


# ---------------------------------------------------------------------------
# four-step NTT tables
# ---------------------------------------------------------------------------

def _split_n(n: int) -> Tuple[int, int]:
    """n = n1 * n2 with n1 >= n2, both powers of two, n1 <= 256."""
    log = n.bit_length() - 1
    l1 = min((log + 1) // 2, 8)
    # keep n1 (the first-stage DFT size) <= 256 for the J-bound and
    # weight-matrix size; n2 grows with n
    n1 = 1 << l1
    return n1, n // n1


@lru_cache(maxsize=None)
def _dft_wmat(m: int, inverse: bool):
    """uint8 planes of the m-point DFT matrix D[j, k] = w_m^(jk)."""
    w = f128.get_root_of_unity(m)
    if inverse:
        w = f128.inv(w)
    rows = []
    for j in range(m):
        wj = pow(w, j, f128.P)
        row = [1] * m
        cur = 1
        for k in range(1, m):
            cur = f128.mul(cur, wj)
            row[k] = cur
        rows.append(row)
    return wmat_planes(wmat_from_ints(rows))


@lru_cache(maxsize=None)
def _twiddles(n: int, inverse: bool) -> _np.ndarray:
    """(n2, n1, 8) limb array tw[j2, k1] = w_n^(j2*k1)."""
    n1, n2 = _split_n(n)
    w = f128.get_root_of_unity(n)
    if inverse:
        w = f128.inv(w)
    rows = []
    for j2 in range(n2):
        wj = pow(w, j2, f128.P)
        row = [1] * n1
        cur = 1
        for k1 in range(1, n1):
            cur = f128.mul(cur, wj)
            row[k1] = cur
        rows.append(row)
    return _np.asarray(limb.from_ints(rows), dtype=_np.uint32)


def _twiddles_device(n: int, inverse: bool, jnp):
    """tw[j2, k1] = w_n^(j2*k1) built ON DEVICE.

    The host table (_twiddles) baked as a jit constant is n x 32 B —
    2 MB at n=65536 — and constants serialize into the MLIR text, which
    pushed whole-prover-stage modules past 40 MB and crashed the
    tunneled TPU's AOT compile helper.  Here only log2(n) scalar seeds
    are constants: the half-table [w^0..w^(n/2-1)] grows by log-doubling
    (ntt.powers_table) and w^e for e >= n/2 is -w^(e - n/2)."""
    from . import ntt
    n1, n2 = _split_n(n)
    half = n // 2
    half_tab = ntt.powers_table(n.bit_length() - 1, jnp, inverse=inverse)
    e = (jnp.arange(n2, dtype=jnp.int32)[:, None]
         * jnp.arange(n1, dtype=jnp.int32)[None, :])       # < n always
    hi = (e >= half).reshape(-1)
    idx = jnp.where(hi, e.reshape(-1) - half, e.reshape(-1))
    tw = jnp.take(half_tab, idx, axis=0)
    tw = jnp.where(hi[:, None], limb.neg(tw, jnp), tw)
    return tw.reshape(n2, n1, limb.NLIMB)


def ntt_four_step(x, jnp, inverse: bool = False, _scale: bool = True):
    """(..., n, 8) -> exact NTT/iNTT via MXU matmul stages.

    Output matches the radix-2 `ntt.ntt` bit for bit (same math, natural
    order); iNTT includes the n^-1 scale.  For n > 256*256 the second
    stage recurses (unscaled), so weight matrices stay <= 256-point.
    """
    lead = x.shape[:-2]
    n = x.shape[-2]
    n1, n2 = _split_n(n)
    d1_lo, d1_hi = _dft_wmat(n1, inverse)
    tw = _twiddles_device(n, inverse, jnp)

    # x[j] with j = j1*n2 + j2 -> (j1, j2); step 1 DFTs along j1:
    # A_T[j2, k1] = sum_j1 x[j1, j2] * w^(n2*j1*k1)  (D symmetric)
    xm = x.reshape(lead + (n1, n2, limb.NLIMB))
    x_t = jnp.swapaxes(xm, -3, -2)               # (..., n2, n1, 8)
    a_t = field_matmul(x_t, d1_lo, d1_hi, jnp)   # (..., n2, n1, 8)
    t_t = limb.mul(a_t, jnp.broadcast_to(tw, a_t.shape), jnp)
    # step 3 DFTs along j2: R[k1, k2] = sum_j2 T[k1, j2] * w^(n1*j2*k2)
    t_m = jnp.swapaxes(t_t, -3, -2)              # (..., n1, n2, 8)
    if n2 <= 256:
        d2_lo, d2_hi = _dft_wmat(n2, inverse)
        r = field_matmul(t_m, d2_lo, d2_hi, jnp)  # (..., k1, k2, 8)
    else:
        r = ntt_four_step(t_m, jnp, inverse, _scale=False)
    # output index k = k2*n1 + k1
    out = jnp.swapaxes(r, -3, -2).reshape(lead + (n, limb.NLIMB))
    if inverse and _scale:
        n_inv = jnp.asarray(limb.from_ints([f128.inv(n % f128.P)]))
        out = limb.mul(out, n_inv, jnp)
    return out
