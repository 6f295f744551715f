"""Fused Poseidon2 t=12 permutation as a Pallas TPU kernel.

The XLA scan path (poseidon_jax.permute12_batch) round-trips the full
(B, 12, 8) state through HBM several times per round (cube columns,
normalize, MDS, add), which makes Merkle leaf hashing HBM-bound.  This
kernel keeps a block of states resident in VMEM across all 27 rounds and
fuses cube + MDS + round-constant injection into one pass.

Layout: the kernel works limbs-first — state (12 lanes, 8 limbs, B) so
the batch axis is the TPU lane (minor) dimension and the 8-limb axis sits
on sublanes.  The (B, 12, 8) limb layout used everywhere else would put
the 8-wide limb axis on the 128-wide lane dimension (16x waste).  The
transposes at the kernel boundary are two full-bandwidth HBM passes and
amortize over 27 fused rounds.

All arithmetic is uint32 with the same bounds discipline as field/limb.py
(16x16-bit products exact in u32, carry-lookahead normalization via the
packed-bit adder identity); the round constants are folded into the MDS
product columns before the single modular reduction, so each round costs
exactly two reductions (cube, MDS+rc).

Reference: zk-lisp runs scalar Rust Poseidon on CPU threads
(zk-lisp-proof-winterfell/src/poseidon/mod.rs); this is the TPU-native
replacement for the batched permutation underneath Merkle commitments,
FRI layer commits, grinding and sponge hashing.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as _np

from ..field import f128
from ..field.limb import C_LIMBS, LIMB_MASK, NLIMB, P_LIMBS
from . import poseidon as pos

BLOCK = 256          # batch lanes per kernel instance (2 vregs wide)


def _pad2(x, lo: int, hi: int, jnp):
    cfg = [(0, 0)] * x.ndim
    cfg[-2] = (lo, hi)
    return jnp.pad(x, cfg)


def _place2(cols, offset: int, width: int, jnp):
    """Zero-pad base-2^16 columns (axis -2) to `width`, shifted by offset."""
    return _pad2(cols, offset, width - offset - cols.shape[-2], jnp)


def _antidiag_lf(lo_mat, hi_mat, width: int, jnp):
    """(..., R, C, B) product halves -> (..., width, B) column sums.

    col[k] = sum_{i+j=k} lo[i, j]  +  sum_{i+j=k-1} hi[i, j]
    (the >>16 halves land one base-2^16 digit higher).
    """
    R = lo_mat.shape[-3]
    acc = None
    for i in range(R):
        t = (_place2(lo_mat[..., i, :, :], i, width, jnp)
             + _place2(hi_mat[..., i, :, :], i + 1, width, jnp))
        acc = t if acc is None else acc + t
    return acc


def _normalize_lf(cols, jnp):
    """u32 columns (..., K, B) -> canonical 16-bit digits (..., K+2, B).

    Same algorithm as limb._normalize_cols with the digit axis moved to
    -2: one lo/hi split bounds each column by 2^17-2, then the full carry
    ripple resolves in O(1) vector ops via C = ((G<<1) + P) ^ P.
    """
    import jax

    K = cols.shape[-2]
    assert K + 2 <= 31          # packed bits must stay positive in int32
    lo = cols & LIMB_MASK
    hi = cols >> 16
    t = _place2(lo, 0, K + 2, jnp) + _place2(hi, 1, K + 2, jnp)
    g = (t >> 16).astype(jnp.uint32)
    p = ((t & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
    w = jax.lax.broadcasted_iota(jnp.uint32, (K + 2, t.shape[-1]), 0)
    # Mosaic has no unsigned reductions; the packed bits are one per
    # column (< 2^31), so the sums are exact in int32.
    G = jnp.sum((g << w).astype(jnp.int32), axis=-2).astype(jnp.uint32)
    Pm = jnp.sum((p << w).astype(jnp.int32), axis=-2).astype(jnp.uint32)
    C = ((G << 1) + Pm) ^ Pm
    cbits = (C[..., None, :] >> w) & jnp.uint32(1)
    return (t + cbits) & LIMB_MASK


def _fold_lf(digits, jnp):
    """Canonical digits (..., K, B), K > 8: value -> lo + (value>>128)*C."""
    K = digits.shape[-2]
    lo = digits[..., :NLIMB, :]
    hi = digits[..., NLIMB:, :]
    W = max(NLIMB, (K - NLIMB) + 4)
    acc = _place2(lo, 0, W, jnp)
    for l, cv in enumerate(C_LIMBS):
        pr = hi * jnp.uint32(cv)
        acc = acc + _place2(pr & LIMB_MASK, l, W, jnp)
        acc = acc + _place2(pr >> 16, l + 1, W, jnp)
    return acc


def _ndigits(bound: int) -> int:
    return max(1, (bound.bit_length() + 15) // 16)


_P_COMPL = _np.asarray(
    [(0xFFFF - P_LIMBS[0]) + 1] + [0xFFFF - v for v in P_LIMBS[1:]],
    dtype=_np.uint32)[:, None]                     # (8, 1): broadcast over B


def _cond_sub_lf(d, pcompl, jnp):
    """d (..., 8, B) canonical digits < 2^128: subtract p if >= p.

    pcompl: (8, 1) two's complement of p (passed in: Pallas kernels may
    not capture array constants)."""
    t = d + pcompl
    nt = _normalize_lf(t, jnp)
    ge = nt[..., NLIMB, :] > 0
    return jnp.where(ge[..., None, :], nt[..., :NLIMB, :], d)


def _reduce_lf(cols, bound: int, pcompl, jnp):
    """(..., K, B) u32 columns, value <= bound -> canonical (..., 8, B)."""
    d = _normalize_lf(cols, jnp)[..., :_ndigits(bound), :]
    while d.shape[-2] > NLIMB + 1:
        bound = (bound >> 128) * f128.C128 + min(bound, (1 << 128) - 1)
        d = _normalize_lf(_fold_lf(d, jnp), jnp)[..., :_ndigits(bound), :]
    if d.shape[-2] > NLIMB:
        d = _normalize_lf(_fold_lf(d, jnp), jnp)[..., :NLIMB + 1, :]
        d = _normalize_lf(_fold_lf(d, jnp), jnp)
    d = d[..., :NLIMB, :]
    if d.shape[-2] < NLIMB:
        d = _place2(d, 0, NLIMB, jnp)
    return _cond_sub_lf(d, pcompl, jnp)


def _cube_lf(a, pcompl, jnp):
    """a^3 mod p, limbs-first: (..., 8, B) -> (..., 8, B).

    Port of limb.cube: exact 16-digit square, convolved with a, one
    reduction."""
    outer = a[..., :, None, :] * a[..., None, :, :]      # (..., 8, 8, B)
    cols2 = _antidiag_lf(outer & LIMB_MASK, outer >> 16, 17, jnp)
    d2 = _normalize_lf(cols2, jnp)[..., :16, :]
    prod = d2[..., :, None, :] * a[..., None, :, :]      # (..., 16, 8, B)
    cols3 = _antidiag_lf(prod & LIMB_MASK, prod >> 16, 24, jnp)
    return _reduce_lf(cols3, ((1 << 256) - 1) * ((1 << 128) - 1),
                      pcompl, jnp)


def _mds_rc_lf(s3, mds, rc_r, pcompl, jnp):
    """MDS matmul + round-constant add with ONE reduction.

    s3: (12, 8, B) cubed lanes.  mds: (12, 12, 8, B) uint32 limbs in
    j-major order, pre-broadcast over the lane axis on the host
    (mds[j, i, l, :] = limb l of MDS[i][j]).  The broadcast spends VMEM
    (~4.7 MB at BLOCK=256) to keep every in-kernel reshape of the form
    "insert axis before last" — the only expansion Mosaic's layout
    inference accepts here ((12,8) -> (12,8,1,1) is an unsupported
    shape cast; leading-axis indexing only, mid-axis indexing lowers to
    an unsupported gather).  rc_r: (12, 8) uint32 limbs for this round.
    The rc digits are added into the product columns before reduction
    (offset 0), so the add is free.
    """
    t = mds.shape[0]
    acc_lo = None
    acc_hi = None
    for j in range(t):
        w = mds[j][:, :, None, :]                        # (12, 8, 1, B)
        prod = w * s3[j][None, None, :, :]               # (12, 8, 8, B)
        lo = prod & LIMB_MASK
        hi = prod >> 16
        acc_lo = lo if acc_lo is None else acc_lo + lo
        acc_hi = hi if acc_hi is None else acc_hi + hi
    cols = _antidiag_lf(acc_lo, acc_hi, 17, jnp)         # (12, 17, B)
    cols = cols + _place2(rc_r[:, :, None], 0, 17, jnp)
    bound = t * (f128.P - 1) ** 2 + (f128.P - 1)
    return _reduce_lf(cols, bound, pcompl, jnp)


def _mds_rc_mxu_lf(s3, wp, rc_r, pcompl, jnp):
    """MDS layer as int8 MXU matmuls (limb-convolution weights).

    s3: (12, 8, B) cubed lanes.  wp: three int8 planes (96, 192) of the
    convolution matrix Wm[(j*8+l), (i*16+k)] = limb_{k-l}(MDS[i][j]),
    split into 7-bit digits (Mosaic lowers 8-bit dots through SIGNED
    int8 MXU tiles, so operands must stay < 128 — verified by
    scripts/exp_pallas_int8_dot.py).  The 9 plane-pair dots accumulate
    per shift-sum s = a+b; each D_s (192, B) int32 <= 96*127^2 < 2^21
    is split/shifted into a base-2^16 digit grid (12, 18, B) that holds
    the exact product value, then reduced once (with the round constant
    added into digits 0..7 for free).

    Replaces the VPU j-loop of _mds_rc_lf (12x(12,8,8,B) limb products
    + antidiagonal sums) — the kernel's dominant cost — with MXU work.
    """
    t = 12
    B = s3.shape[-1]
    import jax

    def bf16(v):
        return v.astype(jnp.int32).astype(jnp.float32).astype(
            jnp.bfloat16)

    x = s3.reshape(t * NLIMB, B)
    xp_ = (bf16(x & 0x7F), bf16((x >> 7) & 0x7F), bf16(x >> 14))
    d = {}
    for a in range(3):
        for b in range(3):
            # 7-bit operands are exact in bf16; sums of 96 products
            # (< 2^21) are exact in the f32 accumulator -> exact integer
            # result on the NATIVE MXU path (int8 dots lower to a slow
            # emulation on this chip; see scripts/exp_pallas_int8_dot.py)
            acc = jax.lax.dot_general(
                wp[b], xp_[a], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (192, B)
            s_i = a + b
            d[s_i] = acc if s_i not in d else d[s_i] + acc
    d = {s_i: acc.astype(jnp.int32) for s_i, acc in d.items()}
    W = 19      # max digit: k(15) + q(1) + hi-split(1) + half-split(1)
    cols = None
    for s_i, acc in d.items():
        accu = acc.astype(jnp.uint32).reshape(t, 16, B)
        q, r = divmod(7 * s_i, 16)
        lo = accu & LIMB_MASK                            # < 2^16
        hi = accu >> 16                                  # < 2^5
        for base, off in ((lo, q), (hi, q + 1)):
            v = base << r                                # < 2^31
            contrib = (_place2(v & LIMB_MASK, off, W, jnp)
                       + _place2(v >> 16, off + 1, W, jnp))
            cols = contrib if cols is None else cols + contrib
    cols = cols + _place2(rc_r[:, :, None], 0, W, jnp)
    bound = t * (f128.P - 1) ** 2 + (f128.P - 1)
    return _reduce_lf(cols, bound, pcompl, jnp)


@lru_cache(maxsize=None)
def _mds_conv_planes(suite_id: bytes, rounds: int):
    """Host: 3 int8 7-bit planes (96, 192) of the MDS limb-conv matrix."""
    s = pos.get_poseidon_suite(suite_id, rounds)
    t = 12
    Wm = _np.zeros((t * NLIMB, t * 16), dtype=_np.uint16)
    for j in range(t):
        for i in range(t):
            v = int(s.mds[i][j])
            for l in range(NLIMB):
                for k in range(l, l + NLIMB):
                    Wm[j * NLIMB + l, i * 16 + k] = (v >> (16 * (k - l))) \
                        & 0xFFFF
    return (_np.ascontiguousarray((Wm & 0x7F).astype(_np.float32)),
            _np.ascontiguousarray(((Wm >> 7) & 0x7F).astype(_np.float32)),
            _np.ascontiguousarray((Wm >> 14).astype(_np.float32)))


def _use_mxu_mds() -> bool:
    """bf16-MXU MDS is the default: ~1.5x faster steady than the VPU
    limb convolution AND ~60x faster Mosaic compiles per batch shape
    (3 s vs 213 s measured at B=65536).  ZKL_NO_PALLAS_MXU_MDS reverts."""
    return not os.environ.get("ZKL_NO_PALLAS_MXU_MDS")


@lru_cache(maxsize=None)
def _suite_np(suite_id: bytes, rounds: int):
    """Returns (mds_jil, rc): MDS transposed to j-major (see _mds_rc_lf)."""
    from ..field import limb
    s = pos.get_poseidon_suite(suite_id, rounds)
    mds = limb.from_ints(s.mds)                      # (i, j, 8)
    return _np.ascontiguousarray(mds.transpose(1, 0, 2)), limb.from_ints(s.rc)


@lru_cache(maxsize=None)
def _permute_fn(suite_id: bytes, rounds: int, interpret: bool,
                mxu_mds: bool = False):
    """Builds the jittable (12, 8, B) -> (12, 8, B) fused permutation."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    mds_np, rc_np = _suite_np(suite_id, rounds)

    if mxu_mds:
        w0, w1, w2 = _mds_conv_planes(suite_id, rounds)

        def kernel(s_ref, w0_ref, w1_ref, w2_ref, rc_ref, pc_ref, o_ref):
            wp = (w0_ref[...], w1_ref[...], w2_ref[...])
            pcompl = pc_ref[...]

            def body(r, s):
                s3 = _cube_lf(s, pcompl, jnp)
                rc_r = rc_ref[pl.ds(r, 1)][0]
                return _mds_rc_mxu_lf(s3, wp, rc_r, pcompl, jnp)

            o_ref[...] = jax.lax.fori_loop(0, rounds, body, s_ref[...])

        def run(states_lf):
            B = states_lf.shape[-1]
            assert B % BLOCK == 0
            nb = B // BLOCK
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(states_lf.shape,
                                               jnp.uint32),
                in_specs=[
                    pl.BlockSpec((12, NLIMB, BLOCK), lambda i: (0, 0, i)),
                    pl.BlockSpec((96, 192), lambda i: (0, 0)),
                    pl.BlockSpec((96, 192), lambda i: (0, 0)),
                    pl.BlockSpec((96, 192), lambda i: (0, 0)),
                    pl.BlockSpec((rounds, 12, NLIMB), lambda i: (0, 0, 0)),
                    pl.BlockSpec((NLIMB, 1), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((12, NLIMB, BLOCK),
                                       lambda i: (0, 0, i)),
                grid=(nb,),
                interpret=interpret,
            )(states_lf,
              jnp.asarray(w0, dtype=jnp.bfloat16),
              jnp.asarray(w1, dtype=jnp.bfloat16),
              jnp.asarray(w2, dtype=jnp.bfloat16),
              jnp.asarray(rc_np), jnp.asarray(_P_COMPL))

        return run

    def kernel(s_ref, mds_ref, rc_ref, pc_ref, o_ref):
        mds = mds_ref[...]
        pcompl = pc_ref[...]

        # fori_loop over rounds keeps the Mosaic program ~27x smaller
        # than a Python unroll, which keeps per-shape compiles tolerable
        # (the prover instantiates this kernel for many batch shapes).
        def body(r, s):
            s3 = _cube_lf(s, pcompl, jnp)
            rc_r = rc_ref[pl.ds(r, 1)][0]
            return _mds_rc_lf(s3, mds, rc_r, pcompl, jnp)

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, s_ref[...])

    # MDS pre-broadcast over the lane axis (see _mds_rc_lf docstring).
    mds_b = _np.ascontiguousarray(
        _np.broadcast_to(mds_np[:, :, :, None], mds_np.shape + (BLOCK,)))

    def run(states_lf):
        B = states_lf.shape[-1]
        assert B % BLOCK == 0
        nb = B // BLOCK
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(states_lf.shape, jnp.uint32),
            in_specs=[
                pl.BlockSpec((12, NLIMB, BLOCK), lambda i: (0, 0, i)),
                pl.BlockSpec((12, 12, NLIMB, BLOCK),
                             lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((rounds, 12, NLIMB), lambda i: (0, 0, 0)),
                pl.BlockSpec((NLIMB, 1), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((12, NLIMB, BLOCK), lambda i: (0, 0, i)),
            grid=(nb,),
            interpret=interpret,
        )(states_lf, jnp.asarray(mds_b), jnp.asarray(rc_np),
          jnp.asarray(_P_COMPL))

    return run


def enabled() -> bool:
    """Pallas permutation is used on the TPU backend unless disabled."""
    if os.environ.get("ZKL_NO_PALLAS_POSEIDON"):
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


MIN_BATCH = 2048     # below this the XLA scan path wins (a fresh Mosaic
                     # compile per batch shape costs minutes over the
                     # tunnel; tiny tree-top levels don't repay it)

_FORCE = False


def force_pallas():
    """Context: route EVERY permutation through the Pallas kernel while
    tracing (batches pad up to BLOCK).  Used by graphs with many small
    permutation sites (the fused FRI chain's ~200 tree-level merges):
    each XLA scan instance bloats the program and its device compile,
    while Pallas shapes dedupe to a handful of fast Mosaic compiles
    (~3 s each with the MXU MDS)."""
    from contextlib import contextmanager

    @contextmanager
    def cm():
        global _FORCE
        prev = _FORCE
        _FORCE = True
        try:
            yield
        finally:
            _FORCE = prev

    return cm()


def worthwhile(batch: int) -> bool:
    """Whether the fused kernel should handle this batch size."""
    return _FORCE or batch >= MIN_BATCH


def permute12(states, suite_id: bytes, rounds: int,
              interpret: bool = False):
    """(..., 12, 8) uint32 limb states -> full Poseidon2 permutation.

    Drop-in replacement for the scan path of permute12_batch: flattens
    the batch, transposes to limbs-first, pads the batch to a BLOCK
    multiple, runs the fused kernel, and restores the caller's layout.
    """
    import jax.numpy as jnp

    lead = states.shape[:-2]
    B = 1
    for d in lead:
        B = B * d
    flat = states.reshape((B, 12, NLIMB))
    Bp = -(-B // BLOCK) * BLOCK
    if Bp != B:
        flat = jnp.pad(flat, [(0, Bp - B), (0, 0), (0, 0)])
    lf = jnp.transpose(flat, (1, 2, 0))                  # (12, 8, Bp)
    out = _permute_fn(bytes(suite_id), rounds, interpret,
                      mxu_mds=_use_mxu_mds())(lf)
    res = jnp.transpose(out, (2, 0, 1))[:B]
    return res.reshape(lead + (12, NLIMB))
