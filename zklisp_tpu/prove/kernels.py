"""Jit-compiled device kernels for the proving hot path.

These are the TPU entry points used by bench.py and __graft_entry__.py:
column-batched trace LDE (iNTT + coset NTT under vmap) and Merkle
commitment (batched Poseidon row hashing + tree build), each traced once
and cached per shape.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as _np

from ..crypto import poseidon_jax as pj
from ..field import f128, limb, ntt


def _jnp():
    import jax.numpy as jnp
    return jnp


@lru_cache(maxsize=None)
def lde_columns_fn(n: int, blowup: int):
    """jitted (C, n, 8) trace columns -> (C, N, 8) LDE evaluations."""
    import jax
    jnp = _jnp()
    N = n * blowup
    pows_f = _np.asarray(ntt.powers_table(N.bit_length() - 1, _np))
    pows_i = _np.asarray(ntt.powers_table(n.bit_length() - 1, _np,
                                          inverse=True))

    def one_col(col):
        poly = ntt.intt(col, jnp, pows_inv=jnp.asarray(pows_i))
        return ntt.coset_evaluate(poly, blowup, jnp,
                                  pows=jnp.asarray(pows_f))

    return jax.jit(jax.vmap(one_col))


def leaf_hash_fn(width: int, partition_size: int):
    """jitted (B, width, 8) rows -> (B, 8) Poseidon leaf digests.

    The traced body bakes the FS-hasher round count
    (ZKL_POSEIDON_HASHER_ROUNDS, resolved inside sponge_fes at trace
    time), so every hash-executable cache keys on it — a process that
    switches the env mid-run must not reuse stale executables."""
    return _leaf_hash_fn(width, partition_size, pj.pos.hasher_rounds())


@lru_cache(maxsize=None)
def _leaf_hash_fn(width: int, partition_size: int, rounds: int):
    import jax
    jnp = _jnp()
    return jax.jit(partial(pj.hash_rows_partitioned,
                           partition_size=partition_size, xp=jnp))


def merkle_levels_fn(n_leaves: int):
    """jitted (n_leaves, 8) digests -> tuple of tree levels."""
    return _merkle_levels_fn(n_leaves, pj.pos.hasher_rounds())


@lru_cache(maxsize=None)
def _merkle_levels_fn(n_leaves: int, rounds: int):
    import jax
    jnp = _jnp()

    def build(leaves):
        return tuple(pj.merkle_tree(leaves, jnp))

    return jax.jit(build)


@lru_cache(maxsize=None)
def permute12_fn():
    import jax
    jnp = _jnp()
    return jax.jit(
        lambda s: pj.permute12_batch(s, pj.pos.HASHER_SUITE_ID, jnp))


def commit_device(rows, partition_size: int):
    """Device commit: rows (B, W, 8) -> (levels, root_fe)."""
    leaves = leaf_hash_fn(rows.shape[1], partition_size)(rows)
    levels = merkle_levels_fn(leaves.shape[0])(leaves)
    return levels


def grind_scan_fn(batch: int):
    return _grind_scan_fn(batch, pj.pos.hasher_rounds())


@lru_cache(maxsize=None)
def _grind_scan_fn(batch: int, rounds: int):
    """Jitted PoW scan: lo-64 digest words for `batch` candidate nonces.

    merge_with_int(seed, v) absorbs two chunks — fold(seed) and v — and
    the grinding test only needs the low 64 bits of the digest, so the
    kernel returns one uint32 pair per candidate; the (tiny) hit test
    runs on host.  One compile per batch size (cached persistently).
    """
    import jax
    jnp = _jnp()
    from ..crypto import poseidon_jax as pj
    from ..field import limb

    def fn(seed_chunk, start):
        # 64-bit candidate = start + i, built from 32-bit halves (the
        # device path avoids 64-bit ints: start is passed as two u32s)
        vs = jnp.arange(batch, dtype=jnp.uint32)
        s_lo, s_hi = start
        lo = vs + s_lo
        carry = (lo < vs).astype(jnp.uint32)
        hi = s_hi + carry
        chunk1 = jnp.stack(
            [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16]
            + [jnp.zeros_like(lo)] * 4, axis=-1)         # (B, 8)
        chunk0 = jnp.broadcast_to(seed_chunk[None], (batch, limb.NLIMB))
        fes = jnp.stack([chunk0, chunk1], axis=1)        # (B, 2, 8)
        out = pj.sponge_fes(fes, b"zkl/winter/hash/merge_with_int", jnp)
        return out[:, :4]                                # (B, 4) 16-bit limbs

    return jax.jit(fn, static_argnums=())


def grind_hit_fn(batch: int, grinding_factor: int):
    return _grind_hit_fn(batch, grinding_factor, pj.pos.hasher_rounds())


@lru_cache(maxsize=None)
def _grind_hit_fn(batch: int, grinding_factor: int, rounds: int):
    """Jitted PoW scan returning only the FIRST hit index (or `batch`).

    Same Poseidon scan as grind_scan_fn, but the pass test (low 64
    digest bits ≡ 0 mod 2^g) runs on device and a single int32 crosses
    back — the (B, 4) word transfer costs ~0.2 s per segment over a
    tunneled device."""
    import jax
    jnp = _jnp()
    assert 0 < grinding_factor <= 32
    scan = grind_scan_fn(batch)
    mask = jnp.uint32((1 << grinding_factor) - 1)

    def fn(seed_chunk, start):
        out4 = scan(seed_chunk, start)                   # (B, 4) u16 limbs
        lo32 = out4[:, 0] | (out4[:, 1] << 16)
        ok = (lo32 & mask) == 0
        idx = jnp.where(ok, jnp.arange(batch, dtype=jnp.int32),
                        jnp.int32(batch))
        return jnp.min(idx)

    return jax.jit(fn)


def grind_hit_many_fn(n_seeds: int, batch: int, grinding_factor: int):
    return _grind_hit_many_fn(n_seeds, batch, grinding_factor,
                              pj.pos.hasher_rounds())


@lru_cache(maxsize=None)
def _grind_hit_many_fn(n_seeds: int, batch: int, grinding_factor: int,
                       rounds: int):
    """grind_hit_fn vmapped over independent coin seeds.

    A wave proves S segments whose PoW searches are independent (each
    segment's coin seed differs); scanning all S seeds in ONE dispatch
    replaces ~1.6 sequential round-trips per segment with ~1.6 per
    wave.  Returns (n_seeds,) int32 first-hit indices (batch = miss)."""
    import jax
    jnp = _jnp()
    assert 0 < grinding_factor <= 32
    scan = grind_scan_fn(batch)
    mask = jnp.uint32((1 << grinding_factor) - 1)

    def one(seed_chunk, start):
        out4 = scan(seed_chunk, start)
        lo32 = out4[:, 0] | (out4[:, 1] << 16)
        ok = (lo32 & mask) == 0
        idx = jnp.where(ok, jnp.arange(batch, dtype=jnp.int32),
                        jnp.int32(batch))
        return jnp.min(idx)

    return jax.jit(jax.vmap(one, in_axes=(0, None)))
