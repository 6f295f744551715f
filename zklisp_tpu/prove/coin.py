"""Fiat-Shamir random coin over the Poseidon hasher.

Models winterfell's `DefaultRandomCoin<PoseidonHasher>` exactly as the
reference's FS replay assumes (src/agg/fs.rs treats its sequence as the
spec):

  * seed = hash_elements(seed_elements)
  * reseed(digest): seed = merge(seed, digest); counter = 0
  * draw(): counter += 1; digest = merge_with_int(seed, counter);
    candidate = first 16 LE bytes as u128; retry until < p
  * draw_integers(n, domain_size, nonce): seed = merge_with_int(seed,
    nonce) then draw n masked u64 values
  * check_leading_zeros(nonce): trailing zeros of LE u64 head of
    merge_with_int(seed, nonce)

Draws do not mutate the seed — only `reseed` does — which is why the
reference can skip constraint-coefficient draws when replaying the
transcript.
"""

from __future__ import annotations

from typing import List, Sequence

from ..crypto import poseidon as pos
from ..field import f128


class RandomCoin:
    def __init__(self, seed_elements: Sequence[int]) -> None:
        self.seed = pos.hash_elements(list(seed_elements))
        self.counter = 0

    def reseed(self, digest: bytes) -> None:
        assert len(digest) == 32
        self.seed = pos.merge(self.seed, digest)
        self.counter = 0

    def draw(self) -> int:
        """Draw a base-field element."""
        for _ in range(1000):
            self.counter += 1
            digest = pos.merge_with_int(self.seed, self.counter)
            value = int.from_bytes(digest[0:16], "little")
            if value < f128.P:
                return value
        raise RuntimeError("failed to draw a valid field element")

    def draw_many(self, n: int) -> List[int]:
        """n draws; identical to n draw() calls.

        Vectorized through the batched numpy sponge: each draw is one
        merge_with_int(seed, counter) permutation, and the candidate
        value (first 16 digest bytes) IS the lane-0 field element, which
        is always canonical (< p) — the scalar retry loop can never
        trigger — so the batch is exact.  ~100x faster for the ~700
        coefficient draws per segment.
        """
        if n < 8:
            return [self.draw() for _ in range(n)]
        import numpy as np

        from ..crypto import poseidon_jax as pj
        from ..field import f128, limb

        seed_fe = f128.fold_bytes32_to_fe(self.seed)
        seed_limbs = limb.from_ints([seed_fe])
        counters = np.arange(self.counter + 1, self.counter + n + 1,
                             dtype=np.uint64)
        chunk1 = limb.from_u64(counters, np)
        chunk0 = np.broadcast_to(seed_limbs[None, 0], (n, limb.NLIMB))
        fes = np.stack([chunk0, chunk1], axis=1)
        out = pj.sponge_fes(fes, b"zkl/winter/hash/merge_with_int", np)
        self.counter += n
        return [int(v) for v in limb.to_ints(out)]

    def draw_integers(self, num_values: int, domain_size: int,
                      nonce: int) -> List[int]:
        assert domain_size & (domain_size - 1) == 0
        self.seed = pos.merge_with_int(self.seed, nonce)
        self.counter = 0
        v_mask = domain_size - 1
        values: List[int] = []
        for _ in range(1000):
            if len(values) >= num_values:
                break
            self.counter += 1
            digest = pos.merge_with_int(self.seed, self.counter)
            value = int.from_bytes(digest[0:8], "little") & v_mask
            values.append(value)
        if len(values) < num_values:
            raise RuntimeError("failed to draw enough query positions")
        return values

    @staticmethod
    def grind_many(coins: List["RandomCoin"],
                   grinding_factor: int) -> List[int]:
        """Batched grind() across independent coins.

        Each coin's PoW search is independent, so a wave of S segments
        scans all S seeds in one device dispatch per 2^16-nonce sweep
        (kernels.grind_hit_many_fn) instead of ~1.6 sequential
        round-trips per segment.  Identical results to per-coin grind()
        (smallest passing nonce per seed).  Falls back to scalar grind
        off-device or for a single coin."""
        if grinding_factor <= 0:
            return [0] * len(coins)
        import os
        on_device = os.environ.get("ZKL_DEVICE", "").lower() in (
            "jax", "tpu")
        if not on_device or len(coins) == 1 or grinding_factor > 32:
            return [c.grind(grinding_factor) for c in coins]
        import numpy as np

        import jax.numpy as jnp

        from ..field import f128, limb
        from . import kernels

        seeds = limb.from_ints(
            [f128.fold_bytes32_to_fe(c.seed) for c in coins])
        seeds_dev = jnp.asarray(seeds)
        fn = kernels.grind_hit_many_fn(len(coins), 1 << 16,
                                       grinding_factor)
        nonces: List[int | None] = [None] * len(coins)
        batch = 1 << 16
        start = 0
        while any(v is None for v in nonces) and start < (1 << 62):
            hits = np.asarray(fn(seeds_dev,
                                 (jnp.uint32(start & 0xFFFFFFFF),
                                  jnp.uint32(start >> 32))))
            for i, h in enumerate(hits):
                if nonces[i] is None and int(h) < batch:
                    nonces[i] = start + int(h)
            start += batch
        return [int(v) for v in nonces]

    def check_leading_zeros(self, nonce: int) -> int:
        digest = pos.merge_with_int(self.seed, nonce)
        head = int.from_bytes(digest[0:8], "little")
        if head == 0:
            return 64
        return (head & -head).bit_length() - 1

    def grind(self, grinding_factor: int) -> int:
        """Find the smallest nonce whose check_leading_zeros >=
        grinding_factor.

        The search is an embarrassingly parallel Poseidon scan (one
        permutation per candidate), so it runs through the batched
        numpy sponge: merge_with_int(seed, v) absorbs exactly two
        chunks — fold(seed) and v — and the pass/fail test is
        `low 64 bits of the digest ≡ 0 (mod 2^g)`.  ~100x faster than
        the scalar loop at grind=16 (a per-segment hot spot).
        """
        if grinding_factor <= 0:
            return 0
        import os

        import numpy as np

        from ..crypto import poseidon_jax as pj
        from ..field import f128, limb

        on_device = os.environ.get("ZKL_DEVICE", "").lower() in (
            "jax", "tpu")
        seed_fe = f128.fold_bytes32_to_fe(self.seed)
        seed_limbs = limb.from_ints([seed_fe])          # (1, 8)
        mask = (1 << grinding_factor) - 1
        if on_device:
            batch = 1 << 16
        else:
            batch = max(4096, 2 << grinding_factor) \
                if grinding_factor < 14 else 1 << 15
        start = 0
        while start < (1 << 62):
            if on_device and grinding_factor <= 32:
                # device-side hit test: one int32 crosses back instead
                # of the (B, 4) word block
                from . import kernels
                import jax.numpy as jnp
                hit = int(kernels.grind_hit_fn(batch, grinding_factor)(
                    jnp.asarray(seed_limbs[0]),
                    (jnp.uint32(start & 0xFFFFFFFF),
                     jnp.uint32(start >> 32))))
                if hit < batch:
                    return start + hit
                start += batch
                continue
            if on_device:
                from . import kernels
                import jax.numpy as jnp
                out = np.asarray(kernels.grind_scan_fn(batch)(
                    jnp.asarray(seed_limbs[0]),
                    (jnp.uint32(start & 0xFFFFFFFF),
                     jnp.uint32(start >> 32))))         # (B, 4)
                out4 = out
            else:
                vs = np.arange(start, start + batch, dtype=np.uint64)
                chunk1 = limb.from_u64(vs, np)          # (B, 8)
                chunk0 = np.broadcast_to(seed_limbs[None, 0],
                                         (batch, limb.NLIMB))
                fes = np.stack([chunk0, chunk1], axis=1)
                out4 = pj.sponge_fes(
                    fes, b"zkl/winter/hash/merge_with_int", np)[:, :4]
            lo = (out4[:, 0].astype(np.uint64)
                  | out4[:, 1].astype(np.uint64) << np.uint64(16)
                  | out4[:, 2].astype(np.uint64) << np.uint64(32)
                  | out4[:, 3].astype(np.uint64) << np.uint64(48))
            hits = np.nonzero((lo & np.uint64(mask)) == 0)[0]
            if hits.size:
                return start + int(hits[0])
            start += batch
        raise RuntimeError("grinding failed to find a nonce")
