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
        return [self.draw() for _ in range(n)]

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

    def check_leading_zeros(self, nonce: int) -> int:
        digest = pos.merge_with_int(self.seed, nonce)
        head = int.from_bytes(digest[0:8], "little")
        if head == 0:
            return 64
        return (head & -head).bit_length() - 1

    def grind(self, grinding_factor: int) -> int:
        """Find a nonce whose check_leading_zeros >= grinding_factor."""
        nonce = 0
        while True:
            if self.check_leading_zeros(nonce) >= grinding_factor:
                return nonce
            nonce += 1
