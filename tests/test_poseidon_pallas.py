"""Fused Pallas Poseidon permutation vs the host reference path.

Runs the kernel in interpreter mode (the test harness forces the CPU
backend; on TPU the same kernel is compiled by Mosaic), checking exact
limb equality against the host permute12_batch, including batch sizes
that exercise block padding and multi-block grids.
"""

import numpy as np
import pytest

from zklisp_tpu.crypto import poseidon as pos
from zklisp_tpu.crypto import poseidon_jax as pj
from zklisp_tpu.crypto import poseidon_pallas as pp
from zklisp_tpu.field import f128, limb


def _rand_states(b: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vals = [[int.from_bytes(rng.bytes(16), "little") % f128.P
             for _ in range(12)] for _ in range(b)]
    return limb.from_ints(vals)


@pytest.mark.parametrize("batch", [1, 5, pp.BLOCK + 7])
def test_permute12_pallas_matches_host(batch):
    import jax.numpy as jnp

    st = _rand_states(batch, seed=batch)
    ref = pj.permute12_batch(st, pos.HASHER_SUITE_ID, np)
    out = pp.permute12(jnp.asarray(st), pos.HASHER_SUITE_ID,
                       pos.POSEIDON_ROUNDS, interpret=True)
    assert np.array_equal(ref, np.asarray(out))


def test_permute12_pallas_leading_dims():
    import jax.numpy as jnp

    st = _rand_states(6, seed=42).reshape(2, 3, 12, limb.NLIMB)
    ref = pj.permute12_batch(st, pos.HASHER_SUITE_ID, np)
    out = pp.permute12(jnp.asarray(st), pos.HASHER_SUITE_ID,
                       pos.POSEIDON_ROUNDS, interpret=True)
    assert out.shape == st.shape
    assert np.array_equal(ref, np.asarray(out))
