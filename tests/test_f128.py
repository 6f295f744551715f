"""f128 field tests: scalar host reference vs limb backends (numpy & JAX)."""

import random

import numpy as np
import pytest

from zklisp_tpu.field import f128, limb


@pytest.fixture(scope="module")
def samples():
    rng = random.Random(0xF128)
    edge = [0, 1, 2, 3, f128.P - 1, f128.P - 2, f128.POW2_64,
            (1 << 64) - 1, 1 << 127]
    rand = [rng.randrange(f128.P) for _ in range(300)]
    return edge + rand


def test_field_constants():
    assert f128.P == 340282366920938463463374557953744961537
    assert (f128.P - 1) % (1 << 40) == 0
    w = f128.ROOT_OF_UNITY
    assert pow(w, 1 << 40, f128.P) == 1
    assert pow(w, 1 << 39, f128.P) != 1


def test_generator_order():
    # 3 must generate the full multiplicative group: it must not be a
    # quadratic residue and must have order divisible by 2^40.
    assert pow(3, (f128.P - 1) // 2, f128.P) == f128.P - 1


def test_scalar_ops(samples):
    for a, b in zip(samples, reversed(samples)):
        assert f128.add(a, b) == (a + b) % f128.P
        assert f128.sub(a, b) == (a - b) % f128.P
        assert f128.mul(a, b) == (a * b) % f128.P
        if a:
            assert f128.mul(a, f128.inv(a)) == 1


def test_batch_inv(samples):
    xs = samples[:64]
    got = f128.batch_inv(xs)
    for x, g in zip(xs, got):
        assert g == (0 if x == 0 else f128.inv(x))


def test_limb_numpy_matches_scalar(samples):
    a_int = samples
    b_int = list(reversed(samples))
    a = limb.from_ints(a_int)
    b = limb.from_ints(b_int)
    assert list(limb.to_ints(limb.add(a, b, np))) == [
        f128.add(x, y) for x, y in zip(a_int, b_int)]
    assert list(limb.to_ints(limb.sub(a, b, np))) == [
        f128.sub(x, y) for x, y in zip(a_int, b_int)]
    assert list(limb.to_ints(limb.mul(a, b, np))) == [
        f128.mul(x, y) for x, y in zip(a_int, b_int)]
    assert list(limb.to_ints(limb.neg(a, np))) == [
        f128.neg(x) for x in a_int]


def test_limb_inv_and_batch(samples):
    xs = samples[:40]
    a = limb.from_ints(xs)
    expect = [0 if x == 0 else f128.inv(x) for x in xs]
    assert list(limb.to_ints(limb.inv(a, np))) == expect
    assert list(limb.to_ints(limb.batch_inv(a, np))) == expect


def test_limb_jax_matches_numpy(samples):
    import jax
    import jax.numpy as jnp

    a_int = samples[:128]
    b_int = list(reversed(samples))[:128]
    a = jnp.asarray(limb.from_ints(a_int))
    b = jnp.asarray(limb.from_ints(b_int))

    mul_j = jax.jit(lambda x, y: limb.mul(x, y, jnp))
    add_j = jax.jit(lambda x, y: limb.add(x, y, jnp))
    got_mul = limb.to_ints(np.asarray(mul_j(a, b)))
    got_add = limb.to_ints(np.asarray(add_j(a, b)))
    assert list(got_mul) == [f128.mul(x, y) for x, y in zip(a_int, b_int)]
    assert list(got_add) == [f128.add(x, y) for x, y in zip(a_int, b_int)]


def test_encodings():
    b32 = bytes(range(32))
    lo = int.from_bytes(b32[0:16], "little")
    hi = int.from_bytes(b32[16:32], "little")
    assert f128.fold_bytes32_to_fe(b32) == (lo + hi * f128.POW2_64) % f128.P
    x = 0x1234567890ABCDEF
    assert f128.fe_to_bytes_fold(x)[:16] == x.to_bytes(16, "little")
    assert f128.fe_from_bytes_fold(f128.fe_to_bytes_fold(x)) == x
    assert f128.be_from_le8(b32) == (
        int.from_bytes(b32[0:8], "little")
        + int.from_bytes(b32[8:16], "little") * f128.POW2_64) % f128.P


def test_batch_inv_tree_and_scan_inv():
    """Tree batch inverse + scan-graph Fermat inverse (device helpers)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(16), "little") % f128.P
            for _ in range(8)]
    vals[2] = 0                                    # zero maps to zero
    a = limb.from_ints(vals)
    want = [pow(v, f128.P - 2, f128.P) if v else 0 for v in vals]
    for xp, arr in ((np, a), (jnp, jnp.asarray(a))):
        got = [int(v) for v in
               limb.to_ints(np.asarray(limb.batch_inv_tree(arr, xp)))]
        assert got == want
        got1 = [int(v) for v in
                limb.to_ints(np.asarray(limb.inv(arr, xp)))]
        assert got1 == want
    # n = 1 edge case
    one = limb.from_ints([vals[0]])
    got = limb.to_ints(limb.batch_inv_tree(one, np))
    assert int(got[0]) == want[0]
    # sum_mod vs reference
    rows = np.stack([limb.from_ints(vals), limb.from_ints(vals[::-1])])
    s = limb.to_ints(limb.sum_mod(rows, 1, np))
    assert [int(v) for v in s] == [sum(vals) % f128.P] * 2
    sj = limb.to_ints(np.asarray(limb.sum_mod(jnp.asarray(rows), 1, jnp)))
    assert [int(v) for v in sj] == [sum(vals) % f128.P] * 2
