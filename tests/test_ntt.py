"""NTT / iNTT / coset LDE tests against naive Horner evaluation."""

import random

import numpy as np

from zklisp_tpu.field import f128, limb, ntt


def test_ntt_matches_naive():
    rng = random.Random(10)
    for log_n in (0, 1, 2, 4, 6):
        n = 1 << log_n
        coeffs = [rng.randrange(f128.P) for _ in range(n)]
        evals = list(limb.to_ints(ntt.ntt(limb.from_ints(coeffs), np)))
        w = f128.get_root_of_unity(n) if n > 1 else 1
        for i in range(n):
            assert evals[i] == ntt.eval_poly_at(coeffs, pow(w, i, f128.P))


def test_intt_roundtrip():
    rng = random.Random(11)
    for log_n in (1, 3, 7):
        n = 1 << log_n
        coeffs = [rng.randrange(f128.P) for _ in range(n)]
        evals = ntt.ntt(limb.from_ints(coeffs), np)
        back = list(limb.to_ints(ntt.intt(evals, np)))
        assert back == coeffs


def test_coset_lde_matches_naive():
    rng = random.Random(12)
    n, blowup = 8, 4
    coeffs = [rng.randrange(f128.P) for _ in range(n)]
    ev = list(limb.to_ints(
        ntt.coset_evaluate(limb.from_ints(coeffs), blowup, np)))
    N = n * blowup
    wN = f128.get_root_of_unity(N)
    for i in range(N):
        x = f128.mul(ntt.DEFAULT_COSET_OFFSET, pow(wN, i, f128.P))
        assert ev[i] == ntt.eval_poly_at(coeffs, x)


def test_coset_interpolate_inverts():
    rng = random.Random(13)
    n, blowup = 8, 4
    coeffs = [rng.randrange(f128.P) for _ in range(n)]
    ev = ntt.coset_evaluate(limb.from_ints(coeffs), blowup, np)
    back = list(limb.to_ints(ntt.coset_interpolate(ev, blowup, np)))
    assert back[:n] == coeffs
    assert all(v == 0 for v in back[n:])


def test_ntt_jax_matches_numpy():
    import jax.numpy as jnp
    rng = random.Random(14)
    n = 64
    coeffs = [rng.randrange(f128.P) for _ in range(n)]
    a = limb.from_ints(coeffs)
    ev_np = list(limb.to_ints(ntt.ntt(a, np)))
    ev_j = list(limb.to_ints(np.asarray(ntt.ntt(jnp.asarray(a), jnp))))
    assert ev_np == ev_j
