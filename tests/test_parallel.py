"""Multi-chip tests on the 8-virtual-device CPU mesh: distributed NTT
(single, batched, coset-LDE forms) and the sharded multi-segment
proving dry run."""

import random

import numpy as np
import pytest

from zklisp_tpu.field import f128, limb, ntt


@pytest.fixture(scope="module")
def mesh8():
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("seg",))


@pytest.mark.parametrize("n", [64, 4096])
def test_sharded_ntt_matches_single_chip(mesh8, n):
    from zklisp_tpu.parallel.ntt_mesh import ntt_sharded
    rng = random.Random(20)
    coeffs = [rng.randrange(f128.P) for _ in range(n)]
    x = limb.from_ints(coeffs)
    exp = list(limb.to_ints(ntt.ntt(x, np)))
    got = list(limb.to_ints(np.asarray(ntt_sharded(x, mesh8))))
    assert got == exp


def test_sharded_ntt_batch(mesh8):
    from zklisp_tpu.parallel.ntt_mesh import ntt_sharded_batch
    rng = random.Random(21)
    B, n = 3, 512
    xs = np.stack([limb.from_ints([rng.randrange(f128.P)
                                   for _ in range(n)]) for _ in range(B)])
    got = np.asarray(ntt_sharded_batch(xs, mesh8))
    for b in range(B):
        exp = list(limb.to_ints(ntt.ntt(xs[b], np)))
        assert list(limb.to_ints(got[b])) == exp


def test_sharded_coset_lde_matches_single_chip(mesh8):
    """The prove_program mesh call site: coset LDE == ntt.coset_evaluate
    per column, at the >=2^12 LDE size the round-1 review asked for."""
    from zklisp_tpu.parallel.ntt_mesh import lde_columns_sharded
    rng = random.Random(22)
    C, n, blowup = 4, 1024, 8                       # N = 8192
    polys = np.stack([limb.from_ints([rng.randrange(f128.P)
                                      for _ in range(n)])
                      for _ in range(C)])
    got = np.asarray(lde_columns_sharded(polys, blowup, mesh8))
    for c in range(C):
        exp = list(limb.to_ints(np.asarray(
            ntt.coset_evaluate(polys[c], blowup, np))))
        assert list(limb.to_ints(got[c])) == exp


@pytest.mark.slow
def test_dryrun_multichip_executes():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_default_wave_width_clamps():
    """HBM-budget wave width: multiple of mesh size, clamped to the
    (mesh-rounded) segment count, >= 1, env-overridable."""
    import os

    from zklisp_tpu.parallel.mesh_prover import default_wave_width

    class FakeMesh:
        def __init__(self, size):
            self.size = size

    # flagship config: 4096-row segments, 219 cols, blowup 16 -> a few
    # segments per wave within the ~9 GB default budget
    w = default_wave_width(FakeMesh(1), 4096, 219, 16, n_seg=16)
    assert 2 <= w <= 16
    # tiny segments: capped by the segment count, not the budget
    assert default_wave_width(FakeMesh(1), 64, 100, 8, n_seg=3) == 3
    # mesh multiple preserved
    w8 = default_wave_width(FakeMesh(8), 64, 100, 8, n_seg=16)
    assert w8 % 8 == 0 and w8 <= 16
    # huge segments: never below one per device
    assert default_wave_width(FakeMesh(1), 1 << 20, 219, 16,
                              n_seg=4) == 1
    os.environ["ZKL_WAVE"] = "5"
    try:
        assert default_wave_width(FakeMesh(1), 4096, 219, 16,
                                  n_seg=16) == 5
    finally:
        del os.environ["ZKL_WAVE"]
