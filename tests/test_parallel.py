"""Multi-chip tests on the 8-virtual-device CPU mesh: distributed NTT
and the sharded multi-segment proving dry run."""

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


def test_sharded_ntt_matches_single_chip(mesh8):
    from zklisp_tpu.parallel.ntt_mesh import ntt_sharded
    rng = random.Random(20)
    n = 64
    coeffs = [rng.randrange(f128.P) for _ in range(n)]
    x = limb.from_ints(coeffs)
    exp = list(limb.to_ints(ntt.ntt(x, np)))
    got = list(limb.to_ints(np.asarray(ntt_sharded(x, mesh8))))
    assert got == exp


def test_dryrun_multichip_executes():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
