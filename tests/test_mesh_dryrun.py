"""FAST-tier pin for the graded multichip dryrun.

Round-3 regression postmortem: the wave commit row-chunk floor
(mesh_prover.py `chunk = max(4096, ...)`) shipped untested because all
slow-tier mesh tests use N=4096 traces where the floor is invisible,
while the dryrun config (max_segment_rows=64 -> N=512) crashed.  This
test runs __graft_entry__.dryrun_multichip at EXACTLY its real config
on the 8 virtual CPU devices the conftest provides, so any change that
breaks the graded artifact fails the fast tier immediately.
"""

import os

import jax


def test_dryrun_multichip_exact_config():
    assert len(jax.devices()) >= 8, "conftest must provide 8 devices"
    import __graft_entry__ as ge
    # the dryrun reads XLA_FLAGS to decide whether to force the CPU
    # backend; conftest already set both, so this is the same
    # environment the driver uses
    assert "xla_force_host_platform_device_count" in \
        os.environ.get("XLA_FLAGS", "")
    ge.dryrun_multichip(8)


def test_wave_chunk_never_exceeds_rows():
    """The commit row-chunk must be clamped to the LDE row count N for
    every (N, S): a chunk > N makes dynamic_slice_in_dim fail."""
    from zklisp_tpu.parallel.mesh_prover import _commit_row_chunk
    for n in (64, 512, 4096, 1 << 15):
        for blowup in (4, 8, 16):
            N = n * blowup
            for S in (1, 2, 8):
                chunk = _commit_row_chunk(N, S)
                assert 0 < chunk <= N, (n, blowup, S, chunk)


def test_mesh_chain_check_detects_broken_chain():
    """ZKL_MESH_CHAIN's comparison logic (host branch): a doctored
    boundary must raise; an honest chain must not."""
    import numpy as np
    import pytest as _pytest

    from zklisp_tpu.parallel.mesh_prover import _chain_check_mesh
    from zklisp_tpu.trace.build import TraceError

    class P:
        def __init__(self, i, o):
            self.boundary = {"state_in_hash": i, "state_out_hash": o}

    h = [bytes([k] * 32) for k in range(4)]
    good = [P(h[0], h[1]), P(h[1], h[2]), P(h[2], h[3])]
    _chain_check_mesh(good, None)
    bad = [P(h[0], h[1]), P(h[3], h[2]), P(h[2], h[3])]
    with _pytest.raises(TraceError, match="chain"):
        _chain_check_mesh(bad, None)


def test_mesh_chain_check_on_virtual_mesh():
    """The sharded ppermute+psum path on the 8-device CPU mesh."""
    import pytest as _pytest

    from zklisp_tpu.parallel.mesh_prover import (_chain_check_mesh,
                                                 default_mesh)
    from zklisp_tpu.trace.build import TraceError

    class P:
        def __init__(self, i, o):
            self.boundary = {"state_in_hash": i, "state_out_hash": o}

    h = [bytes([k] * 32) for k in range(17)]
    mesh = default_mesh(8)
    good = [P(h[k], h[k + 1]) for k in range(16)]
    _chain_check_mesh(good, mesh)
    bad = list(good)
    bad[9] = P(h[16], h[10])       # break one cross-device boundary
    with _pytest.raises(TraceError, match="chain"):
        _chain_check_mesh(bad, mesh)
