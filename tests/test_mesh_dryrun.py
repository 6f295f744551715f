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
