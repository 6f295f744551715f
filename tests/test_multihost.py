"""FAST-tier pin for the multi-HOST (multi-process) proving path.

parallel/multihost.py is the DCN story: jax.distributed across real
processes, per-process segment shares proved on local meshes, StepProof
bytes allgathered (Gloo on CPU here, DCN on a pod).  The dryrun is the
graded artifact (__graft_entry__.dryrun_multihost); this test runs the
same path at its exact config — 2 real subprocesses x 4 virtual CPU
devices — and relies on run_dryrun_multihost's internal byte-compare
against the single-process mesh prover.
"""

import os

import pytest


def test_dryrun_multihost_exact_config():
    assert "xla_force_host_platform_device_count" in \
        os.environ.get("XLA_FLAGS", "")
    import __graft_entry__ as ge
    ge.dryrun_multihost(2, 4)


def test_allgather_bytes_roundtrip_shapes():
    """encode/decode of the gathered step blobs (pure host, no
    distributed runtime needed)."""
    from zklisp_tpu.parallel.multihost import decode_steps, encode_steps

    class _B:
        def __init__(self, b):
            self._b = b

        def to_bytes(self):
            return self._b

    blobs = [b"", b"x", b"\x00" * 17, bytes(range(256))]
    enc = encode_steps([_B(b) for b in blobs])
    assert decode_steps(enc) == blobs


def test_contiguous_split_covers_all_segments():
    """The per-process contiguous block assignment must partition
    [0, n_seg) exactly for every (n_seg, nproc)."""
    for n_seg in (1, 2, 7, 16, 33):
        for nproc in (1, 2, 3, 8):
            base, rem = divmod(n_seg, nproc)
            counts = [base + (1 if p < rem else 0) for p in range(nproc)]
            starts = [sum(counts[:p]) for p in range(nproc)]
            got = []
            for p in range(nproc):
                got += list(range(starts[p], starts[p] + counts[p]))
            assert got == list(range(n_seg)), (n_seg, nproc)
