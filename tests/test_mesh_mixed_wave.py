"""FAST-tier byte-equality pin for MIXED-STRUCTURE waves.

Segment 0 carries one extra boundary assertion group (the pc_init==0
pi_prog binding, air/zk_air.py) and previously always proved in its own
padded wave.  _SegPrep.exec_key now groups segments by executable SHAPE
(bucketed group counts) and feeds group indices/divisors/values as
per-segment vmapped data, so segment 0 shares a wave with the rest —
one wave fewer per program.  This pin proves a 4-segment program at
dryrun-scale shapes through one W=4 mixed wave and asserts the steps
are byte-identical to the serial single-device path.
"""

import os

import pytest

from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions

SRC = (
    "(def (main a b)\n"
    "  (loop :max 6 ((i 0) (x a) (y b))\n"
    "    x\n"
    "    (recur (+ i 1) y (+ x y))))\n"
)

# 4 segments of 2 levels each (64 rows), N=512 at blowup 8 — the
# dryrun's tiny-shape regime, seconds to compile on the CPU backend
OPTS = ProverOptions(queries=4, blowup=8, grind=0, min_security_bits=0,
                     max_segment_rows=64)


@pytest.fixture(scope="module")
def program_pi():
    prog = compile_entry(SRC, [1, 1])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(1), VmArg.u64(1)])
          .build())
    return prog, pi


def test_mixed_structure_wave_byte_identical(program_pi):
    from zklisp_tpu.parallel.mesh_prover import (_SegPrep, default_mesh,
                                                 prove_program_mesh)
    prog, pi = program_pi

    os.environ["ZKL_DEVICE"] = "jax"
    os.environ["ZKL_WAVE"] = "0"
    try:
        serial = prover.prove_program(prog, pi, OPTS)
    finally:
        del os.environ["ZKL_DEVICE"]
        del os.environ["ZKL_WAVE"]
    assert len(serial) == 4

    os.environ["ZKL_DEVICE"] = "jax"
    try:
        steps = prove_program_mesh(prog, pi, OPTS, mesh=default_mesh(1),
                                   wave=4)
    finally:
        del os.environ["ZKL_DEVICE"]
    for wave_s, single_s in zip(steps, serial):
        assert wave_s.to_bytes() == single_s.to_bytes()


def test_exec_key_groups_all_segments(program_pi):
    """Segment 0's extra assertion group must NOT split the wave: all
    segments of one program share one exec_key (but their exact
    structure_keys differ)."""
    from zklisp_tpu.prove import planner
    from zklisp_tpu.trace import build as tb
    from zklisp_tpu.parallel.mesh_prover import _SegPrep

    prog, pi = program_pi
    base_opts = OPTS.to_proof_options()
    segs = planner.plan_segments(prog, pi, OPTS)
    full = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    preps = [_SegPrep(i, len(segs), s, full, prog, pi, base_opts, 0,
                      pi.program_id, rom_acc)
             for i, s in enumerate(segs)]
    assert len({p.exec_key() for p in preps}) == 1
    assert len({p.structure_key() for p in preps}) >= 2


def test_wave_grind_batched_byte_identical(program_pi):
    """grind>0 through the wave path: the batched multi-seed PoW scan
    (RandomCoin.grind_many, one dispatch per nonce sweep for the whole
    wave) must yield the same smallest nonce per segment as the serial
    per-coin grind — proof bytes identical to the serial device path."""
    from zklisp_tpu.parallel.mesh_prover import (default_mesh,
                                                 prove_program_mesh)
    prog, pi = program_pi
    opts_g = ProverOptions(queries=4, blowup=8, grind=6,
                           min_security_bits=0, max_segment_rows=64)

    os.environ["ZKL_DEVICE"] = "jax"
    os.environ["ZKL_WAVE"] = "0"
    try:
        serial = prover.prove_program(prog, pi, opts_g)
    finally:
        del os.environ["ZKL_DEVICE"]
        del os.environ["ZKL_WAVE"]

    os.environ["ZKL_DEVICE"] = "jax"
    try:
        steps = prove_program_mesh(prog, pi, opts_g,
                                   mesh=default_mesh(1), wave=4)
    finally:
        del os.environ["ZKL_DEVICE"]
    for wave_s, single_s in zip(steps, serial):
        assert wave_s.to_bytes() == single_s.to_bytes()


def test_grind_many_matches_scalar():
    """grind_many == per-coin grind for a batch of distinct seeds."""
    import os as _os

    from zklisp_tpu.prove.coin import RandomCoin

    coins = [RandomCoin([i + 1, 7 * i + 3]) for i in range(4)]
    ref = [RandomCoin([i + 1, 7 * i + 3]).grind(8) for i in range(4)]
    _os.environ["ZKL_DEVICE"] = "jax"
    try:
        got = RandomCoin.grind_many(coins, 8)
    finally:
        del _os.environ["ZKL_DEVICE"]
    assert got == ref
