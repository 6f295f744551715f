"""Sponge absorb/squeeze tests — repo analog of the reference's
zk-lisp-proof-winterfell/tests/sponge.rs (431 LoC).

Covers: hash2 sugar e2e, multi-level chunked absorbs (2+3+5 = rate 10)
squeezed into one digest bound via FM_VM_EXPECT, rate overflow
rejection, absorb-N semantics vs the host sponge reference for
N in {0, 2, 10}, VM-only vs VM+sponge proofs, and the negative
vm_expected mismatch.
"""

import pytest

from zklisp_tpu.compiler import builder as B, compile_entry, ops as O
from zklisp_tpu.core.pi import (FM_POSEIDON, FM_SPONGE, FM_VM,
                                FM_VM_EXPECT, PublicInputs,
                                PublicInputsBuilder, VmArg)
from zklisp_tpu.crypto import poseidon as pos
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions
from zklisp_tpu.trace import build as tb, schedule
from zklisp_tpu.trace.layout import NR, STEPS_PER_LEVEL_P2

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0)


def mkprog(ops):
    b = B.ProgramBuilder()
    for op in ops:
        b.push(op)
    return b.finalize(B.CompilerMetrics())


def fe_to_bytes32(v: int) -> bytes:
    return int(v).to_bytes(16, "little") + b"\x00" * 16


def prove_verify(prog, pi):
    steps = prover.prove_program(prog, pi, OPTS)
    assert steps
    for s in steps:
        prover.verify_step(s)
    return steps


def test_sponge_basic_hash2_prove_verify():
    """sponge.rs:90 — hash2 sugar (SAbsorbN(2) + SSqueeze) e2e."""
    prog = compile_entry("(def (main) (let ((x 1) (y 2)) (hash2 x y)))",
                         [])
    pi = PublicInputsBuilder(prog).build()
    prove_verify(prog, pi)


def test_sponge_multiple_absorbs_then_squeeze_expect_ok():
    """sponge.rs:116 — absorbs chunked across levels (2+3+5) fill the
    full rate 10; SSqueeze permutes once over all pending values; the
    digest is bound into the proof via FM_VM_EXPECT."""
    ops = [O.Const(r, r + 1) for r in range(NR)]
    ops += [O.Const(0, 9), O.Const(1, 10)]
    ops += [O.SAbsorbN((0, 1)), O.SAbsorbN((2, 3, 4)),
            O.SAbsorbN((5, 6, 7, 0, 1)), O.SSqueeze(0), O.End()]
    prog = mkprog(ops)

    expected_inputs = [9, 10, 3, 4, 5, 6, 7, 8, 9, 10]
    expected = pos.sponge_absorb(expected_inputs, prog.program_id)

    lvl_ssq = 8 + 2 + 3
    out_row = lvl_ssq * STEPS_PER_LEVEL_P2 + schedule.pos_final() + 1
    pi = PublicInputsBuilder(prog).build()
    pi.vm_out_reg = 0
    pi.vm_out_row = out_row
    pi.vm_expected_bytes = fe_to_bytes32(expected)
    pi.feature_mask = FM_VM | FM_POSEIDON | FM_SPONGE | FM_VM_EXPECT

    trace = tb.build_trace(prog, pi)
    assert trace.get(0, out_row) == expected or True  # lane check below
    from zklisp_tpu.trace.layout import Columns
    assert trace.get(Columns.baseline().r_index(0), out_row) == expected

    prove_verify(prog, pi)


def test_sponge_overflow_more_than_10_inputs_errors():
    """sponge.rs:195 — more than rate-10 pending absorbs must be a
    trace-build error, not silent truncation."""
    ops = [O.Const(r, r + 1) for r in range(NR)]
    for regs in [(0, 1), (2, 3), (4, 5), (6, 7), (0, 1), (2, 3)]:
        ops.append(O.SAbsorbN(regs))
    ops += [O.SSqueeze(0), O.End()]
    prog = mkprog(ops)
    with pytest.raises(Exception):
        tb.build_trace(prog, PublicInputs())


@pytest.mark.parametrize("n_inputs", [0, 2, 10])
def test_sponge_absorb_n_matches_host_reference(n_inputs):
    """vm/trace/poseidon.rs:97-259 tier — the squeezed digest equals
    the host sponge reference for N in {0, 2, 10} absorbed values.

    SAbsorbN buffers register INDICES; their VALUES are read at
    SQUEEZE time (vm/trace/vm.rs:577-582 `inputs.push(regs[idx])`),
    so the rate-10 case's recycled r0/r1 contribute their FINAL
    values in every pending slot."""
    vals = [3 * i + 1 for i in range(n_inputs)]
    ops = []
    for i, v in enumerate(vals[:NR]):
        ops.append(O.Const(i, v))
    # rate 10 needs two extra values recycled through r0/r1
    if n_inputs == 10:
        ops += [O.SAbsorbN(tuple(range(8)))]
        ops += [O.Const(0, vals[8]), O.Const(1, vals[9])]
        ops += [O.SAbsorbN((0, 1))]
        # pending indices [0..7, 0, 1] resolved at squeeze time, when
        # r0/r1 already hold vals[8]/vals[9]
        absorbed = ([vals[8], vals[9]] + vals[2:8]
                    + [vals[8], vals[9]])
    elif n_inputs > 0:
        ops += [O.SAbsorbN(tuple(range(n_inputs)))]
        absorbed = vals
    else:
        absorbed = []
    ops += [O.SSqueeze(0), O.End()]
    prog = mkprog(ops)
    pi = PublicInputsBuilder(prog).build()
    trace = tb.build_trace(prog, pi)

    expected = pos.sponge_absorb(absorbed, prog.program_id)
    from zklisp_tpu.trace.layout import Columns
    lvl_ssq = len(ops) - 2
    out_row = lvl_ssq * STEPS_PER_LEVEL_P2 + schedule.pos_final() + 1
    assert trace.get(Columns.baseline().r_index(0), out_row) == expected


def test_vm_only_vs_vm_plus_sponge_both_verify():
    """sponge.rs:226 — a pure-ALU program and a sponge program both
    prove/verify under the same options (feature-mask trimming)."""
    vm_prog = compile_entry(
        "(def (main) (let ((x 7) (y 9)) (+ (* x y) x)))", [])
    prove_verify(vm_prog, PublicInputsBuilder(vm_prog).build())

    sp_prog = compile_entry(
        "(def (main) (hash2 7 9))", [])
    prove_verify(sp_prog, PublicInputsBuilder(sp_prog).build())


def test_negative_vm_expected_mismatch():
    """sponge.rs:307 — binding the WRONG expected digest must make the
    proof unverifiable (the FM_VM_EXPECT assertion binds the cell)."""
    prog = compile_entry("(def (main) (hash2 1 2))", [])
    from zklisp_tpu import frontend
    pi0 = PublicInputsBuilder(prog).build()
    out = frontend.run_vm(prog, pi0)

    pi = PublicInputsBuilder(prog).with_expect(
        fe_to_bytes32((out.value + 1) % (2**128 - 45 * 2**40 + 1))).build()
    pi.vm_out_reg = out.out_reg
    pi.vm_out_row = out.out_row
    with pytest.raises(Exception):
        steps = prover.prove_program(prog, pi, OPTS)
        for s in steps:
            prover.verify_step(s)
