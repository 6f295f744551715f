"""End-to-end STARK prove/verify tests (weakened options for speed,
mirroring the reference's tests/recursion_single.rs approach)."""

import numpy as np
import pytest

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import builder as B, ops as O
from zklisp_tpu.core.pi import PublicInputsBuilder
from zklisp_tpu.prove import stark
from zklisp_tpu.prove.params import ProofOptions
from zklisp_tpu.trace import build as tb

OPTS = ProofOptions(num_queries=8, blowup=8, grinding_factor=0)


@pytest.fixture(scope="module")
def proof_bundle():
    b = B.ProgramBuilder()
    for op in [O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()]:
        b.push(op)
    prog = b.finalize(B.CompilerMetrics())
    pi = PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, 0, rom_acc, None, None, tr)
    air = ZkLispAir(tr.width, tr.length, air_pi)
    proof = stark.prove_trace(tr, air, air_pi, OPTS, np)
    return proof, air_pi


def test_roundtrip(proof_bundle):
    proof, air_pi = proof_bundle
    stark.verify_trace(proof, air_pi)


def test_tampered_trace_root_rejected(proof_bundle):
    import copy
    proof, air_pi = proof_bundle
    bad = copy.deepcopy(proof)
    bad.trace_root = bytes([bad.trace_root[0] ^ 1]) + bad.trace_root[1:]
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_tampered_ood_rejected(proof_bundle):
    import copy
    proof, air_pi = proof_bundle
    bad = copy.deepcopy(proof)
    bad.ood_trace_current = list(bad.ood_trace_current)
    bad.ood_trace_current[0] = (bad.ood_trace_current[0] + 1) % stark.P
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_tampered_opening_rejected(proof_bundle):
    import copy
    proof, air_pi = proof_bundle
    bad = copy.deepcopy(proof)
    bad.trace_openings.rows[0][3] = (bad.trace_openings.rows[0][3] + 1) \
        % stark.P
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_tampered_fri_rejected(proof_bundle):
    import copy
    proof, air_pi = proof_bundle
    bad = copy.deepcopy(proof)
    v0, v1 = bad.fri_openings[1].pairs[0]
    bad.fri_openings[1].pairs[0] = ((v0 + 1) % stark.P, v1)
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_wrong_public_inputs_rejected(proof_bundle):
    import copy
    proof, air_pi = proof_bundle
    bad_pi = copy.deepcopy(air_pi)
    bad_pi.pc_init = 5
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(proof, bad_pi)


def test_grinding_enforced(proof_bundle):
    import copy
    proof, air_pi = proof_bundle
    # claim a grinding factor the nonce almost surely does not satisfy
    bad = copy.deepcopy(proof)
    from dataclasses import replace
    bad.context.options = replace(bad.context.options, grinding_factor=30)
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_assertion_grouping():
    # periodic schedule-style pattern groups into one cyclic group
    n = 128
    asserts = [(5, 32 * k, 1) for k in range(4)]
    gs = stark.group_assertions(asserts, n)
    assert len(gs) == 1 and gs[0].offsets == (0,) and not gs[0].is_single
    # multi-offset zeros
    asserts = [(6, 32 * k + o, 0) for k in range(4) for o in range(1, 29)]
    gs = stark.group_assertions(asserts, n)
    assert len(gs) == 1 and len(gs[0].offsets) == 28
    # irregular steps stay single
    asserts = [(7, 0, 9), (7, 50, 9)]
    gs = stark.group_assertions(asserts, n)
    assert len(gs) == 2 and all(g.is_single for g in gs)
