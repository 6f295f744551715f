"""Winterfell-compat mode: per-assertion boundary batching.

The reference's composition assigns one coefficient per assertion with a
single (x - g^step) divisor each (winterfell's construction for
Assertion::single — the only kind the reference emits,
vm/air/schedule.rs:63-136).  ZKL_WINTERFELL_COMPAT=1 /
ProofOptions(assertion_batching="per_assertion") switches the prover and
verifier to that construction; this file proves the full roundtrip works
in that mode and that the flag survives serialization.
"""

import copy

import numpy as np
import pytest

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_str
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import stark
from zklisp_tpu.prove.formats import (deserialize_stark_proof,
                                      serialize_stark_proof)
from zklisp_tpu.prove.params import ProofOptions, ProverOptions
from zklisp_tpu.prove.stark import group_assertions
from zklisp_tpu.trace import build as tb

# RAM + sponge workload so the assertion set spans schedule, ROM, RAM
# and register-binding assertions
SRC = """
(def (main)
  (let ((s (secret-arg 0)))
    (store 3 s)
    (push (load 3))
    (hash2 (pop) s)))
(main)
"""

COMPAT = ProofOptions(num_queries=8, blowup=8, grinding_factor=0,
                      assertion_batching="per_assertion")


@pytest.fixture(scope="module")
def bundle():
    prog = compile_str(SRC)
    pi = (PublicInputsBuilder(prog)
          .with_secret_args([VmArg.u64(41)])
          .build())
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc,
                                    None, None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    return trace, air, air_pi


def test_per_assertion_grouping_order(bundle):
    """One group per assertion, in get_assertions() order, all singles."""
    trace, air, air_pi = bundle
    assertions = air.get_assertions()
    groups = group_assertions(assertions, trace.length, per_assertion=True)
    assert len(groups) == len(assertions)
    for g, (col, step, val) in zip(groups, assertions):
        assert g.is_single and g.step == step
        assert g.column == col and g.value == val
    # grouped mode really is different (fewer coefficients)
    grouped = group_assertions(assertions, trace.length)
    assert len(grouped) < len(groups)


@pytest.fixture(scope="module")
def compat_proof(bundle):
    trace, air, air_pi = bundle
    return stark.prove_trace(trace, air, air_pi, COMPAT, np)


def test_compat_roundtrip(compat_proof, bundle):
    _, _, air_pi = bundle
    stark.verify_trace(compat_proof, air_pi)


def test_compat_differs_from_grouped(compat_proof, bundle):
    trace, air, air_pi = bundle
    grouped = stark.prove_trace(
        trace, air, air_pi,
        ProofOptions(num_queries=8, blowup=8, grinding_factor=0), np)
    # different composition => different constraint commitment
    assert grouped.constraint_root != compat_proof.constraint_root
    # and a compat proof must not verify under grouped options
    bad = copy.deepcopy(compat_proof)
    bad.context.options = ProofOptions(num_queries=8, blowup=8,
                                       grinding_factor=0)
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_compat_tamper_rejected(compat_proof, bundle):
    _, _, air_pi = bundle
    bad = copy.deepcopy(compat_proof)
    bad.ood_quotient_current = list(bad.ood_quotient_current)
    bad.ood_quotient_current[0] = (bad.ood_quotient_current[0] + 1) % stark.P
    with pytest.raises(stark.VerifyError):
        stark.verify_trace(bad, air_pi)


def test_compat_flag_survives_serialization(compat_proof, bundle):
    _, _, air_pi = bundle
    data = serialize_stark_proof(compat_proof)
    back = deserialize_stark_proof(data)
    assert back.context.options.per_assertion
    assert serialize_stark_proof(back) == data
    stark.verify_trace(back, air_pi)


def test_env_flag_wires_through_prover_options(monkeypatch):
    monkeypatch.setenv("ZKL_WINTERFELL_COMPAT", "1")
    opts = ProverOptions(queries=8, blowup=8, grind=0)
    assert opts.to_proof_options().per_assertion
    monkeypatch.setenv("ZKL_WINTERFELL_COMPAT", "")
    assert not ProverOptions(queries=8, blowup=8,
                             grind=0).to_proof_options().per_assertion
    assert ProverOptions(queries=8, blowup=8, grind=0,
                         winterfell_compat=True
                         ).to_proof_options().per_assertion


def test_ext_prover_compat_roundtrip():
    """Quadratic-extension prover/verifier honor per-assertion batching
    (>=128-bit aggregation path, stark_ext.py)."""
    from zklisp_tpu.agg import aggregate as agg
    from zklisp_tpu.compiler import builder as B, ops as O
    from zklisp_tpu.prove.params import ProverOptions

    b = B.ProgramBuilder()
    for op in [O.Const(0, 3), O.Const(1, 4), O.Mul(2, 0, 1), O.End()]:
        b.push(op)
    prog = b.finalize(B.CompilerMetrics())
    from zklisp_tpu.core.pi import PublicInputsBuilder
    pi = PublicInputsBuilder(prog).build()
    opts = ProverOptions(queries=33, blowup=16, grind=0,
                         min_security_bits=128, max_segment_rows=128,
                         winterfell_compat=True)
    proof, digest, agg_pi = agg.prove_chain(prog, pi, opts)
    assert proof.context.options.field_extension == 2
    assert proof.context.options.per_assertion
    agg.verify_agg(proof, agg_pi, min_bits=128)


@pytest.mark.slow
def test_device_prover_compat_byte_identical(bundle):
    """The jit-staged device prover honors per-assertion batching and
    stays byte-identical to the host prover in compat mode."""
    trace, air, air_pi = bundle
    from zklisp_tpu.prove.stark_device import prove_trace_device
    host = stark.prove_trace(trace, air, air_pi, COMPAT, np)
    dev = prove_trace_device(trace, air, air_pi, COMPAT)
    assert serialize_stark_proof(dev) == serialize_stark_proof(host)
