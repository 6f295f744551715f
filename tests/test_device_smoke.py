"""FAST-tier smoke for the jit-staged device prover.

The full byte-equality matrix lives in tests/test_device_prover.py
(slow tier).  Round-3 postmortem: the fast tier never executed
stark_device.py at all, so staged-prover regressions only surfaced in
40-minute slow runs.  This smoke proves a minimal 2-level program at
tiny shapes (blowup=8, q=4 — compiles in seconds on CPU, and the
persistent .jax_cache makes repeat runs near-free) and asserts the
device proof is byte-identical to the host proof.
"""

import numpy as np

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove.formats import serialize_stark_proof
from zklisp_tpu.prove.params import ProofOptions
from zklisp_tpu.prove.stark import prove_trace, verify_trace
from zklisp_tpu.trace import build as tb


def test_device_smoke_byte_identical():
    from zklisp_tpu.prove.stark_device import prove_trace_device

    prog = compile_entry("(def (main a b) (+ (* a a) b))", [3, 4])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(3), VmArg.u64(4)]).build())
    trace = tb.build_trace(prog, pi)
    assert trace.length <= 256, "smoke must stay tiny"
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc,
                                    None, None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    # blowup must cover ce_blowup (the quotient column count); 8 is the
    # weakened-options floor used across the e2e tier
    opts = ProofOptions(num_queries=4, blowup=8, grinding_factor=0)

    host = prove_trace(trace, air, air_pi, opts, np)
    dev = prove_trace_device(trace, air, air_pi, opts)
    assert serialize_stark_proof(dev) == serialize_stark_proof(host)
    verify_trace(dev, air_pi)


def test_device_smoke_blowup16_half_domain_composition():
    """blowup=16 > ce_blowup: the device prover evaluates composition
    on the blowup_c=Q sub-domain (half the LDE) — the proof must stay
    byte-identical to the host prover's full-domain evaluation (the
    quotient has degree < Q*n, so both determine the same polynomial)."""
    from zklisp_tpu.prove.stark_device import prove_trace_device

    prog = compile_entry("(def (main a b) (* (+ a b) a))", [5, 6])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(5), VmArg.u64(6)]).build())
    trace = tb.build_trace(prog, pi)
    assert trace.length <= 256
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc,
                                    None, None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    assert air.ce_blowup() < 16, "case must exercise the sub-domain"
    opts = ProofOptions(num_queries=4, blowup=16, grinding_factor=0)

    host = prove_trace(trace, air, air_pi, opts, np)
    dev = prove_trace_device(trace, air, air_pi, opts)
    assert serialize_stark_proof(dev) == serialize_stark_proof(host)
    verify_trace(dev, air_pi)
