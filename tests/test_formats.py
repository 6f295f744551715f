"""ZKLSTP1 step-proof codec: direct roundtrip + tamper tests (the
reference has tests/step_serialization.rs; round 1 only exercised the
codec incidentally via the fork path)."""

import numpy as np
import pytest

from zklisp_tpu.compiler import compile_str
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.formats import StepProof, serialize_stark_proof
from zklisp_tpu.prove.params import ProverOptions

SRC = """
(def (main a)
  (let ((s (secret-arg 0)))
    (store 1 (+ a s))
    (hash2 (load 1) a)))
(main 5)
"""

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0)


@pytest.fixture(scope="module")
def steps():
    prog = compile_str(SRC)
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(5)])
          .with_secret_args([VmArg.u64(9)])
          .build())
    return prover.prove_program(prog, pi, OPTS), pi


def test_zklstp1_roundtrip(steps):
    stps, _ = steps
    for s in stps:
        data = s.to_bytes()
        back = StepProof.from_bytes(data)
        # identity: full re-serialization is byte-identical
        assert back.to_bytes() == data
        # semantic fields survive
        assert back.pi_core.program_id == s.pi_core.program_id
        assert back.rom_acc == s.rom_acc
        assert back.vm_usage_mask == s.vm_usage_mask
        assert back.ram_delta_clk_bits == s.ram_delta_clk_bits
        assert back.proof.pi == s.proof.pi          # Zl1 field ordering
        assert back.proof.meta == s.proof.meta
        assert back.digest() == s.digest()
        assert (serialize_stark_proof(back.proof.inner)
                == serialize_stark_proof(s.proof.inner))


def test_zklstp1_roundtrip_verifies(steps):
    """A decoded step proof still passes full STARK verification
    (exercises multiproof expansion of compressed openings)."""
    stps, _ = steps
    s = StepProof.from_bytes(stps[0].to_bytes())
    assert not s.proof.inner.trace_openings.paths     # compressed on wire
    prover.verify_step(s)
    assert s.proof.inner.trace_openings.paths         # expanded by replay


def test_zklstp1_bad_magic_rejected(steps):
    stps, _ = steps
    data = bytearray(stps[0].to_bytes())
    data[0] ^= 1
    with pytest.raises(AssertionError):
        StepProof.from_bytes(bytes(data))


def test_zklstp1_truncated_rejected(steps):
    stps, _ = steps
    data = stps[0].to_bytes()
    with pytest.raises(AssertionError):
        StepProof.from_bytes(data[:len(data) // 2])


def test_zklstp1_tampered_body_fails_verification(steps):
    stps, _ = steps
    data = bytearray(stps[0].to_bytes())
    # flip one byte in the inner proof region (tail of the blob)
    data[-40] ^= 1
    try:
        bad = StepProof.from_bytes(bytes(data))
    except (AssertionError, ValueError):
        return                                # structurally rejected: ok
    from zklisp_tpu.prove.stark import VerifyError
    with pytest.raises((VerifyError, Exception)):
        prover.verify_step(bad)
