"""The device-staged prover must produce byte-identical proofs to the
host prover (same Fiat-Shamir transcript, same openings)."""

import numpy as np
import pytest

# jit-staged prover compiles are minutes on the CPU backend (seconds to
# re-trace once .jax_cache is warm); fast tier: pytest -m "not slow"
pytestmark = pytest.mark.slow

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_str
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.field import limb, ntt
from zklisp_tpu.field.felt import Felt, FVec
from zklisp_tpu.prove.composition_device import eval_composition_device
from zklisp_tpu.prove.params import ProofOptions
from zklisp_tpu.prove.formats import serialize_stark_proof
from zklisp_tpu.prove.stark import _roll, prove_trace, verify_trace
from zklisp_tpu.trace import build as tb

SRC = """
(def (main)
  (let ((s (secret-arg 0)))
    (store 3 s)
    (push (load 3))
    (hash2 (pop) s)))
(main)
"""

OPTS = ProofOptions(num_queries=8, blowup=8, grinding_factor=0)


@pytest.fixture(scope="module")
def setup():
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


def test_composition_matches_generic(setup):
    trace, air, air_pi = setup
    blowup = OPTS.blowup
    n, w = trace.length, trace.width
    cols = np.asarray(trace.to_limbs())
    pows = ntt.powers_table((n * blowup).bit_length() - 1, np)
    lde = np.stack([
        ntt.coset_evaluate(ntt.intt(cols[c], np), blowup, np, pows=pows)
        for c in range(w)])
    cur = [FVec(lde[c], np) for c in range(w)]
    nxt = [FVec(_roll(lde[c], -blowup, np), np) for c in range(w)]
    periodic = air.periodic_lde(blowup, np)
    rng = np.random.RandomState(7)
    alphas = [int(rng.randint(1, 1 << 30)) for _ in
              range(air.num_transition_constraints())]

    tvals = air.evaluate_transition(cur, nxt, periodic)
    ref = None
    for a, tv in zip(alphas, tvals):
        term = tv * Felt(a)
        ref = term if ref is None else ref + term

    got = eval_composition_device(air, cur, nxt, periodic, alphas, np)
    assert list(limb.to_ints(got.a)) == list(limb.to_ints(ref.a))

    # array-alpha mode (the form used under jit)
    got2 = eval_composition_device(
        air, cur, nxt, periodic, np.asarray(limb.from_ints(alphas)), np)
    assert list(limb.to_ints(got2.a)) == list(limb.to_ints(ref.a))


def test_device_proof_identical_to_host(setup):
    trace, air, air_pi = setup
    from zklisp_tpu.prove.stark_device import prove_trace_device
    host = prove_trace(trace, air, air_pi, OPTS, np)
    dev = prove_trace_device(trace, air, air_pi, OPTS)
    assert serialize_stark_proof(dev) == serialize_stark_proof(host)
    verify_trace(dev, air_pi)


def test_device_proof_identical_with_grinding(setup, monkeypatch):
    """grind > 0: the device-side PoW hit test must find the same
    (smallest) nonce as the host scan, keeping transcripts identical."""
    trace, air, air_pi = setup
    from zklisp_tpu.prove.stark_device import prove_trace_device
    opts = ProofOptions(num_queries=8, blowup=8, grinding_factor=8)
    monkeypatch.delenv("ZKL_DEVICE", raising=False)
    host = prove_trace(trace, air, air_pi, opts, np)
    monkeypatch.setenv("ZKL_DEVICE", "jax")
    dev = prove_trace_device(trace, air, air_pi, opts)
    assert serialize_stark_proof(dev) == serialize_stark_proof(host)
    verify_trace(dev, air_pi)
