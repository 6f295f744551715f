"""VM argument binding tests — the reference's vm_args.rs tier
(zk-lisp-proof-winterfell/tests/vm_args.rs): secret args prove/verify
and fail closed, main args seed the TAIL registers at the level-0 map
row (r(NR-k)..r(NR-1)), secret args seed the r0.. prefix without being
overwritten, u128/bytes32 args expand to their canonical slot encoding
(core/pi.py encode_main_args_to_slots), and overflowing the register
file is rejected with a clean error.
"""

import pytest

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.preflight import run_preflight
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import (PublicInputsBuilder, VmArg,
                                encode_main_args_to_slots)
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions
from zklisp_tpu.trace import build as tb
from zklisp_tpu.trace import schedule
from zklisp_tpu.trace.build import TraceError
from zklisp_tpu.trace.layout import NR, Columns

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0)


def _trace_for(src, main_args=(), secret_args=(), public_args=()):
    prog = compile_entry(src, [0] * _main_arity(src))
    b = PublicInputsBuilder(prog)
    if public_args:
        b = b.with_public_args(list(public_args))
    if main_args:
        b = b.with_main_args(list(main_args))
    if secret_args:
        b = b.with_secret_args(list(secret_args))
    pi = b.build()
    return prog, pi, tb.build_trace(prog, pi)


def _main_arity(src):
    # all sources here use zero-arity (def (main) ...) entries except
    # the secret-arg programs, which also take no positional args
    return 0


# ---------------------------------------------------------------------------
# secret args: prove/verify + fail-closed (vm_args.rs:38-135)
# ---------------------------------------------------------------------------

def test_secret_arg_positive_verifies():
    src = "(def (main) (assert (= (secret-arg 0) 3)))"
    prog = compile_entry(src, [])
    pi = (PublicInputsBuilder(prog)
          .with_secret_args([VmArg.u64(3)]).build())
    steps = prover.prove_program(prog, pi, OPTS)
    for s in steps:
        prover.verify_step(s)


def test_secret_arg_negative_detected():
    """Wrong secret makes the Assert AIR constraint unsatisfiable:
    preflight with the exact prover AIR reports the violation
    (vm_args.rs:66-110 asserts prove-or-verify failure)."""
    src = "(def (main) (assert (= (secret-arg 0) 3)))"
    prog = compile_entry(src, [])
    pi = (PublicInputsBuilder(prog)
          .with_secret_args([VmArg.u64(4)]).build())
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    assert run_preflight(air, trace), \
        "expected an Assert violation for the wrong secret"


def test_secret_arg_non_u64_rejected():
    src = "(def (main) (assert (= (secret-arg 0) 3)))"
    prog = compile_entry(src, [])
    pi = (PublicInputsBuilder(prog)
          .with_secret_args([VmArg.u128((1 << 64) + 1)]).build())
    with pytest.raises(TraceError, match="non-u64 secret"):
        tb.build_trace(prog, pi)


# ---------------------------------------------------------------------------
# main-arg register seeding at the level-0 map row (vm_args.rs:138-291)
# ---------------------------------------------------------------------------

def test_main_args_seed_tail_registers_at_level0_map():
    main_args = [VmArg.u64(11), VmArg.u64(22)]
    _, _, trace = _trace_for("(def (main) 0)", main_args=main_args)
    cols = Columns.baseline()
    row0 = schedule.pos_map()
    tail = NR - len(main_args)
    assert trace.get(cols.r_index(tail), row0) == 11
    assert trace.get(cols.r_index(tail + 1), row0) == 22


def test_main_args_do_not_overwrite_secret_args_prefix():
    secret_args = [VmArg.u64(3), VmArg.u64(5)]
    main_args = [VmArg.u64(11), VmArg.u64(13)]
    _, _, trace = _trace_for("(def (main) 0)", main_args=main_args,
                             secret_args=secret_args)
    cols = Columns.baseline()
    row0 = schedule.pos_map()
    assert trace.get(cols.r_index(0), row0) == 3
    assert trace.get(cols.r_index(1), row0) == 5
    tail = NR - len(main_args)
    assert trace.get(cols.r_index(tail), row0) == 11
    assert trace.get(cols.r_index(tail + 1), row0) == 13


def test_main_args_overflow_register_file_rejected():
    many = [VmArg.u64(1)] * (NR + 1)
    with pytest.raises(TraceError, match="too many main_args"):
        _trace_for("(def (main) 0)", main_args=many)


def test_main_args_u128_seed_tail_slots():
    main_args = [VmArg.u64(11), VmArg.u128((42 << 64) | 7)]
    _, _, trace = _trace_for("(def (main) 0)", main_args=main_args)
    cols = Columns.baseline()
    row0 = schedule.pos_map()
    slots = encode_main_args_to_slots(main_args)
    # u64 and u128 each take ONE f128 slot; only bytes32 splits
    # (utils.rs:79-96 encode_vmarg_to_elements)
    assert len(slots) == 2
    assert slots[1] == (42 << 64) | 7
    tail = NR - len(slots)
    for j, expected in enumerate(slots):
        assert trace.get(cols.r_index(tail + j), row0) == expected, \
            f"u128 mismatch at r{tail + j}"


def test_main_args_bytes32_seed_tail_slots():
    main_args = [VmArg.u64(11), VmArg.bytes32(bytes([3] * 32))]
    _, _, trace = _trace_for("(def (main) 0)", main_args=main_args)
    cols = Columns.baseline()
    row0 = schedule.pos_map()
    slots = encode_main_args_to_slots(main_args)
    tail = NR - len(slots)
    for j, expected in enumerate(slots):
        assert trace.get(cols.r_index(tail + j), row0) == expected, \
            f"bytes32 mismatch at r{tail + j}"


def test_main_args_bound_into_pi_digest():
    """Changing a main arg changes the PI digest (the binding the
    verifier checks); an equal PI yields an equal digest."""
    prog = compile_entry("(def (main) 0)", [])
    pi_a = (PublicInputsBuilder(prog)
            .with_main_args([VmArg.u64(1)]).build())
    pi_b = (PublicInputsBuilder(prog)
            .with_main_args([VmArg.u64(2)]).build())
    pi_a2 = (PublicInputsBuilder(prog)
             .with_main_args([VmArg.u64(1)]).build())
    assert pi_a.digest() != pi_b.digest()
    assert pi_a.digest() == pi_a2.digest()
