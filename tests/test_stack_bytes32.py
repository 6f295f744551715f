"""Stack / bytes32 / DSL-sugar / deftype tests — repo analogs of the
reference's tests/{stack,bytes32,dsl_sugar,deftype}.rs.

Each case compiles real source, checks VM semantics against the
reference's expected values, and the heavier ones run the full
prove -> verify pipeline at weakened options.
"""

import pytest

from zklisp_tpu import frontend
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.compiler.errors import CompileError
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0)


def run(src, args=()):
    prog = compile_entry(src, list(args))
    b = PublicInputsBuilder(prog)
    if args:
        b = b.with_main_args([VmArg.u64(a) for a in args])
    pi = b.build()
    return prog, pi, frontend.run_vm(prog, pi).value


def prove_verify(prog, pi):
    steps = prover.prove_program(prog, pi, OPTS)
    for s in steps:
        prover.verify_step(s)


# --- stack.rs --------------------------------------------------------------

def test_stack_push_pop_simple():
    _, _, v = run("(def (main) (begin (push 7) (pop)))")
    assert v == 7


def test_stack_push_push_pop_add():
    src = ("(def (main) (let ((x (begin (push* 7 11) (pop)))) "
           "(+ x (pop))))")
    _, _, v = run(src)
    assert v == 18


def test_stack_fill_empty_sum():
    src = ("(def (main) (begin (push* 1 2 3 4 5) "
           "(+ (pop) (+ (pop) (+ (pop) (+ (pop) (pop)))))))")
    prog, pi, v = run(src)
    assert v == 15
    prove_verify(prog, pi)


def test_stack_with_load_store_interop():
    """stack.rs:84 — the stack lives at STACK_BASE=1_000_000 in the
    same RAM address space: push 7 lands at addr 1000000, a load of
    that addr reads it back, an interleaved store hits the same cell
    before pop."""
    src = ("(def (main) (let ((addr 1000000)) (begin (push 7) "
           "(+ (load addr) (begin (store addr 9) (pop))))))")
    prog, pi, v = run(src)
    assert v == 16
    prove_verify(prog, pi)


# --- dsl_sugar.rs ----------------------------------------------------------

def test_begin_variadic_and_def_let_multiform():
    src = ("(def (main) (let ((x 5) (y 6)) (begin "
           "(assert (= (+ x y) 11)) (begin (push (+ x y)) (pop)))))")
    prog, pi, v = run(src)
    assert v == 11
    prove_verify(prog, pi)


def test_def_multiform_body_implicit_begin():
    src = ("(def (foo a b) (assert (= (+ a b) 9)) (+ a b)) "
           "(def (main) (foo 4 5))")
    _, _, v = run(src)
    assert v == 9


def test_push_star_and_pop_star_macros():
    src = "(def (main) (begin (push* 7 11) (+ (pop* 1) (pop))))"
    _, _, v = run(src)
    assert v == 18


# --- bytes32.rs ------------------------------------------------------------

def test_bytes32_eq_ok():
    src = ('(def (main) (begin (assert (= (hex-to-bytes32 "0xdeadbeef") '
           '(hex-to-bytes32 "0xdeadbeef"))) 1))')
    prog, pi, v = run(src)
    assert v == 1
    prove_verify(prog, pi)


def test_bytes32_len_variation_fail():
    """bytes32.rs:91 — "0x00" and "0x0000" must commit differently
    (length is bound into the chunk hashes), so asserting equality is
    unprovable: preflight on the prover AIR reports the violation."""
    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.preflight import run_preflight
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.trace import build as tb

    src = ('(def (main) (begin (assert (= (hex-to-bytes32 "0x00") '
           '(hex-to-bytes32 "0x0000"))) 1))')
    prog, pi, _ = run(src)
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    assert run_preflight(air, trace), \
        "length-variant hex must violate the assert constraint"


def test_bytes32_in_set_ok():
    src = ('(def (main) (begin (in-set (hex-to-bytes32 "0x01") '
           '((hex-to-bytes32 "0x00") (hex-to-bytes32 "0x01"))) 1))')
    prog, pi, v = run(src)
    assert v == 1
    prove_verify(prog, pi)


# --- deftype.rs ------------------------------------------------------------

def test_enum_predicate_positive_verifies():
    """deftype.rs:39 — enum member sugar: per-variant const fns,
    product-of-differences predicate, assert; t=1 (orange) is in set."""
    src = ("(deftype fruit () '(member apple orange banana)) "
           "(def (main t) (begin (fruit:assert t) (fruit:is t)))")
    prog, pi, v = run(src, (1,))
    assert v == 1
    assert frontend.run_vm(
        prog, PublicInputsBuilder(prog).with_main_args(
            [VmArg.u64(1)]).build()).value == 1
    # variant constructors are ordinal constants
    prog2, _, v2 = run("(deftype fruit () '(member apple orange banana)) "
                       "(def (main) (fruit:banana))")
    assert v2 == 2
    prove_verify(prog, pi)


def test_enum_predicate_negative_unprovable():
    """deftype.rs:73 — asserting a non-member value violates the
    product-of-differences constraint.  A non-member passed as a MAIN
    arg is inlined as a constant and rejected at compile time
    (constant folding, the reference's debug-panic analog); a SECRET
    arg defers to runtime, where preflight on the prover AIR reports
    the Assert violation."""
    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.preflight import run_preflight
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.trace import build as tb

    src = ("(deftype fruit () '(member apple orange banana)) "
           "(def (main t) (begin (fruit:assert t) 1))")
    with pytest.raises(CompileError, match="constant false"):
        compile_entry(src, [9])

    src2 = ("(deftype fruit () '(member apple orange banana)) "
            "(def (main) (begin (fruit:assert (secret-arg 0)) 1))")
    prog = compile_entry(src2, [])
    pi = (PublicInputsBuilder(prog)
          .with_secret_args([VmArg.u64(9)]).build())
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    assert run_preflight(air, trace)
