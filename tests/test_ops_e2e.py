"""Per-op end-to-end tests: compile DSL source, check VM semantics, then
full prove -> verify at weakened options.

This is the repo's analog of the reference's per-op integration tier
(zk-lisp-proof-winterfell/tests/{divmod,mulwide,muldiv,hash2,sponge,
merkle,ram,stack,bytes32,gadgets,if_and_assert,arithmetic_select}.rs):
every case compiles real source through `compile_entry`, executes the
VM (trace build + output cell read, frontend.rs semantics), and the
prove tier runs the whole prove_program -> verify_step pipeline with
weakened ProverOptions (the reference's recursion_single.rs:23-32
pattern: queries=8, blowup=8, grind=0).
"""

import pytest

from zklisp_tpu import frontend
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0)


def run_main(src, args=(), secrets=(), pi_hook=None):
    prog = compile_entry(src, list(args))
    b = PublicInputsBuilder(prog)
    if args:
        b = b.with_main_args([VmArg.u64(a) for a in args])
    if secrets:
        b = b.with_secret_args([VmArg.u64(s) for s in secrets])
    if pi_hook is not None:
        b = pi_hook(prog, b)
    pi = b.build()
    return prog, pi, frontend.run_vm(prog, pi).value


def prove_verify(prog, pi):
    steps = prover.prove_program(prog, pi, OPTS)
    assert steps
    for s in steps:
        prover.verify_step(s)
    return steps


# ---------------------------------------------------------------------------
# VM semantics (fast: trace build only) — arithmetic_select.rs,
# divmod.rs, mulwide.rs, muldiv.rs, gadgets.rs, if_and_assert.rs tier
# ---------------------------------------------------------------------------

SEM_CASES = [
    ("add", "(def (main a b) (+ a b))", (7, 9), 16),
    ("sub", "(def (main a b) (- a b))", (9, 7), 2),
    ("mul", "(def (main a b) (* a b))", (7, 9), 63),
    ("eq_true", "(def (main a b) (= a b))", (5, 5), 1),
    ("eq_false", "(def (main a b) (= a b))", (5, 6), 0),
    ("if", "(def (main a b) (if (= a b) 11 22))", (3, 3), 11),
    ("select_then", "(def (main c) (select c 11 22))", (1,), 11),
    ("select_else", "(def (main c) (select c 11 22))", (0,), 22),
    ("neg", "(def (main a) (= (+ a (neg a)) 0))", (5,), 1),
    ("bit_pred", "(def (main a) (bit? a))", (1,), 1),
    ("safe_add", "(def (main a b) (safe-add a b))", (3, 4), 7),
    ("safe_sub", "(def (main a b) (safe-sub a b))", (9, 4), 5),
    ("safe_mul", "(def (main a b) (safe-mul a b))", (6, 7), 42),
    ("divmod_q", "(def (main a b) (divmod-q a b))", (17, 5), 3),
    ("divmod_r", "(def (main a b) (divmod-r a b))", (17, 5), 2),
    ("mulwide_lo", "(def (main a b) (mulwide-lo a b))",
     ((1 << 63) + 5, 3), (((1 << 63) + 5) * 3) % (1 << 64)),
    ("mulwide_hi", "(def (main a b) (mulwide-hi a b))",
     ((1 << 63) + 5, 3), (((1 << 63) + 5) * 3) >> 64),
    ("muldiv", "(def (main a b c) (muldiv a b c))",
     (10, 7, 4), (10 * 7) // 4),
    # in-set ASSERTS membership; Op::Assert writes 1 to dst
    # unconditionally (vm/trace/vm.rs:323-334) and the violation only
    # surfaces in the AIR (c==1) — see test_in_set_miss_unprovable
    ("in_set_hit", "(def (main a) (in-set a (1 2 3)))", (2,), 1),
    ("in_set_miss", "(def (main a) (in-set a (1 2 3)))", (5,), 1),
    ("let", "(def (main a) (let ((x (+ a 1)) (y 2)) (* x y)))",
     (4,), 10),
    ("stack", "(def (main a b) (begin (push a) (push b) "
     "(- (pop) (pop))))", (3, 10), 7),
    ("ram", "(def (main a) (begin (store 5 a) (+ (load 5) 1)))",
     (41,), 42),
    ("loop_fib", "(def (main a b) (loop :max 5 ((i 0) (x a) (y b)) x "
     "(recur (+ i 1) y (+ x y))))", (1, 1), 8),
]


@pytest.mark.parametrize("name,src,args,expected",
                         SEM_CASES, ids=[c[0] for c in SEM_CASES])
def test_vm_semantics(name, src, args, expected):
    _, _, value = run_main(src, args)
    assert value == expected


def test_in_set_miss_unprovable():
    """A non-member makes the Assert AIR constraint (c==1) fail:
    preflight with the exact prover AIR reports a violation
    (run itself succeeds — Assert writes 1, vm/trace/vm.rs:332)."""
    from zklisp_tpu.air.preflight import run_preflight
    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.trace import build as tb

    prog = compile_entry("(def (main a) (in-set a (1 2 3)))", [5])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(5)]).build())
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    assert run_preflight(air, trace), \
        "expected an Assert constraint violation for a set miss"


def test_secret_arg_semantics():
    src = "(def (main a) (+ a (secret-arg 0)))"
    prog = compile_entry(src, [5])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(5)])
          .with_secret_args([VmArg.u64(37)]).build())
    assert frontend.run_vm(prog, pi).value == 42


# ---------------------------------------------------------------------------
# End-to-end prove -> verify per op family (weakened options)
# ---------------------------------------------------------------------------

E2E_CASES = [
    # if_and_assert.rs: branch + assert in one program
    ("if_and_assert",
     "(def (main a b) (begin (assert (= (+ a b) 16)) "
     "(assert-bit (= a 7)) (assert-range a 32) "
     "(if (= a 7) (+ a b) 0)))",
     (7, 9), 16),
    # gadgets.rs: the ALU gadget stack in one program.  NOTE: two
    # divmods can't be live at once — divmod holds 6 temps at peak
    # (lower/alu.rs:145-300) so (safe-add (divmod-q a b) (divmod-r a b))
    # needs 9 of the NR=8 registers and the reference compiler would
    # reject it identically (see test_gadget_nesting_reg_overflow).
    ("gadgets",
     "(def (main a b) (+ (safe-add (divmod-q a b) 2) "
     "(+ (mulwide-lo a b) (muldiv a b 2))))",
     (17, 5), (17 // 5 + 2) + (17 * 5) + (17 * 5) // 2),
    # hash2.rs / sponge.rs: sponge absorb/squeeze through hash2
    ("hash2", "(def (main a b) (= (hash2 a b) (hash2 a b)))",
     (11, 22), 1),
    # merkle.rs: two-level path — MerkleStepLast binds the accumulated
    # root to PublicInputs.merkle_root, which the caller must set
    # (tests/merkle.rs:135); see _merkle_pi_hook below and the full
    # depth/tamper matrix in tests/test_merkle.py
    ("merkle",
     "(def (main l s1 s2) (merkle-verify l ((0 s1) (1 s2))))",
     (5, 7, 9), 0),
    # ram.rs + stack.rs: mixed memory ops
    ("ram_stack",
     "(def (main a b) (begin (store 1 a) (push b) "
     "(+ (load 1) (pop))))", (30, 12), 42),
    # bytes32.rs: hex literal -> limbs via store-ca addressing
    ("bytes32",
     '(def (main) (begin (hex-to-bytes32 '
     '"0x00000000000000000000000000000000000000000000000000000000000000ff") 1))',
     (), 1),
    # in_set + select + bit? composition
    ("predicates",
     "(def (main a) (select (in-set a (1 2 3)) (bit? 1) 0))",
     (2,), 1),
]


def _merkle_pi_hook(prog, b):
    """Bind the expected root for the E2E 'merkle' case (leaf=5, path
    (0 7)(1 9)) — merkle-verify enforces root equality in the AIR, so
    the PI must carry the root the path actually hashes to."""
    from zklisp_tpu.crypto.poseidon import merkle_root_from_path
    return b.with_merkle_root(merkle_root_from_path(
        prog.program_id, 5, [(0, 7), (1, 9)]))


@pytest.mark.parametrize("name,src,args,expected",
                         E2E_CASES, ids=[c[0] for c in E2E_CASES])
def test_op_e2e_prove_verify(name, src, args, expected):
    hook = _merkle_pi_hook if name == "merkle" else None
    prog, pi, value = run_main(src, args, pi_hook=hook)
    assert value == expected
    prove_verify(prog, pi)


def test_gadget_nesting_reg_overflow():
    """Two simultaneously-live divmods exceed the NR=8 register file:
    the divmod gadget holds 6 temps at its peak (mirroring the
    reference's temp lifetimes, lower/alu.rs:145-300), so with a, b and
    one held gadget result live the lowering must fail with a clean
    RegOverflow — not emit a corrupt op stream."""
    from zklisp_tpu.compiler.errors import RegOverflow
    with pytest.raises(RegOverflow):
        compile_entry(
            "(def (main a b) (safe-add (divmod-q a b) (divmod-r a b)))",
            [17, 5])


def test_secret_gadgets_e2e():
    """gadgets.rs secret-arg tier: gadget over secret inputs proves and
    verifies; the secret never enters the public inputs digest."""
    src = ("(def (main) (begin "
           "(assert (= (safe-add (secret-arg 0) (secret-arg 1)) 40)) "
           "(divmod-q (secret-arg 0) (secret-arg 1))))")
    prog = compile_entry(src, [])
    pi = (PublicInputsBuilder(prog)
          .with_secret_args([VmArg.u64(35), VmArg.u64(5)]).build())
    assert frontend.run_vm(prog, pi).value == 7
    steps = prove_verify(prog, pi)
    # same program with different secrets satisfying the assert yields a
    # different state but the same pi digest (secrets are not public)
    pi2 = (PublicInputsBuilder(prog)
           .with_secret_args([VmArg.u64(30), VmArg.u64(10)]).build())
    assert pi2.digest() == pi.digest()
    assert frontend.run_vm(prog, pi2).value == 3
    prove_verify(prog, pi2)
    assert steps[0].proof.pi.state_out_hash != \
        prover.prove_program(prog, pi2, OPTS)[0].proof.pi.state_out_hash


def test_loop_e2e_prove_verify():
    """loop_integration.rs tier: unrolled loop proves end to end.

    recur rebinds SEQUENTIALLY (reference lower/iter.rs:196-216 —
    "Compute next state values sequentially", each var rebound before
    the next arg is lowered; confirmed by loop_integration.rs:44's
    acc=10 expectation).  So here x:=y, then y:=(x+y) sees the NEW x:
    y doubles each recur.  :max 8 runs 7 recurs (the last iteration
    returns before recurring, iter.rs:184-190) -> x = 2^6 = 64."""
    src = ("(def (main a b) (loop :max 8 ((i 0) (x a) (y b)) x "
           "(recur (+ i 1) y (+ x y))))")
    prog, pi, value = run_main(src, (1, 1))
    assert value == 64
    prove_verify(prog, pi)
