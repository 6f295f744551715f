"""Compiler tests mirroring the reference test strategy
(zk-lisp-compiler inline tests + tests/*.rs negative paths)."""

import pytest

from zklisp_tpu.compiler import (CompileError, compile_entry, compile_str,
                                 lex, ops as O, parse)


def test_lex_ignores_line_comments():
    s = "(def (x) 1)\n;; comment here\n(def (y) 2)"
    s_no = "(def (x) 1)(def (y) 2)"
    assert lex(s) == lex(s_no)


def test_parse_atoms_lists():
    ast = parse(lex("(add 1 2) (neg 3)"))
    assert len(ast) == 2


def test_lower_arith_and_select():
    src = ("(def (add2 x y) (+ x y)) "
           "(let ((a 7) (b 9)) (select (= a b) (add2 a b) 0))")
    p = compile_str(src)
    assert p.ops  # at least End


def test_entry_simple_addition():
    p = compile_entry("(def (main x) (+ x 1))", [41])
    assert p.ops == [O.Const(7, 42), O.Mov(0, 7), O.End()]


def test_deftype_member():
    src = """
        (deftype fruit () '(member apple orange banana))
        (def (main x) (if (fruit:is x) x 0))
        (main (fruit:apple))
    """
    p = compile_str(src)
    assert p.ops


def test_program_blocks_default_single_block():
    p = compile_str("(def (main) 0) (main)")
    assert len(p.blocks) == 1
    assert p.blocks[0].level_start == 0
    assert p.blocks[0].level_len == len(p.ops)


def test_loop_without_recur_compiles():
    p = compile_str("(def (main) (loop :max 3 ((x 1)) x)) (main)")
    assert p.ops and p.blocks


def test_loop_with_recur_unrolls():
    p = compile_str(
        "(def (main) (loop :max 3 ((x 1)) x (recur (+ x 1)))) (main)")
    assert p.ops and p.blocks


def test_loop_fib_result_structure():
    # 5 iterations of fib: uses const-folding-free registers
    src = """
    (def (main)
      (loop :max 5 ((a 0) (b 1))
        a
        (recur b (+ a b))))
    (main)
    """
    p = compile_str(src)
    assert any(isinstance(op, O.Add) for op in p.ops)


def test_recursion_rejected():
    with pytest.raises(CompileError):
        compile_str("(def (f x) (f x)) (f 1)")


def test_assert_constant_false_rejected():
    with pytest.raises(CompileError):
        compile_str("(assert (= 1 2))")


def test_assert_bit_constant():
    with pytest.raises(CompileError):
        compile_str("(assert-bit 5)")
    p = compile_str("(assert-bit 1)")
    assert p.ops == [O.End()]


def test_loop_errors():
    with pytest.raises(CompileError):
        compile_str("(loop :max 0 ((x 1)) x)")
    with pytest.raises(CompileError):
        compile_str("(def (main) (loop ((x 1)) x)) (main)")
    with pytest.raises(CompileError):
        # recur not in tail position
        compile_str(
            "(def (main) (loop :max 2 ((x 1)) (recur (+ x 1)) x)) (main)")


def test_recur_outside_loop():
    with pytest.raises(CompileError):
        compile_str("(recur 1)")


def test_gadget_constant_errors():
    """gadgets_errors.rs tier: constant-argument gadget misuse is a
    compile-time error with the reference's message."""
    with pytest.raises(CompileError, match="constant not a bit"):
        compile_str("(def (main) (assert-bit 2)) (main)")
    with pytest.raises(CompileError, match="constant out of range"):
        compile_str("(def (main) (assert-range 4294967296 32)) (main)")
    with pytest.raises(CompileError, match="bits must be 32 or 64"):
        compile_str("(def (main) (assert-range 5 12)) (main)")


def test_def_call_wrong_arity_errors():
    """let_and_def_errors.rs: wrong call arity fails at compile time."""
    with pytest.raises(CompileError, match="expects 2"):
        compile_str("(def (add2 a b) (+ a b))\n(add2 7)")
    with pytest.raises(CompileError, match="expects 2"):
        compile_str("(def (add2 a b) (+ a b))\n(add2 7 8 9)")


def test_bytes32_max_len_error():
    """bytes32_limits.rs: >32-byte hex literal rejected."""
    with pytest.raises(CompileError, match="length > 32"):
        compile_str('(hex-to-bytes32 "0x' + "11" * 33 + '")')


def test_typed_fn_schema_checks():
    with pytest.raises(CompileError):
        compile_str("(typed-fn nosuch (u64) -> u64)")
    with pytest.raises(CompileError):
        compile_str("(typed-fn f (u64 u64) -> u64) (def (f x) x)")
    p = compile_str("(typed-fn f (u64) -> u64) (def (f x) x) (f 3)")
    assert p.type_schemas.fns["f"].ret == "u64"


def test_typed_let_binding_required():
    with pytest.raises(CompileError):
        compile_str("(typed-let zzz u64) (def (main) 1) (main)")
    p = compile_str("(typed-let aa u64) (def (main) (let ((aa 3)) aa)) (main)")
    assert p.type_schemas.get_let_schema(None, "aa") is not None


def test_hex_to_bytes32():
    p = compile_str('(hex-to-bytes32 "0xdeadbeef")')
    assert any(isinstance(op, O.SAbsorbN) for op in p.ops)
    with pytest.raises(CompileError):
        compile_str('(hex-to-bytes32 "0xzz")')


def test_merkle_verify_lowering():
    src = "(let ((l 5) (d 0) (s 7)) (merkle-verify l ((d s) (d s) (d s))))"
    p = compile_str(src)
    kinds = [type(op).__name__ for op in p.ops]
    assert "MerkleStepFirst" in kinds
    assert "MerkleStep" in kinds
    assert "MerkleStepLast" in kinds


def test_stack_push_pop():
    p = compile_str("(begin (push 5) (push 6) (pop))")
    assert any(isinstance(op, O.Store) for op in p.ops)
    assert any(isinstance(op, O.Load) for op in p.ops)


def test_commitment_is_blake3_of_bytecode():
    from zklisp_tpu.crypto.blake3 import blake3
    p = compile_entry("(def (main x) (+ x 1))", [1])
    assert p.commitment == blake3(p.bytecode)
    # program_id is blake3(source), not of bytecode
    assert p.program_id != p.commitment


def test_canonical_encoding_tags():
    p = compile_entry("(def (main x) (+ x 1))", [41])
    bc = p.bytecode
    # Const(7, 42): tag 0x01, dst 7, imm LE
    assert bc[0] == 0x01 and bc[1] == 7
    assert int.from_bytes(bc[2:10], "little") == 42
    # Mov(0, 7): tag 0x02
    assert bc[10] == 0x02 and bc[11] == 0 and bc[12] == 7
    assert bc[13] == 0x0C  # End


def test_reference_examples_compile():
    import re
    for name in ("hello-zk", "fib-2pow16-log-n", "rollup-bench"):
        src = open(f"/root/reference/examples/{name}.zlisp").read()
        m = re.search(r"\(def \(main([^)]*)\)", src)
        nargs = len(m.group(1).split()) if m and m.group(1).strip() else 0
        p = compile_entry(src, list(range(2, 2 + nargs)))
        assert p.ops and p.reg_count <= 8


def test_safe_ops_emit_range_asserts():
    # immediates constant-fold (reference behavior), so operate on registers
    p = compile_str("(safe-add (secret-arg 0) (secret-arg 1))")
    assert any(isinstance(op, O.AssertRangeLo) for op in p.ops)
    assert any(isinstance(op, O.AssertRangeHi) for op in p.ops)


def test_safe_add_imm_folds():
    p = compile_str("(let ((a 5)) (safe-add a 3))")
    assert p.ops == [O.End()]


def test_divmod_gadget():
    p = compile_str("(divmod-q (secret-arg 0) (secret-arg 1))")
    assert any(isinstance(op, O.DivMod) for op in p.ops)


def test_muldiv_gadget():
    p = compile_str("(muldiv (secret-arg 0) (secret-arg 1) (secret-arg 2))")
    assert any(isinstance(op, O.DivMod128) for op in p.ops)
    assert any(isinstance(op, O.MulWide) for op in p.ops)


def test_in_set():
    p = compile_str("(in-set (secret-arg 0) (1 2 3))")
    assert any(isinstance(op, O.Assert) for op in p.ops)


def test_reg_overflow_reported():
    # 9 live let-bound register values must exhaust the 8-register file
    src = ("(def (id x) (+ x (secret-arg 0)))"
           "(let ((a (id 1)) (b (id 2)) (c (id 3)) (d (id 4)) (e (id 5))"
           "      (f (id 6)) (g (id 7)) (h (id 8)) (i (id 9)))"
           "  (+ a (+ b (+ c (+ d (+ e (+ f (+ g (+ h i)))))))))")
    with pytest.raises(CompileError):
        compile_str(src)
