"""RAM semantics + permutation-argument tests — the reference's ram.rs
tier (zk-lisp-proof-winterfell/tests/ram.rs, 13 scenarios): load/store
VM semantics through real compiled programs, and preflight (the exact
prover AIR evaluated row-by-row) confirming the memory-consistency
permutation argument closes for each access pattern.
"""

import pytest

from zklisp_tpu import frontend
from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.preflight import run_preflight
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.trace import build as tb


def _run(src, args=()):
    prog = compile_entry(src, list(args))
    b = PublicInputsBuilder(prog)
    if args:
        b = b.with_main_args([VmArg.u64(a) for a in args])
    pi = b.build()
    return prog, pi, frontend.run_vm(prog, pi).value


def _preflight_clean(prog, pi):
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    violation = run_preflight(air, trace)
    assert not violation, f"preflight violation: {violation}"


# ---------------------------------------------------------------------------
# VM load/store semantics (ram.rs:36-117, 285-340)
# ---------------------------------------------------------------------------

SEMANTIC_CASES = [
    ("store_then_load_same_address",
     "(def (main a) (begin (store 1 a) (load 1)))", (7,), 7),
    ("double_load_after_single_store",
     "(def (main a) (begin (store 2 a) (+ (load 2) (load 2))))",
     (21,), 42),
    ("store_same_addr_updates_value",
     "(def (main a) (begin (store 1 a) (store 1 (+ a 1)) (load 1)))",
     (7,), 8),
    ("switch_addr_then_load_new",
     "(def (main a) (begin (store 1 a) (store 2 (+ a 1)) (load 2)))",
     (7,), 8),
    ("load_unwritten_addr_reads_zero",
     "(def (main a) (begin (store 1 a) (load 9)))", (7,), 0),
    ("load_before_store_reads_zero",
     "(def (main) (load 5))", (), 0),
    ("switch_addr_then_load_old_addr_reads_old_value",
     "(def (main a) (begin (store 1 a) (store 2 (+ a 1)) (load 1)))",
     (7,), 7),
    ("computed_addr_and_value",
     "(def (main a) (begin (store (+ 1 2) (* a 2)) (load 3)))",
     (21,), 42),
]


@pytest.mark.parametrize("name,src,args,expected", SEMANTIC_CASES,
                         ids=[c[0] for c in SEMANTIC_CASES])
def test_ram_semantics(name, src, args, expected):
    _, _, value = _run(src, args)
    assert value == expected


# ---------------------------------------------------------------------------
# permutation argument closes: preflight-clean traces (ram.rs:119-283)
# ---------------------------------------------------------------------------

PREFLIGHT_CASES = [
    ("store_then_load",
     "(def (main a) (begin (store 1 a) (load 1)))", (7,)),
    ("many_addresses",
     "(def (main a) (begin (store 1 a) (store 2 (+ a 1)) "
     "(store 3 (+ a 2)) (store 4 (+ a 3)) "
     "(+ (load 1) (+ (load 2) (+ (load 3) (load 4))))))", (10,)),
    ("interleaved",
     "(def (main a) (begin (store 1 a) (store 2 (+ a 1)) (load 1) "
     "(store 1 (+ a 2)) (load 2) (load 1)))", (5,)),
    ("double_store_then_load",
     "(def (main a) (begin (store 1 a) (store 1 (+ a 1)) (load 1)))",
     (9,)),
    ("addr_zero_cross_level",
     "(def (main a) (begin (store 0 a) (store 7 (+ a 1)) (load 0)))",
     (4,)),
]


@pytest.mark.parametrize("name,src,args", PREFLIGHT_CASES,
                         ids=[c[0] for c in PREFLIGHT_CASES])
def test_ram_perm_preflight_ok(name, src, args):
    prog, pi, _ = _run(src, args)
    _preflight_clean(prog, pi)


def test_ram_grand_products_equal_at_last_row():
    """Unsorted and sorted grand products agree at the final row — the
    equality the RAM AIR's last-row constraint enforces
    (vm/air/ram.rs:26-236 final-row unsorted==sorted)."""
    from zklisp_tpu.trace.layout import Columns

    prog, pi, _ = _run(
        "(def (main a) (begin (store 1 a) (store 2 (+ a 1)) "
        "(+ (load 1) (load 2))))", (6,))
    trace = tb.build_trace(prog, pi)
    cols = Columns.baseline()
    last = trace.length - 1
    assert (trace.get(cols.ram_gp_unsorted, last)
            == trace.get(cols.ram_gp_sorted, last))
