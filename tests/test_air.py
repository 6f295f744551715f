"""AIR constraint tests: every feature must preflight-clean on real traces,
and tampered traces must violate (ported from the reference's hand-built
frame tests + preflight strategy)."""

import pytest

from zklisp_tpu.compiler import builder as B, compile_entry, ops as O
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.crypto import poseidon as pos
from zklisp_tpu.field import f128
from zklisp_tpu.trace import build as tb
from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.preflight import run_preflight
from zklisp_tpu.air.zk_air import ZkLispAir


def mkprog(ops):
    b = B.ProgramBuilder()
    for op in ops:
        b.push(op)
    return b.finalize(B.CompilerMetrics())


def air_for(prog, pi, trace):
    air_pi = build_air_pi_for_trace(
        pi, 0, tb.rom_acc_from_program(prog), None, None, trace)
    return ZkLispAir(trace.width, trace.length, air_pi)


def assert_clean(prog, pi=None):
    pi = pi or PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    air = air_for(prog, pi, tr)
    v = run_preflight(air, tr)
    assert v == [], v[:3]
    return tr, air


def test_alu_programs_preflight_clean():
    assert_clean(mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1),
                         O.End()]))
    assert_clean(mkprog([O.Const(0, 5), O.Const(1, 5), O.Eq(2, 0, 1),
                         O.Select(3, 2, 0, 1), O.End()]))
    assert_clean(mkprog([O.Const(0, 9), O.Neg(1, 0), O.Sub(2, 0, 1),
                         O.Mul(3, 0, 0), O.Mov(4, 3), O.End()]))


def test_gadgets_preflight_clean():
    assert_clean(mkprog([O.Const(0, 1), O.Assert(1, 0), O.End()]))
    assert_clean(mkprog([O.Const(0, 1), O.AssertBit(1, 0), O.End()]))
    assert_clean(mkprog([O.Const(0, 77), O.AssertRange(1, 0, 32), O.End()]))
    assert_clean(mkprog([O.Const(0, 2 ** 60), O.AssertRangeLo(1, 0),
                         O.AssertRangeHi(1, 0), O.End()]))
    assert_clean(mkprog([O.Const(0, 17), O.Const(1, 5), O.DivMod(2, 3, 0, 1),
                         O.End()]))
    assert_clean(mkprog([O.Const(0, 2 ** 40), O.Const(1, 2 ** 41),
                         O.MulWide(2, 3, 0, 1), O.End()]))
    assert_clean(mkprog([O.Const(0, 7), O.Const(1, 123), O.Const(2, 13),
                         O.DivMod128(0, 1, 2, 3, 4), O.End()]))


def test_sponge_preflight_clean():
    assert_clean(mkprog([O.Const(0, 1), O.Const(1, 2), O.SAbsorbN((0, 1)),
                         O.SSqueeze(3), O.End()]))


def test_ram_preflight_clean():
    assert_clean(mkprog([O.Const(0, 100), O.Const(1, 42), O.Store(0, 1),
                         O.Load(2, 0), O.Store(0, 2), O.Load(3, 0),
                         O.End()]))


def test_merkle_preflight_clean():
    prog = mkprog([O.Const(0, 5), O.Const(1, 0), O.Const(2, 7),
                   O.MerkleStepFirst(0, 1, 2), O.MerkleStepLast(1, 2),
                   O.End()])
    h1 = pos.sponge_absorb([5, 7], prog.program_id)
    h2 = pos.sponge_absorb([h1, 7], prog.program_id)
    pi = PublicInputsBuilder(prog).build()
    pi.merkle_root = f128.fe_to_bytes_fold(h2)
    assert_clean(prog, pi)


def test_hello_zk_preflight_clean():
    src = open("/root/reference/examples/hello-zk.zlisp").read()
    prog = compile_entry(src, [2, 5])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(2), VmArg.u64(5)])
          .with_secret_args([VmArg.u64(3)]).build())
    assert_clean(prog, pi)


def test_tampered_register_violates():
    prog = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    pi = PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    from zklisp_tpu.trace.layout import Columns
    cols = Columns.baseline()
    # corrupt the ALU result written after the Add level's final row
    from zklisp_tpu.trace import schedule
    row = 2 * 32 + schedule.pos_final() + 1
    tr.set(cols.r_index(2), row, 999)
    air = air_for(prog, pi, tr)
    v = run_preflight(air, tr)
    assert v, "tampered trace must violate constraints"


def test_tampered_rom_mirror_violates():
    prog = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    pi = PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    from zklisp_tpu.trace.layout import Columns
    cols = Columns.baseline()
    tr.set(cols.rom_op_index(0), 0, 0)  # op was Const -> mirror bit 1
    air = air_for(prog, pi, tr)
    v = run_preflight(air, tr)
    assert v


def test_assert_false_violates():
    # Build a trace where Assert sees c==0 (tamper the assert source reg)
    prog = mkprog([O.Const(0, 1), O.Assert(1, 0), O.End()])
    pi = PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    from zklisp_tpu.trace.layout import Columns
    from zklisp_tpu.trace import schedule
    cols = Columns.baseline()
    # zero r0 at the Assert level's rows (map..final)
    for r in range(32, 32 + schedule.pos_final() + 1):
        tr.set(cols.r_index(0), r, 0)
    air = air_for(prog, pi, tr)
    v = run_preflight(air, tr)
    assert v


def test_segment_trace_preflights_with_segment_pi():
    # two-segment split of a 4-level program, each segment must verify
    # against its own boundary public inputs
    prog = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1),
                   O.Mul(3, 2, 2), O.End()])
    pi = PublicInputsBuilder(prog).build()
    full = tb.build_trace(prog, pi)
    from zklisp_tpu.trace.layout import Columns, LayoutConfig
    layout = tb.SegmentLayout(Columns.baseline(), LayoutConfig())
    from zklisp_tpu.air.airpi import segment_boundaries_from_full
    for (s, e) in ((0, 128), (128, 256)):
        seg = tb.Segment(s, e)
        tr, _, _ = tb.build_segment_trace_with_state(full, seg, layout)
        b = segment_boundaries_from_full(full, seg)
        air_pi = build_air_pi_for_trace(
            pi, pi.feature_mask, tb.rom_acc_from_program(prog),
            layout.cols, b, tr)
        air = ZkLispAir(tr.width, tr.length, air_pi)
        v = run_preflight(air, tr)
        assert v == [], (s, e, v[:3])
