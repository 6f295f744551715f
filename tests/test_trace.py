"""Trace builder tests (ported from src/vm/trace/*.rs inline tests)."""

import pytest

from zklisp_tpu.compiler import builder as B, compile_entry, ops as O
from zklisp_tpu.core.pi import PublicInputs, PublicInputsBuilder, VmArg
from zklisp_tpu.crypto import poseidon as pos
from zklisp_tpu.field import f128
from zklisp_tpu.trace import build as tb, schedule
from zklisp_tpu.trace.layout import Columns, LayoutConfig, STEPS_PER_LEVEL_P2

COLS = Columns.baseline()
STEPS = STEPS_PER_LEVEL_P2


def mkprog(ops):
    b = B.ProgramBuilder()
    for op in ops:
        b.push(op)
    return b.finalize(B.CompilerMetrics())


def test_layout_width_matches_reference():
    assert COLS.width() == 219
    assert Columns(LayoutConfig(rom=False)).width() < 219
    vm_only = Columns(LayoutConfig(ram=False, sponge=False, merkle=False,
                                   rom=False))
    assert vm_only.width() <= Columns(LayoutConfig(rom=False)).width()


def test_core_indices_stable_across_configs():
    vm_only = Columns(LayoutConfig(ram=False, sponge=False, merkle=False,
                                   rom=False))
    for i in range(8):
        assert COLS.r_index(i) == vm_only.r_index(i)
    assert COLS.op_const == vm_only.op_const
    assert COLS.op_store == vm_only.op_store


def test_alu_const_add():
    p = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    assert tr.get(COLS.op_const, 0) == 1
    assert tr.get(COLS.r_index(0), schedule.pos_final() + 1) == 7
    assert tr.get(COLS.r_index(1), STEPS + schedule.pos_final() + 1) == 9
    assert tr.get(COLS.op_add, 2 * STEPS) == 1
    assert tr.get(COLS.r_index(2), 2 * STEPS + schedule.pos_final() + 1) == 16
    assert tr.length == 4 * STEPS


def test_alu_eq_select():
    p = mkprog([O.Const(0, 5), O.Const(1, 5), O.Eq(2, 0, 1),
                O.Select(3, 2, 0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    assert tr.get(COLS.r_index(2), 2 * STEPS + schedule.pos_final() + 1) == 1
    assert tr.get(COLS.r_index(3), 3 * STEPS + schedule.pos_final() + 1) == 5
    assert tr.length == 8 * STEPS


def test_sponge_absorb_squeeze():
    p = mkprog([O.Const(0, 1), O.Const(1, 2), O.SAbsorbN((0, 1)),
                O.SSqueeze(3), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    row3_fin = 3 * STEPS + schedule.pos_final()
    assert tr.get(COLS.op_sponge, row3_fin) == 1
    left = tr.get(COLS.r_index(0), 2 * STEPS)
    right = tr.get(COLS.r_index(1), 2 * STEPS)
    expected = pos.poseidon_hash_two_lanes(p.commitment, left, right)
    assert tr.get(COLS.r_index(3), row3_fin + 1) == expected


def test_program_commit_bound_at_level0():
    p = mkprog([O.Const(0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    assert tr.get(COLS.pi_prog, 0) == f128.be_from_le8(p.commitment)


def test_rom_mirror_and_offline_accumulator():
    p = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    for lvl in range(len(p.ops)):
        rm = lvl * STEPS
        for k, c in enumerate(COLS.op_columns()):
            assert tr.get(c, rm) == tr.get(COLS.rom_op_index(k), rm)
    acc = tb.rom_acc_from_program(p)
    last = tr.length - 1
    assert tr.get(COLS.rom_s_index(0), last) == acc[0]
    assert tr.get(COLS.rom_s_index(1), last) == acc[1]
    assert tr.get(COLS.rom_s_index(2), last) == acc[2]


def test_pc_carries_and_increments():
    p = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    total = tr.length // STEPS
    for lvl in range(total):
        for r in range(lvl * STEPS, (lvl + 1) * STEPS):
            assert tr.get(COLS.pc, r) == lvl


def test_ram_store_load_and_gp_closure():
    p = mkprog([O.Const(0, 100), O.Const(1, 42), O.Store(0, 1),
                O.Load(2, 0), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    assert tr.get(COLS.r_index(2), 3 * STEPS + schedule.pos_final() + 1) == 42
    last = tr.length - 1
    assert tr.get(COLS.ram_gp_sorted, last) == tr.get(
        COLS.ram_gp_unsorted, last)
    # two events embedded on sorted rows
    count = sum(tr.col(COLS.ram_sorted))
    assert count == 2


def test_pose_active_zero_on_alu_levels():
    p = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    for lvl in range(len(p.ops)):
        for r in range(lvl * STEPS, (lvl + 1) * STEPS):
            assert tr.get(COLS.pose_active, r) == 0


def test_merkle_chain():
    # leaf in r0, dir=0 in r1, sib in r2; two levels
    p = mkprog([O.Const(0, 5), O.Const(1, 0), O.Const(2, 7),
                O.MerkleStepFirst(0, 1, 2), O.MerkleStepLast(1, 2), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    h1 = pos.sponge_absorb([5, 7], p.commitment)
    h2 = pos.sponge_absorb([h1, 7], p.commitment)
    fin4 = 4 * STEPS + schedule.pos_final()
    assert tr.get(COLS.merkle_acc, 3 * STEPS + schedule.pos_final()) == h1
    assert tr.get(COLS.merkle_acc, fin4) == h2
    assert tr.get(COLS.merkle_last, fin4) == 1


def test_segment_slicing_full_equals_original():
    p = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    layout = tb.SegmentLayout(COLS, LayoutConfig())
    seg = tb.Segment(0, tr.length)
    sliced, s_in, s_out = tb.build_segment_trace_with_state(tr, seg, layout)
    assert sliced.width == tr.width and sliced.length == tr.length
    for c in range(tr.width):
        assert sliced.col(c) == tr.col(c)
    assert s_in == tb.vm_state_hash_row(tr, 0)
    assert s_out == tb.vm_state_hash_row(tr, tr.length - 1)


def test_segment_prev_state_mismatch_rejected():
    p = mkprog([O.Const(0, 1), O.End()])
    tr = tb.build_trace(p, PublicInputs())
    layout = tb.SegmentLayout(COLS, LayoutConfig())
    with pytest.raises(tb.TraceError):
        tb.build_segment_trace_with_state(
            tr, tb.Segment(0, tr.length), layout,
            tb.PrevState(b"\x01" * 32))


def test_hello_zk_end_to_end_trace():
    src = open("/root/reference/examples/hello-zk.zlisp").read()
    prog = compile_entry(src, [2, 5])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(2), VmArg.u64(5)])
          .with_secret_args([VmArg.u64(3)])
          .build())
    tr = tb.build_trace(prog, pi)
    out_reg, out_row = tb.vm_output_from_trace(tr)
    assert tr.get(COLS.r_index(out_reg), out_row) == 1
    # main arg slots seeded in the register tail at level 0 map row
    assert tr.get(COLS.r_index(6), 0) == 2
    assert tr.get(COLS.r_index(7), 0) == 5
    assert tr.get(COLS.r_index(0), 0) == 3  # secret arg


def test_empty_trace_schedule_gates():
    tr = tb.build_empty_trace(2)
    for lvl in range(2):
        base = lvl * STEPS
        assert tr.get(COLS.g_map, base) == 1
        assert tr.get(COLS.g_final, base + schedule.pos_final()) == 1
        for j in range(27):
            assert tr.get(COLS.g_r_index(j), base + 1 + j) == 1


def test_pad_tail_state_chain():
    """Segments that start inside the pad tail (op count below the pow2
    level grid) chain VM state hashes — the register file is carried
    through pad levels.  The reference zeroes pad-level registers
    (vm.rs iterates only prog.ops) and its own serial prev_state check
    + aggregation VM chain break on such programs (PARITY.md)."""
    from zklisp_tpu.compiler import compile_entry
    from zklisp_tpu.prove import planner, prover
    from zklisp_tpu.prove.params import ProverOptions

    src = ("(def (main a b)\n"
           "  (loop :max 9 ((i 0) (x a) (y b))\n"
           "    x\n"
           "    (recur (+ i 1) y (+ x y))))\n")
    prog = compile_entry(src, [1, 1])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(1), VmArg.u64(1)])
          .build())
    opts = ProverOptions(queries=4, blowup=8, grind=0,
                         min_security_bits=0, max_segment_rows=64)
    segs = planner.plan_segments(prog, pi, opts)
    n_ops = len(prog.ops)
    total_levels = 1 << (n_ops - 1).bit_length()
    assert n_ops < total_levels, "test needs a pad tail"
    assert any(s.r_start >= n_ops * 32 for s in segs), \
        "test needs a segment starting in the pad tail"
    full = tb.build_trace(prog, pi)
    prev = None
    for seg in segs:
        _, layout = prover._segment_layout(prog, pi, seg)
        _, s_in, s_out = tb.build_segment_trace_with_state(
            full, seg, layout, prev)
        prev = tb.PrevState(s_out)   # raises on chain mismatch


def test_slice_rows_carries_limb_cache():
    """slice_rows propagates the parent's cached uint16 limb array (a
    numpy fancy slice) and it matches a fresh per-segment conversion —
    the per-segment host cost the wave prover amortizes."""
    import random

    import numpy as np

    from zklisp_tpu.field import f128
    from zklisp_tpu.trace.table import TraceTable

    rng = random.Random(7)
    t = TraceTable(5, 64)
    for c in range(5):
        for r in range(64):
            t.set(c, r, rng.randrange(f128.P))
    t.to_limbs16()                      # build the parent cache
    sliced = t.slice_rows(32, 64, [4, 2, 0])
    assert sliced._limbs16 is not None  # carried, not re-converted
    fresh = TraceTable(3, 32)
    for i, c in enumerate([4, 2, 0]):
        fresh.cols[i] = t.cols[c][32:64]
    assert np.array_equal(sliced.to_limbs16(), fresh.to_limbs16())
    # without a parent cache the slice stays lazy
    assert TraceTable(2, 8).slice_rows(0, 8)._limbs16 is None
