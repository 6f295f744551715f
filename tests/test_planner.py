"""Segment planner tests (segment_planner.rs inline tests)."""

from zklisp_tpu.compiler import builder as B, compile_str, ops as O
from zklisp_tpu.core import pi as pi_mod
from zklisp_tpu.core.pi import PublicInputs
from zklisp_tpu.prove import planner
from zklisp_tpu.prove.params import ProverOptions


def mkprog(n_ops):
    b = B.ProgramBuilder()
    for i in range(n_ops):
        b.push(O.Const(0, i))
    b.push(O.End())
    return b.finalize(B.CompilerMetrics())


def test_single_segment_small_trace():
    p = mkprog(3)
    segs = planner.plan_segments(p, PublicInputs(),
                                 ProverOptions(max_segment_rows=4096))
    assert len(segs) == 1
    assert segs[0].r_start == 0 and segs[0].r_end == 4 * 32


def test_multi_segment_split_covers_trace():
    p = mkprog(15)  # 16 levels -> 512 rows
    segs = planner.plan_segments(p, PublicInputs(),
                                 ProverOptions(max_segment_rows=128))
    assert segs[0].r_start == 0
    assert segs[-1].r_end == 512
    for a, b in zip(segs, segs[1:]):
        assert a.r_end == b.r_start
    assert all((s.r_end - s.r_start) <= 128 for s in segs)


def test_block_hints_respected():
    src = """
    (def (main)
      (block (let ((a 1)) (+ a (secret-arg 0))))
      (block (let ((b 2)) (+ b (secret-arg 0)))))
    (main)
    """
    p = compile_str(src)
    assert len(p.blocks) >= 2
    segs = planner.plan_segments(p, PublicInputs(),
                                 ProverOptions(max_segment_rows=64))
    assert segs[-1].r_end == max(
        1, 1 << (len(p.ops) - 1).bit_length()) * 32


def test_segment_features_and_mask():
    ops = [O.Const(0, 1), O.Store(0, 0), O.SAbsorbN((0,)), O.SSqueeze(1),
           O.MerkleStepFirst(0, 0, 1), O.End()]
    f = planner.SegmentFeatures.from_ops(ops)
    assert f.vm and f.ram and f.sponge and f.merkle
    pi = PublicInputs(feature_mask=(
        pi_mod.FM_VM | pi_mod.FM_RAM | pi_mod.FM_SPONGE | pi_mod.FM_MERKLE
        | pi_mod.FM_POSEIDON))
    mask = planner.compute_segment_feature_mask(pi, f)
    assert mask == pi.feature_mask
    f2 = planner.SegmentFeatures(vm=True)
    mask2 = planner.compute_segment_feature_mask(pi, f2)
    assert mask2 == pi_mod.FM_VM
