"""Streamed trace source must reproduce the full-trace path exactly:
per-segment tables cell-for-cell and boundary public inputs equal.
(The expensive end-to-end check — streamed StepProofs byte-identical to
full-path proofs — was validated separately; these tests keep the fast
invariants in CI.)"""

from zklisp_tpu.air.airpi import segment_boundaries_from_full
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import planner
from zklisp_tpu.prove.params import ProverOptions
from zklisp_tpu.trace import build as tb
from zklisp_tpu.trace.layout import Columns
from zklisp_tpu.trace.stream import StreamedTrace

RAM_SPONGE_SRC = """
(def (main a)
  (begin
    (store 1 a)
    (store 2 (safe-add (load 1) 5))
    (push (load 2))
    (loop :max 30 ((i 0) (x a))
      (begin (store 3 x) x)
      (recur (+ i 1) (hash2 x (load 3))))
    (pop)))
"""

MERKLE_SRC = """
(def (main)
  (let ((leaf 5))
    (merkle-verify leaf ((0 11) (1 22)))))
"""


def _check_equality(src, args, vmargs, max_rows):
    prog = compile_entry(src, args)
    pi = PublicInputsBuilder(prog).with_main_args(vmargs).build()
    opts = ProverOptions(queries=8, blowup=8, grind=0,
                         min_security_bits=0, max_segment_rows=max_rows)
    segs = planner.plan_segments(prog, pi, opts)
    assert len(segs) > 1, "test needs multiple segments"
    full = tb.build_trace(prog, pi)
    strm = StreamedTrace(prog, pi, segs)
    cols = Columns.baseline()
    ident = list(range(cols.width()))
    for seg in segs:
        want = full.slice_rows(seg.r_start, seg.r_end, ident)
        got = strm.segment_table(seg)
        for c in range(cols.width()):
            assert want.cols[c] == got.cols[c], f"col {c} differs"
        assert segment_boundaries_from_full(full, seg) \
            == strm.boundaries(seg)


def test_stream_matches_full_ram_sponge():
    _check_equality(RAM_SPONGE_SRC, [7], [VmArg.u64(7)], 1024)


def test_stream_matches_full_merkle_small_segments():
    _check_equality(MERKLE_SRC, [], [], 128)


def test_stream_boundary_chaining_hashes():
    """State hashes from streamed windows chain across segments."""
    prog = compile_entry(RAM_SPONGE_SRC, [7])
    pi = PublicInputsBuilder(prog).with_main_args([VmArg.u64(7)]).build()
    opts = ProverOptions(queries=8, blowup=8, grind=0,
                         min_security_bits=0, max_segment_rows=1024)
    segs = planner.plan_segments(prog, pi, opts)
    strm = StreamedTrace(prog, pi, segs)
    from zklisp_tpu.prove.prover import _segment_layout
    prev = None
    for seg in segs:
        _, layout = _segment_layout(prog, pi, seg)
        window = strm.segment_table(seg)
        _, s_in, s_out = tb.segment_from_window(window, layout, prev)
        prev = tb.PrevState(s_out)
