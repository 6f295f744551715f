"""Adversarial transcript surgery on real children — the depth tier of
the reference's tests/agg_basic.rs (1,497 LoC).

Pattern ported from agg_basic.rs: prove a real program, surgically
tamper ONE transcript field of a child StepProof (re-forging the
blake3 root_trace echo where needed, so the tamper reaches the
aggregation MATH rather than the cheap container check), build the
aggregation trace, and assert the specific ERROR COLUMN the agg AIR
constrains to zero (agg/air.rs C2-C3/C16-C23) is now non-zero — or
that the builder rejects outright for profile/meta surgery
(agg/trace.rs per-child checks).
"""

import copy

import pytest

from zklisp_tpu.agg import aggregate as agg
from zklisp_tpu.compiler import builder as B, ops as O
from zklisp_tpu.core.pi import PublicInputsBuilder
from zklisp_tpu.crypto.blake3 import blake3
from zklisp_tpu.prove.params import ProverOptions
from zklisp_tpu.prove.prover import prove_program

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0,
                     max_segment_rows=128)


def mkprog(ops):
    b = B.ProgramBuilder()
    for op in ops:
        b.push(op)
    return b.finalize(B.CompilerMetrics())


@pytest.fixture(scope="module")
def bundle():
    # two-segment chain with enough FRI depth for layer surgery
    prog = mkprog([O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1),
                   O.Mul(3, 2, 2), O.Sub(4, 3, 0), O.Mul(5, 4, 2),
                   O.End()])
    pi = PublicInputsBuilder(prog).build()
    steps = prove_program(prog, pi, OPTS)
    agg_pi = agg.build_agg_public(steps)
    agg_pi.pi_digest = pi.digest()
    return prog, pi, steps, agg_pi


def _reforge_echo(step):
    """Recompute the zl1 root_trace echo after transcript surgery, so
    verify_child_transcript's container check passes and the tamper
    must be caught by the aggregation re-verification math itself
    (the reference's compact-child tests keep the aggregate blake3
    consistent the same way, agg_basic.rs:673-676)."""
    inner = step.proof.inner
    h = bytearray(b"zkl/step/root_trace")
    h += step.proof.header.suite_id
    h += inner.trace_root
    h += inner.constraint_root
    for r in inner.fri_roots:
        h += r
    step.proof.root_trace = blake3(bytes(h))
    return step


def _err_cols(steps, agg_pi, tamper, child: int = 0):
    """Apply `tamper` to a deep copy of steps[child], rebuild the agg
    trace, and return {column_name: values on the child rows}."""
    bad_steps = [copy.deepcopy(s) for s in steps]
    tamper(bad_steps[child])
    _reforge_echo(bad_steps[child])
    bad_pi = agg.build_agg_public(bad_steps)
    bad_pi.pi_digest = agg_pi.pi_digest
    tr = agg.build_agg_trace(bad_pi, bad_steps)
    cols = agg.AggColumns()
    names = ("trace_root_err", "constraint_root_err", "comp_sum",
             "alpha_div_zm_sum", "map_l0_sum", "final_llast_sum")
    return {n: [tr.get(getattr(cols, n), r) for r in range(len(steps))]
            for n in names}


def test_honest_children_have_zero_error_columns(bundle):
    """Accept-side baseline (agg_merkle_binding_accepts_honest_child +
    agg_fri_binding_accepts_honest_child_transcript)."""
    _, _, steps, agg_pi = bundle
    tr = agg.build_agg_trace(agg_pi, steps)
    cols = agg.AggColumns()
    for n in ("trace_root_err", "constraint_root_err", "comp_sum",
              "alpha_div_zm_sum", "map_l0_sum", "final_llast_sum"):
        assert all(v == 0 for v in tr.col(getattr(cols, n))), n


def test_tampered_trace_root_rejected(bundle):
    """agg_merkle_binding_rejects_tampered_trace_root.  A forged trace
    root shifts EVERY replayed FS draw (the coin reseeds with it), so
    either the recorded openings no longer line up with the replayed
    query positions (clean AggError from the structural guard) or the
    Merkle error column fires."""
    _, _, steps, agg_pi = bundle

    def t(s):
        b = bytearray(s.proof.inner.trace_root)
        b[0] ^= 1
        s.proof.inner.trace_root = bytes(b)

    try:
        errs = _err_cols(steps, agg_pi, t)
    except agg.AggError as e:
        assert "replayed" in str(e) or "transcript" in str(e)
        return
    assert errs["trace_root_err"][0] != 0


def test_tampered_constraint_root_sets_merkle_error(bundle):
    _, _, steps, agg_pi = bundle

    def t(s):
        b = bytearray(s.proof.inner.constraint_root)
        b[-1] ^= 0x80
        s.proof.inner.constraint_root = bytes(b)

    errs = _err_cols(steps, agg_pi, t, child=1)
    assert errs["constraint_root_err"][1] != 0


def test_tampered_trace_path_sets_merkle_error(bundle):
    """agg_merkle_binding_rejects_tampered_trace_path: flip one sibling
    hash in one query's Merkle authentication path."""
    _, _, steps, agg_pi = bundle

    def t(s):
        paths = s.proof.inner.trace_openings.paths
        sib = bytearray(paths[0][0])
        sib[3] ^= 4
        paths[0][0] = bytes(sib)
        # the wire format carries the COMPRESSED multiproof; rebuild it
        # so the tamper survives the decompress-at-aggregation path
        from zklisp_tpu.prove import multiproof
        # positions are FS-derived; reuse the structure by clearing the
        # batch so the expanded paths are used directly
        s.proof.inner.trace_openings.batch = None

    errs = _err_cols(steps, agg_pi, t)
    assert errs["trace_root_err"][0] != 0


def test_tampered_opening_row_value_sets_errors(bundle):
    """A single trace opening VALUE flips both the recomputed leaf
    (Merkle error) and the DEEP composition at that query."""
    _, _, steps, agg_pi = bundle

    def t(s):
        rows = s.proof.inner.trace_openings.rows
        rows[0][0] = (rows[0][0] + 1) % (2 ** 128)
        s.proof.inner.trace_openings.batch = None

    errs = _err_cols(steps, agg_pi, t)
    assert errs["trace_root_err"][0] != 0
    assert errs["comp_sum"][0] != 0


def test_tampered_fri_layer_value_sets_fold_errors(bundle):
    """agg_fri_binding_rejects_tampered_fri_layer_value."""
    _, _, steps, agg_pi = bundle
    inner = steps[0].proof.inner
    if not inner.fri_openings:
        pytest.skip("config produced no FRI layers")

    def t(s):
        lo = s.proof.inner.fri_openings[0]
        v0, v1 = lo.pairs[0]
        lo.pairs[0] = ((v0 + 1) % (2 ** 128), v1)
        lo.batch = None

    errs = _err_cols(steps, agg_pi, t)
    assert (errs["comp_sum"][0] != 0
            or errs["alpha_div_zm_sum"][0] != 0
            or errs["map_l0_sum"][0] != 0
            or errs["final_llast_sum"][0] != 0)


def test_tampered_fri_remainder_sets_path_error(bundle):
    """agg_fri_binding_rejects_tampered_fri_final: corrupt one
    remainder polynomial coefficient."""
    _, _, steps, agg_pi = bundle
    inner = steps[0].proof.inner
    if len(inner.fri_openings) < 2:
        pytest.skip("needs >=2 FRI layers for the path aggregate")

    def t(s):
        rem = list(s.proof.inner.fri_remainder)
        rem[0] = (rem[0] + 1) % (2 ** 128)
        s.proof.inner.fri_remainder = rem

    errs = _err_cols(steps, agg_pi, t)
    assert (errs["map_l0_sum"][0] != 0
            or errs["final_llast_sum"][0] != 0)


def test_tampered_ood_frame_sets_deep_error(bundle):
    """OOD frame surgery: the DEEP composition recomputation at every
    query must disagree (agg/trace.rs deep_eval_at_position)."""
    _, _, steps, agg_pi = bundle

    def t(s):
        ood = list(s.proof.inner.ood_trace_current)
        ood[0] = (ood[0] + 1) % (2 ** 128)
        s.proof.inner.ood_trace_current = ood

    errs = _err_cols(steps, agg_pi, t)
    assert errs["comp_sum"][0] != 0


def test_profile_meta_mismatch_rejected(bundle):
    """agg_build_rejects_wrong_profile_meta: the reference compares
    rho/o/lambda/pi_len (agg/trace.rs:336-348; NOT q — that lives in
    profile_queries, next test)."""
    _, _, steps, agg_pi = bundle
    bad = copy.deepcopy(agg_pi)
    bad.profile_meta.lambda_ += 1
    with pytest.raises(agg.AggError, match="profile_meta"):
        agg.build_agg_trace(bad, steps)


def test_profile_queries_mismatch_rejected(bundle):
    """agg/trace.rs:350-354: child meta.q vs profile_queries."""
    _, _, steps, agg_pi = bundle
    bad = copy.deepcopy(agg_pi)
    bad.profile_queries.num_queries += 1
    with pytest.raises(agg.AggError, match="profile_queries|queries"):
        agg.build_agg_trace(bad, steps)


def test_mixed_suite_id_rejected(bundle):
    """agg_build_rejects_mixed_suite_id."""
    _, _, steps, agg_pi = bundle
    bad_steps = [copy.deepcopy(s) for s in steps]
    bad_steps[1].proof.header.suite_id = bytes([9] * 32)
    with pytest.raises(agg.AggError, match="suite"):
        agg.build_agg_trace(agg_pi, bad_steps)


def test_inconsistent_query_count_rejected(bundle):
    """agg_builder_rejects_inconsistent_query_count: a child whose
    constraint openings disagree with its query count must be rejected
    before aggregation math."""
    _, _, steps, agg_pi = bundle
    bad = copy.deepcopy(steps[0])
    bad.proof.inner.constraint_openings.rows = \
        bad.proof.inner.constraint_openings.rows[:-1]
    bad.proof.inner.constraint_openings.batch = None
    with pytest.raises(agg.AggError):
        agg.verify_child_transcript(bad)


def test_wrong_children_order_rejected(bundle):
    """children_root is order-invariant (sorted leaves), but the
    boundary CHAIN is not: swapping two children must set chain
    errors or fail the contiguity check."""
    _, _, steps, agg_pi = bundle
    bad_steps = [copy.deepcopy(s) for s in reversed(steps)]
    try:
        tr = agg.build_agg_trace(agg_pi, bad_steps)
    except agg.AggError:
        return
    cols = agg.AggColumns()
    chain_cols = ("vm_chain_err", "ram_u_chain_err", "ram_s_chain_err",
                  "rom_chain_err_0")
    assert any(
        any(v != 0 for v in tr.col(getattr(cols, n)))
        for n in chain_cols)
