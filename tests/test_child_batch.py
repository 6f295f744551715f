"""Batched per-child aggregation math == the scalar reference path.

The scalar functions (_deep_agg, _fri_layer1_agg, _fri_paths_agg,
_merkle_root_errors) implement agg/trace.rs's re-verification math
one child at a time; agg/child_batch.py computes the same values for a
whole shape group in vectorized limb calls.  Every value must match
exactly."""

import numpy as np
import pytest

from zklisp_tpu.agg import aggregate as agg
from zklisp_tpu.agg import child_batch as cb
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions

SRC = (
    "(def (main a b)\n"
    "  (loop :max 12 ((i 0) (x a) (y b))\n"
    "    x\n"
    "    (recur (+ i 1) y (+ x y))))\n"
)

OPTS = ProverOptions(queries=8, blowup=8, grind=0, min_security_bits=0,
                     max_segment_rows=256)


@pytest.fixture(scope="module")
def bundle():
    prog = compile_entry(SRC, [1, 1])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(1), VmArg.u64(1)])
          .build())
    steps = prover.prove_program(prog, pi, OPTS)
    assert len(steps) >= 3
    agg_pi = agg.build_agg_public(steps)
    agg_pi.pi_digest = pi.digest()
    return steps, agg_pi


def test_batch_matches_scalar(bundle):
    steps, agg_pi = bundle
    beta_deep, beta_l1, delta_depth, beta_paths = \
        agg.derive_agg_fs_weights(agg_pi)
    chs = [agg._child_challenges(s) for s in steps]
    for idxs in cb.group_children(steps, chs):
        grp_steps = [steps[i] for i in idxs]
        grp_chs = [chs[i] for i in idxs]
        got = cb.child_work_batch(grp_steps, grp_chs, beta_deep,
                                  beta_l1, delta_depth, beta_paths)
        for s, ch, g in zip(grp_steps, grp_chs, got):
            t_err, c_err = agg._merkle_root_errors(s, ch)
            assert g["t_err"] == t_err and g["c_err"] == c_err
            assert g["deep"] == agg._deep_agg(s, ch, beta_deep)
            assert g["l1"] == agg._fri_layer1_agg(s, ch, beta_l1)
            exp_path = (agg._fri_path_agg(s, ch, delta_depth, 0)
                        if len(s.proof.inner.fri_openings) >= 2 else 0)
            assert g["path"] == exp_path
            assert g["paths"] == agg._fri_paths_agg(s, ch, delta_depth,
                                                    beta_paths)
            assert g["sample"] == agg._sample_fri_fold(s, ch)


def test_agg_roundtrip_uses_batch_path(bundle, monkeypatch):
    """build_agg_trace's default (batched) path produces a proof that
    verifies — and the trace equals the scalar path's bit for bit."""
    steps, agg_pi = bundle
    tr_batch = agg.build_agg_trace(agg_pi, steps)
    monkeypatch.setenv("ZKL_NO_BATCH_AGG", "1")
    tr_scalar = agg.build_agg_trace(agg_pi, steps)
    monkeypatch.delenv("ZKL_NO_BATCH_AGG")
    assert np.array_equal(np.asarray(tr_batch.to_limbs()),
                          np.asarray(tr_scalar.to_limbs()))
    proof, _ = agg.recursion_prove(steps, agg_pi, OPTS)
    agg.verify_agg(proof, agg_pi)
