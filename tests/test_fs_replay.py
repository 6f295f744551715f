"""Fiat-Shamir replay tests against real step proofs — the reference's
fs_replay.rs tier: replay the complete transcript (agg/fs.rs order:
coin seed = context ‖ AIR PI elements, reseed trace root, constraint
coefficients, reseed constraint root, OOD point z, OOD-frame hash,
DEEP coefficients, per-layer FRI alphas, PoW check, query positions)
from a proved StepProof and enforce structural invariants plus
determinism and agreement with the openings the prover actually shipped.
"""

import pytest

from zklisp_tpu.agg.aggregate import _child_challenges
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.prove import prover
from zklisp_tpu.prove.params import ProverOptions

OPTS = ProverOptions(queries=20, blowup=8, grind=8, min_security_bits=0)


@pytest.fixture(scope="module")
def step():
    src = "(def (main a) (+ (* a a) 1))"
    prog = compile_entry(src, [6])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(6)]).build())
    steps = prover.prove_program(prog, pi, OPTS)
    assert len(steps) == 1
    return steps[0]


def test_fs_replay_smoke_invariants(step):
    ch = _child_challenges(step)
    inner = step.proof.inner
    opts = inner.context.options
    N = inner.context.trace_len * opts.blowup

    # query positions: deduped, sorted, in-domain, match the openings
    positions = ch["positions"]
    assert positions == sorted(set(positions))
    assert 0 < len(positions) <= opts.num_queries
    assert all(0 <= p < N for p in positions)
    assert len(inner.trace_openings.rows) == len(positions)

    # OOD point present and non-zero
    assert ch["z"] != 0

    # DEEP coefficients: one gamma per trace column, one delta per
    # quotient column
    assert len(ch["gammas"]) == inner.context.trace_width
    assert len(ch["deltas"]) == len(inner.ood_quotient_current)
    assert ch["gammas"]

    # exactly one FRI alpha per committed FRI layer
    assert len(ch["fri_alphas"]) == len(inner.fri_roots)

    # the proof carried a valid grind
    assert ch["pow_ok"]


def test_fs_replay_deterministic(step):
    a = _child_challenges(step)
    b = _child_challenges(step)
    for key in ("alphas", "betas", "z", "gammas", "deltas",
                "fri_alphas", "positions"):
        assert a[key] == b[key], f"challenge {key} not deterministic"


def test_fs_replay_binds_to_roots(step):
    """Tampering with the trace root changes every later challenge —
    the transcript is sequentially binding."""
    import copy

    good = _child_challenges(step)
    bad_step = copy.deepcopy(step)
    root = bytearray(bad_step.proof.inner.trace_root)
    root[0] ^= 1
    bad_step.proof.inner.trace_root = bytes(root)
    bad = _child_challenges(bad_step)
    assert bad["alphas"] != good["alphas"]
    assert bad["z"] != good["z"]
    assert (bad["positions"] != good["positions"]
            or bad["gammas"] != good["gammas"])


def test_fs_replay_grind_rejects_wrong_nonce(step):
    """A proof whose PoW nonce is altered must fail the grinding check
    (unless grind is 0, which this fixture's options exclude)."""
    import copy

    bad_step = copy.deepcopy(step)
    bad_step.proof.inner.pow_nonce ^= 0x5A5A
    ch = _child_challenges(bad_step)
    assert not ch["pow_ok"]
