"""Device-staged constraint composition: sum_i alpha_i * C_i over the LDE
domain with a compact XLA graph.

The generic ZkLispAir.evaluate_transition traces one expression per
constraint (~500 for a full segment); its Poseidon and ROM blocks are
27-round loops that would dominate the traced graph.  This module
computes the SAME combined composition value split into two parts:

  * scan blocks — the Poseidon (27x12) and ROM (27x3) round constraints
    run under lax.scan (one round body each), with the per-round
    composition coefficients passed as scan inputs;
  * generic constraints — everything else (ctrl/alu/ram/merkle, hold and
    binding rows) walked ONCE per configuration, either evaluated
    directly on FVec columns (host path) or recorded to cvm bytecode
    (device path; see cvm.py).

`_walk` is the single traversal used by both; emission order (and hence
the global alpha index of every constraint) exactly matches
ZkLispAir.evaluate_transition.  Equality with the host path is asserted
in tests/test_device_prover.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as _np

from ..air.zk_air import ZkLispAir
from ..field import f128, limb
from ..field.felt import Felt, FVec
from ..trace.layout import POSEIDON_ROUNDS, VM_USAGE_SPONGE

P = f128.P


# ---------------------------------------------------------------------------
# single traversal: scan specs + generic constraints
# ---------------------------------------------------------------------------

def _walk(air: ZkLispAir, cur, nxt, periodic, generic: Optional[list],
          specs: Optional[list]) -> int:
    """Walk modules in emission order.  Appends (expr, global alpha
    index) for every generic constraint to `generic` and
    (kind, alpha offset) for every scan block to `specs`.  Returns the
    total constraint count (== air.num_transition_constraints())."""
    f = air.features
    ix = 0
    if f.poseidon:
        if specs is not None:
            specs.append(("poseidon", ix))
        ix += POSEIDON_ROUNDS * 12
        ix = _poseidon_generic(air, cur, nxt, periodic, ix, generic)
    if f.vm:
        ix = _generic_block(air, "_eval_ctrl", cur, nxt, periodic, ix,
                            generic)
        ix = _generic_block(air, "_eval_alu", cur, nxt, periodic, ix,
                            generic)
    if f.ram:
        ix = _generic_block(air, "_eval_ram", cur, nxt, periodic, ix,
                            generic)
    if f.merkle:
        ix = _generic_block(air, "_eval_merkle", cur, nxt, periodic, ix,
                            generic)
    if any(air.pub.core.program_commitment):
        if specs is not None:
            specs.append(("rom", ix))
        ix += POSEIDON_ROUNDS * 3
        ix = _rom_generic(air, cur, nxt, periodic, ix, generic)
    assert ix == air.num_transition_constraints(), (
        ix, air.num_transition_constraints())
    return ix


def _generic_block(air, method, cur, nxt, periodic, ix, generic):
    result: List = []
    getattr(air, method)(cur, nxt, periodic, result)
    for tv in result:
        if generic is not None:
            generic.append((tv, ix))
        ix += 1
    return ix


def _poseidon_generic(air, cur, nxt, periodic, ix, generic):
    """Hold constraints (12) + sponge VM->lane bindings (10 when the
    sponge is used); alpha indices continue after the round block."""
    c = air.cols
    p_pad = periodic[1 + POSEIDON_ROUNDS + 1]
    p_pad_last = periodic[1 + POSEIDON_ROUNDS + 2]
    g_hold = p_pad - p_pad_last
    for i in range(12):
        if generic is not None:
            generic.append((g_hold * (nxt[c.lane_index(i)]
                                      - cur[c.lane_index(i)]), ix))
        ix += 1

    sponge_used = bool(air.vm_usage_mask & (1 << VM_USAGE_SPONGE))
    if air.features.vm and air.features.sponge and sponge_used:
        if generic is not None:
            tmp: List = []
            air._eval_poseidon(cur, nxt, periodic, tmp)
            bindings = tmp[POSEIDON_ROUNDS * 12 + 12:]
            assert len(bindings) == 10
            for tv in bindings:
                generic.append((tv, ix))
                ix += 1
        else:
            ix += 10
    return ix


def _rom_generic(air, cur, nxt, periodic, ix, generic):
    """Hold (3) + map encodings (2) after the ROM round block."""
    if generic is not None:
        tmp: List = []
        air._eval_rom(cur, nxt, periodic, tmp)
        for tv in tmp[POSEIDON_ROUNDS * 3:]:
            generic.append((tv, ix))
            ix += 1
        return ix
    n_extra = _rom_extra_count(air)
    return ix + n_extra


def _rom_extra_count(air) -> int:
    return 3 + 2


def collect_generic(air: ZkLispAir, cur, nxt, periodic):
    """(generic [(expr, alpha idx)], scan specs [(kind, alpha offset)])."""
    generic: List = []
    specs: List[Tuple[str, int]] = []
    _walk(air, cur, nxt, periodic, generic, specs)
    return generic, specs


# ---------------------------------------------------------------------------
# scan blocks
# ---------------------------------------------------------------------------

def eval_scan_blocks(air: ZkLispAir, cur, nxt, periodic, alphas_arr,
                     specs, xp, gates=None) -> Optional[FVec]:
    """Sum of the Poseidon/ROM round-constraint contributions, each
    combined with its alpha slice under lax.scan.

    `gates` optionally supplies the 27 round-gate columns as a
    (27, period, 8) array of ONE period each (memory-lean device path);
    by default they are taken full-length from `periodic`."""
    if gates is None:
        gates = xp.stack([periodic[1 + j].a
                          for j in range(POSEIDON_ROUNDS)])
    acc = None
    for kind, ix in specs:
        if kind == "poseidon":
            term = _poseidon_scan(air, cur, nxt, gates, alphas_arr,
                                  ix, xp)
        else:
            term = _rom_scan(air, cur, nxt, gates, alphas_arr, ix, xp)
        acc = term if acc is None else acc + term
    return acc


def _scan_rounds(lanes_cur, lanes_nxt, gate, gr, mds, rc, a_round,
                 n_lanes, xp):
    """Shared 27-round scan: sum_j sum_i a[j,i] * gate_j * (nxt_i - y_ji)
    where y = MDS * cur^3 + rc_j.  gr is (27, period, 8) with period
    dividing N; each round's gate is tiled inside the body."""
    import jax
    N = lanes_cur.shape[1]
    reps = N // gr.shape[1]
    s3 = limb.cube(lanes_cur, xp)                   # (L, N, 8)

    def tile(col):
        if reps == 1:
            return col
        return xp.broadcast_to(
            col[None], (reps,) + col.shape).reshape(N, limb.NLIMB)

    def body(acc_a, inputs):
        gr_j, rc_j, al_j = inputs
        y = limb.dot(mds[:, None, :, :],
                     xp.transpose(s3, (1, 0, 2))[None], xp)   # (L, N, 8)
        y = limb.add(y, rc_j[:, None, :], xp)
        diff = limb.sub(lanes_nxt, y, xp)
        gr_full = tile(gr_j)
        g = limb.mul(gate, gr_full, xp) if gate is not None else gr_full
        gated = limb.mul(diff, g[None], xp)
        term = limb.dot(xp.transpose(gated, (1, 0, 2)),
                        xp.broadcast_to(
                            al_j[None],
                            (gated.shape[1], n_lanes, limb.NLIMB)), xp)
        return limb.add(acc_a, term, xp), None

    zero = limb.zeros((lanes_cur.shape[1],), xp)
    if xp is _np:
        acc_a = zero
        for j in range(POSEIDON_ROUNDS):
            acc_a, _ = body(acc_a, (gr[j], rc[j], a_round[j]))
    else:
        acc_a, _ = jax.lax.scan(body, zero, (gr, rc, a_round))
    return FVec(acc_a, xp)


def _poseidon_scan(air, cur, nxt, gates, alphas_arr, ix, xp) -> FVec:
    c = air.cols
    lanes_cur = xp.stack([cur[c.lane_index(i)].a for i in range(12)])
    lanes_nxt = xp.stack([nxt[c.lane_index(i)].a for i in range(12)])
    pa = cur[c.pose_active].a
    mds = xp.asarray(limb.from_ints(air.poseidon_mds))
    rc = xp.asarray(limb.from_ints(air.poseidon_rc))
    a_round = alphas_arr[ix:ix + POSEIDON_ROUNDS * 12].reshape(
        POSEIDON_ROUNDS, 12, limb.NLIMB)
    return _scan_rounds(lanes_cur, lanes_nxt, pa, gates, mds, rc,
                        a_round, 12, xp)


def _rom_scan(air, cur, nxt, gates, alphas_arr, ix, xp) -> FVec:
    c = air.cols
    s_cur = xp.stack([cur[c.rom_s_index(i)].a for i in range(3)])
    s_nxt = xp.stack([nxt[c.rom_s_index(i)].a for i in range(3)])
    mds = xp.asarray(limb.from_ints(air.rom_mds))
    rc = xp.asarray(limb.from_ints(air.rom_rc))
    a_round = alphas_arr[ix:ix + POSEIDON_ROUNDS * 3].reshape(
        POSEIDON_ROUNDS, 3, limb.NLIMB)
    return _scan_rounds(s_cur, s_nxt, None, gates, mds, rc, a_round,
                        3, xp)


# ---------------------------------------------------------------------------
# combined evaluation (host-verifiable path; used by tests)
# ---------------------------------------------------------------------------

def eval_composition_device(air: ZkLispAir, cur: List[FVec],
                            nxt: List[FVec], periodic: List[FVec],
                            alphas, xp) -> FVec:
    """Combined sum_i alpha_i * C_i (FVec over the evaluation domain).

    `alphas` is either a list of host ints or a (num_constraints, 8)
    limb array (device; traced under jit)."""
    if isinstance(alphas, list):
        alphas_arr = xp.asarray(limb.from_ints(alphas))
    else:
        alphas_arr = alphas

    generic, specs = collect_generic(air, cur, nxt, periodic)
    acc = eval_scan_blocks(air, cur, nxt, periodic, alphas_arr, specs, xp)

    if generic:
        idxs = [g[1] for g in generic]
        N = generic[0][0].a.shape[0]
        stacked = xp.stack([g[0].a for g in generic], axis=1)   # (N,G,8)
        al = alphas_arr[xp.asarray(_np.asarray(idxs))]          # (G,8)
        term = FVec(limb.dot(stacked, xp.broadcast_to(
            al[None], (N, len(idxs), limb.NLIMB)), xp), xp)
        acc = term if acc is None else acc + term
    return acc
