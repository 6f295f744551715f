"""Device-staged prover: the stark.prove_trace protocol with jit phases.

Produces byte-identical proofs to stark.prove_trace (asserted in tests);
only the execution changes — every heavy phase is traced once per
(program, segment-shape) configuration and dispatched as one XLA
computation, so multi-segment programs compile once and stream segments:

  stage 1  trace LDE + polys      (vmap'd iNTT + coset NTT)
  stage 2  commitments            (batched Poseidon leaves + tree)
  stage 3  composition + quotient (scan evaluator + boundary groups +
                                   quotient split + quotient LDE)
  stage 4  OOD evaluations        (chunked fused dots)
  stage 5  DEEP                   (one fused linear combination)
  stage 6  FRI folds              (one jit per depth, shape-cached)

Fiat-Shamir, grinding, host inversions and query opening remain host-side
(tiny); device->host transfers are roots, OOD scalars and opened rows.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import numpy as _np

import dataclasses

from ..air.zk_air import ZkLispAir
from ..crypto import poseidon as pos
from ..field import f128, limb, ntt
from ..field.felt import FVec
from . import cvm
from .coin import RandomCoin
from .commit import MerkleCommitment
from .composition_device import collect_generic, eval_scan_blocks
from .params import ProofOptions
from .stark import (FriLayerOpenings, ProofContext, QueryOpenings,
                    StarkProof, group_assertions, group_divisor_inv_lde,
                    lde_points_host, transition_zerofier_inv_lde)
from . import kernels

P = f128.P
OFFSET = ntt.DEFAULT_COSET_OFFSET


def _jnp():
    import jax.numpy as jnp
    return jnp


def _to_host_ints(arr) -> List[int]:
    return [int(v) for v in limb.to_ints(_np.asarray(arr))]


@lru_cache(maxsize=None)
def _lde_polys_fn(n: int, blowup: int):
    import jax
    jnp = _jnp()
    N = n * blowup
    pows_f = _np.asarray(ntt.powers_table(N.bit_length() - 1, _np))
    pows_i = _np.asarray(ntt.powers_table(n.bit_length() - 1, _np,
                                          inverse=True))

    def one(col):
        poly = ntt.intt(col, jnp, pows_inv=jnp.asarray(pows_i))
        return poly, ntt.coset_evaluate(poly, blowup, jnp,
                                        pows=jnp.asarray(pows_f))

    return jax.jit(jax.vmap(one))


_STAGE_CACHE: dict = {}


def _config_key(air: ZkLispAir, groups, blowup: int):
    # air_pi.to_elements() covers every public value baked into the traced
    # graph as a constant (feature masks, commitments, rom/ram boundary
    # values, main args); the group tuple covers assertion structure.
    return (air.trace_width, air.trace_len, blowup,
            tuple(air.pub.to_elements()),
            tuple((g.column, g.value, g.offsets, g.step) for g in groups))


def _record_cvm(air: ZkLispAir, n_periodic: int):
    """Record the generic constraints to cvm bytecode + scan specs
    (host-side, milliseconds; cached per configuration)."""
    key = ("cvm", air.trace_width, air.trace_len, n_periodic,
           tuple(air.pub.to_elements()))
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    cur, nxt, per = cvm.sym_leaves(air.trace_width, n_periodic)
    generic, specs = collect_generic(air, cur, nxt, per)
    prog = cvm.compile_constraints(generic)
    out = (prog, tuple(specs))
    _STAGE_CACHE[key] = out
    return out


def _scan_blocks_fn(air: ZkLispAir, specs, blowup: int):
    """jit over the Poseidon/ROM scan blocks; cached on the structural
    key only (layout + specs), reusable across programs."""
    key = ("scan", air.trace_width, air.trace_len, blowup, specs,
           dataclasses.astuple(air.features), air.rom_enabled)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    import jax
    jnp = _jnp()
    w = air.trace_width

    def fn(lde, nxt_arr, periodic_stack, alphas_arr):
        cur = [FVec(lde[c], jnp) for c in range(w)]
        nxt = [FVec(nxt_arr[c], jnp) for c in range(w)]
        periodic = [FVec(periodic_stack[i], jnp)
                    for i in range(periodic_stack.shape[0])]
        acc = eval_scan_blocks(air, cur, nxt, periodic, alphas_arr,
                               specs, jnp)
        return acc.a

    f = jax.jit(fn)
    _STAGE_CACHE[key] = f
    return f


@lru_cache(maxsize=None)
def _quotient_fn(n: int, blowup: int, Q: int, ngb: int):
    """Boundary terms + zerofier + quotient split + quotient LDE; all
    group data traced, so one compile serves every program with the
    same (n, blowup, Q, group-bucket)."""
    import jax
    jnp = _jnp()
    N = n * blowup
    pows_f = _np.asarray(ntt.powers_table(N.bit_length() - 1, _np))
    ones = _np.asarray(limb.from_ints([1] * ngb))

    def fn(comb, group_cols, g_values, divinvs, betas, zinv):
        comp = limb.mul(comb, zinv, jnp)
        numer = limb.sub(group_cols, g_values[:, None], jnp)  # (ngb,N,8)
        terms = limb.mul(limb.mul(numer, divinvs, jnp),
                         betas[:, None], jnp)
        bsum = limb.dot(jnp.transpose(terms, (1, 0, 2)),
                        jnp.broadcast_to(jnp.asarray(ones)[None],
                                         (N, ngb, limb.NLIMB)), jnp)
        comp = limb.add(comp, bsum, jnp)
        coeffs = ntt.coset_interpolate(comp, blowup, jnp)
        q_polys = coeffs[:Q * n].reshape(Q, n, limb.NLIMB)
        q_lde = jax.vmap(lambda p_: ntt.coset_evaluate(
            p_, blowup, jnp, pows=jnp.asarray(pows_f)))(q_polys)
        return q_polys, q_lde

    return jax.jit(fn)


def _bucket(x: int, step: int = 8) -> int:
    return max(step, ((x + step - 1) // step) * step)


@lru_cache(maxsize=None)
def _ood_fn(n_cols: int, n: int):
    import jax
    jnp = _jnp()

    def fn(polys, zpow):
        # polys: (C, n, 8); zpow: (n, 8)
        terms = limb.mul(polys, zpow[None], jnp)
        acc = terms
        while acc.shape[1] > 1:
            m = acc.shape[1]
            chunk = 64 if m >= 64 else m
            rem = m % chunk
            if rem:
                pad = limb.zeros((acc.shape[0], chunk - rem), jnp)
                acc = jnp.concatenate([acc, pad], axis=1)
                m = acc.shape[1]
            resh = acc.reshape(acc.shape[0], m // chunk, chunk, limb.NLIMB)
            ones = jnp.asarray(limb.from_ints([1] * chunk))
            acc = limb.dot(resh, jnp.broadcast_to(ones, resh.shape), jnp)
        return acc[:, 0]

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _deep_fn(w: int, Q: int, N: int):
    import jax
    jnp = _jnp()

    def fn(trace_lde, q_lde, coeffs, gz, gzg, inv_xz, inv_xzg):
        # trace_lde (w,N,8), q_lde (Q,N,8), coeffs (w+Q,8)
        allc = jnp.concatenate([trace_lde, q_lde], axis=0)   # (w+Q,N,8)
        stacked = jnp.transpose(allc, (1, 0, 2))             # (N,w+Q,8)
        gt = limb.dot(stacked, jnp.broadcast_to(
            coeffs[None], (N, w + Q, limb.NLIMB)), jnp)      # (N,8)
        t1 = limb.mul(limb.sub(gt, gz[None], jnp), inv_xz, jnp)
        t2 = limb.mul(limb.sub(gt, gzg[None], jnp), inv_xzg, jnp)
        return limb.add(t1, t2, jnp)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _fold_fn(size: int):
    import jax
    jnp = _jnp()
    half = size // 2

    def fn(layer, alpha, x0, inv_2x0):
        v0 = layer[:half]
        v1 = layer[half:]
        a_f = alpha[None]
        num1 = limb.mul(v0, limb.add(a_f, x0, jnp), jnp)
        num2 = limb.mul(v1, limb.sub(a_f, x0, jnp), jnp)
        return limb.mul(limb.sub(num1, num2, jnp), inv_2x0, jnp)

    return jax.jit(fn)


def _host_tables(air: ZkLispAir, groups, blowup: int):
    """Periodic LDE stack, zerofier inverse, divisor inverses (host np;
    cached per configuration)."""
    key = ("tables",) + _config_key(air, groups, blowup)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    n = air.trace_len
    periodic_stack = _np.stack(
        [p.a for p in air.periodic_lde(blowup, _np)])
    zinv = transition_zerofier_inv_lde(n, blowup, _np).a
    divinvs = _np.stack(
        [d.a for d in group_divisor_inv_lde(groups, n, blowup, _np)])
    out = (periodic_stack, zinv, divinvs)
    _STAGE_CACHE[key] = out
    return out


def _commit_device(rows, partition_size: int) -> MerkleCommitment:
    levels = kernels.commit_device(rows, partition_size)
    levels_h = [_np.asarray(lv) for lv in levels]
    root_fe = int(limb.to_ints(levels_h[-1])[0])
    return MerkleCommitment(levels_h, root_fe)


@lru_cache(maxsize=None)
def _x0_tables(size: int):
    """(x0s, inv(2*x0)) for a FRI layer of `size` (host limb arrays)."""
    half = size // 2
    wd = f128.get_root_of_unity(size)
    inv2 = f128.inv(2)
    x0s, invs = [], []
    cx = OFFSET
    inv_w = f128.inv(wd)
    inv_cx = f128.mul(inv2, f128.inv(OFFSET))
    for _ in range(half):
        x0s.append(cx)
        invs.append(inv_cx)
        cx = f128.mul(cx, wd)
        inv_cx = f128.mul(inv_cx, inv_w)
    return limb.from_ints(x0s), limb.from_ints(invs)


def prove_trace_device(trace, air: ZkLispAir, air_pi,
                       options: ProofOptions) -> StarkProof:
    import jax
    jnp = _jnp()
    n = trace.length
    w = trace.width
    blowup = options.blowup
    N = n * blowup
    context = ProofContext(w, n, options)
    Q = air.ce_blowup()

    # stage 1: trace polys + LDE
    cols_limbs = jnp.asarray(trace.to_limbs())
    trace_polys, trace_lde = _lde_polys_fn(n, blowup)(cols_limbs)

    # stage 2: trace commitment
    ps_main = options.partition_size(w)
    rows = jnp.transpose(trace_lde, (1, 0, 2))
    trace_comm = _commit_device(rows, ps_main)

    coin = RandomCoin(context.to_elements() + air_pi.to_elements())
    coin.reseed(trace_comm.root)

    groups = group_assertions(air.get_assertions(), n)
    alphas = coin.draw_many(air.num_transition_constraints())
    betas = coin.draw_many(len(groups))

    # config-constant tables, built host-side once and shipped to device
    periodic_h, zinv_h, divinvs_h = _host_tables(air, groups, blowup)
    periodic_dev = jnp.asarray(periodic_h)
    alphas_dev = jnp.asarray(limb.from_ints(alphas))

    # stage 3: composition = scan blocks + bytecode VM + quotient jit
    prog_cvm, specs = _record_cvm(air, periodic_h.shape[0])
    nxt_arr = jnp.roll(trace_lde, -blowup, axis=1)
    if specs:
        acc_scan = _scan_blocks_fn(air, specs, blowup)(
            trace_lde, nxt_arr, periodic_dev, alphas_dev)
    else:
        acc_scan = None
    if prog_cvm.n_instr:
        acc_gen = cvm.execute(prog_cvm, trace_lde, nxt_arr, periodic_dev,
                              alphas_dev)
        comb = (acc_gen if acc_scan is None
                else limb.add(acc_scan, acc_gen, jnp))
    else:
        comb = acc_scan

    ng = len(groups)
    ngb = _bucket(ng)
    cols_idx = _np.asarray([g.column for g in groups]
                           + [0] * (ngb - ng), dtype=_np.int32)
    group_cols = trace_lde[jnp.asarray(cols_idx)]
    g_vals = _np.zeros((ngb, limb.NLIMB), dtype=_np.uint32)
    g_vals[:ng] = limb.from_ints([g.value for g in groups])
    betas_pad = _np.zeros((ngb, limb.NLIMB), dtype=_np.uint32)
    betas_pad[:ng] = limb.from_ints(betas)
    div_pad = _np.zeros((ngb, N, limb.NLIMB), dtype=_np.uint32)
    div_pad[:ng] = divinvs_h
    q_polys, q_lde = _quotient_fn(n, blowup, Q, ngb)(
        comb, group_cols, jnp.asarray(g_vals), jnp.asarray(div_pad),
        jnp.asarray(betas_pad), jnp.asarray(zinv_h))

    ps_con = options.partition_size(Q)
    q_rows = jnp.transpose(q_lde, (1, 0, 2))
    constraint_comm = _commit_device(q_rows, ps_con)
    coin.reseed(constraint_comm.root)

    # stage 4: OOD
    z = coin.draw()
    g_trace = f128.get_root_of_unity(n)
    zg = f128.mul(z, g_trace)

    def zpows(zz):
        out, cur = [], 1
        for _ in range(n):
            out.append(cur)
            cur = f128.mul(cur, zz)
        return jnp.asarray(limb.from_ints(out))

    ood_fn_t = _ood_fn(w, n)
    ood_fn_q = _ood_fn(Q, n)
    zp, zgp = zpows(z), zpows(zg)
    ood_t_cur = _to_host_ints(ood_fn_t(trace_polys, zp))
    ood_t_next = _to_host_ints(ood_fn_t(trace_polys, zgp))
    ood_q_cur = _to_host_ints(ood_fn_q(q_polys, zp))
    ood_q_next = _to_host_ints(ood_fn_q(q_polys, zgp))
    ood_evals = ood_t_cur + ood_q_cur + ood_t_next + ood_q_next
    coin.reseed(pos.hash_elements(ood_evals))

    # stage 5: DEEP
    gammas = coin.draw_many(w)
    deltas = coin.draw_many(Q)
    gz = sum(g * t for g, t in zip(gammas, ood_t_cur)) % P
    gz = (gz + sum(d * q for d, q in zip(deltas, ood_q_cur))) % P
    gzg = sum(g * t for g, t in zip(gammas, ood_t_next)) % P
    gzg = (gzg + sum(d * q for d, q in zip(deltas, ood_q_next))) % P

    xs_int = lde_points_host(n, blowup)
    inv_xz = jnp.asarray(limb.from_ints(
        f128.batch_inv([(x - z) % P for x in xs_int])))
    inv_xzg = jnp.asarray(limb.from_ints(
        f128.batch_inv([(x - zg) % P for x in xs_int])))
    coeffs = jnp.asarray(limb.from_ints(gammas + deltas))
    deep = _deep_fn(w, Q, N)(
        trace_lde, q_lde, coeffs,
        jnp.asarray(limb.from_ints([gz]))[0],
        jnp.asarray(limb.from_ints([gzg]))[0], inv_xz, inv_xzg)

    # stage 6: FRI
    num_layers = options.num_fri_layers(N)
    fri_layers_vals = []
    fri_comms: List[MerkleCommitment] = []
    layer = deep
    size = N
    for d in range(num_layers):
        half = size // 2
        pair_rows = jnp.stack([layer[:half], layer[half:]], axis=1)
        comm = _commit_device(pair_rows, 2)
        fri_comms.append(comm)
        fri_layers_vals.append(_np.asarray(layer))
        coin.reseed(comm.root)
        alpha = coin.draw()
        x0s, inv2x0 = _x0_tables(size)
        layer = _fold_fn(size)(
            layer, jnp.asarray(limb.from_ints([alpha]))[0],
            jnp.asarray(x0s), jnp.asarray(inv2x0))
        size = half

    rem_host = _np.asarray(layer)
    rem_coeffs = ntt.coset_interpolate(rem_host, 1, _np)
    rem_ints = _to_host_ints(rem_coeffs)
    max_deg = options.fri_remainder_max_degree
    assert all(v == 0 for v in rem_ints[max_deg + 1:]), \
        "FRI remainder degree too high"
    fri_remainder = list(reversed(rem_ints[:max_deg + 1]))

    # grinding + positions (host)
    pow_nonce = coin.grind(options.grinding_factor)
    positions = sorted(set(coin.draw_integers(
        options.num_queries, N, pow_nonce)))

    # openings
    rows_host = _np.asarray(rows)
    q_rows_host = _np.asarray(q_rows)

    def open_rows(comm: MerkleCommitment, mat_rows, idxs) -> QueryOpenings:
        out_rows, out_paths = [], []
        for p_ in idxs:
            out_rows.append([int(v) for v in limb.to_ints(mat_rows[p_])])
            out_paths.append(comm.open(p_))
        return QueryOpenings(out_rows, out_paths)

    trace_open = open_rows(trace_comm, rows_host, positions)
    constraint_open = open_rows(constraint_comm, q_rows_host, positions)

    fri_open: List[FriLayerOpenings] = []
    pos_d = positions
    size_d = N
    for d in range(num_layers):
        half = size_d // 2
        folded = []
        for p_ in pos_d:
            m = p_ % half
            if m not in folded:
                folded.append(m)
        layer_host = fri_layers_vals[d]
        pairs, paths = [], []
        for m in folded:
            v0 = int(limb.to_ints(layer_host[m:m + 1])[0])
            v1 = int(limb.to_ints(layer_host[half + m:half + m + 1])[0])
            pairs.append((v0, v1))
            paths.append(fri_comms[d].open(m))
        fri_open.append(FriLayerOpenings(pairs, paths))
        pos_d = folded
        size_d = half

    return StarkProof(
        context=context,
        trace_root=trace_comm.root,
        constraint_root=constraint_comm.root,
        ood_trace_current=ood_t_cur,
        ood_trace_next=ood_t_next,
        ood_quotient_current=ood_q_cur,
        ood_quotient_next=ood_q_next,
        fri_roots=[c.root for c in fri_comms],
        fri_remainder=fri_remainder,
        pow_nonce=pow_nonce,
        trace_openings=trace_open,
        constraint_openings=constraint_open,
        fri_openings=fri_open,
    )
