"""Device-staged prover: the stark.prove_trace protocol with jit phases.

Produces byte-identical proofs to stark.prove_trace (asserted in tests);
only the execution changes — every heavy phase is traced once per
(program, segment-shape) configuration and dispatched as XLA
computations, so multi-segment programs compile once and stream segments:

  stage 1  trace LDE + polys      (vmap'd iNTT + coset NTT)
  stage 2  commitments            (row-chunked Poseidon leaves + tree)
  stage 3  composition            (Poseidon/ROM lax.scan blocks +
                                   constraint bytecode VM — see cvm.py)
           quotient               (boundary groups + zerofier + split +
                                   quotient LDE in one jit)
  stage 4  OOD evaluations        (chunked fused dots)
  stage 5  DEEP                   (row-chunked fused linear combination)
  stage 6  FRI folds              (one jit per depth, shape-cached)

Fiat-Shamir, grinding, host inversions and query opening remain host-side
(tiny); device->host transfers are roots, OOD scalars and opened rows.

Memory design (16 GB chip, flagship 2^16 rows x 219 cols x blowup 16):
the (w, N, 8) trace LDE (~7.3 GB) is the only full-size resident; `nxt`
columns are rolls taken inside kernels, periodic selectors and cyclic
assertion-group divisor inverses are passed as ONE period and tiled
in-kernel, and row-major views for hashing/DEEP are produced in bounded
chunks (<= 0.5 GB transient) instead of a full 7.3 GB transpose.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import List

import numpy as _np

from ..air.zk_air import ZkLispAir, _p_last_lde
from ..crypto import poseidon as pos
from ..crypto import poseidon_jax as pj
from ..field import f128, limb, ntt
from ..field.felt import FVec
from . import cvm, kernels
from .coin import RandomCoin
from .commit import MerkleCommitment
from .composition_device import collect_generic, eval_scan_blocks
from .params import ProofOptions
from .stark import (FriLayerOpenings, ProofContext, QueryOpenings,
                    StarkProof, group_assertions, lde_points_host,
                    transition_zerofier_inv_lde)
from ..trace.layout import STEPS_PER_LEVEL_P2

P = f128.P
OFFSET = ntt.DEFAULT_COSET_OFFSET
ROW_CHUNK = 1 << 16          # bounds transient row-major buffers


def _jnp():
    import jax.numpy as jnp
    return jnp


def _to_host_ints(arr) -> List[int]:
    return [int(v) for v in limb.to_ints(_np.asarray(arr))]


_STAGE_CACHE: dict = {}


def _config_key(air: ZkLispAir, blowup: int):
    # air_pi.to_elements() covers every public value baked into the traced
    # graph as a constant (feature masks, commitments, rom/ram boundary
    # values, main args).
    return (air.trace_width, air.trace_len, blowup,
            tuple(air.pub.to_elements()))


# ---------------------------------------------------------------------------
# stage 1: LDE
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _lde_polys_fn(n: int, blowup: int):
    # NOTE: never pass host-precomputed powers tables here — inside jit
    # they bake as N x 32 B MLIR constants (the 40 MB modules that
    # crashed the tunneled TPU's AOT helper); ntt builds them on device
    # from log2(N) scalar seeds instead.
    import jax
    jnp = _jnp()

    def one(col):
        col = col.astype(jnp.uint32)
        poly = ntt.intt(col, jnp)
        return poly, ntt.coset_evaluate(poly, blowup, jnp)

    return jax.jit(jax.vmap(one))


# ---------------------------------------------------------------------------
# stage 2: commitments (row-chunked)
# ---------------------------------------------------------------------------

def _leaf_chunk_fn(n_cols: int, partition_size: int, chunk: int):
    # keyed on the FS-hasher rounds baked in at trace time
    return _leaf_chunk_fn_impl(n_cols, partition_size, chunk,
                               pos.hasher_rounds())


@lru_cache(maxsize=None)
def _leaf_chunk_fn_impl(n_cols: int, partition_size: int, chunk: int,
                        rounds: int):
    import jax
    jnp = _jnp()

    def fn(block):                       # (C, chunk, 8) column-major
        rows = jnp.transpose(block, (1, 0, 2))
        return pj.hash_rows_partitioned(rows, partition_size, jnp)

    return jax.jit(fn)


class _DevCommitment:
    """Merkle commitment whose levels stay on device.

    Only the root crosses to host at commit time (needed for FS
    reseeding); sibling paths are gathered on device and transferred in
    ONE small copy per commitment (`open_paths`).  Transferring full
    trees over the tunneled device costs seconds per segment.
    """

    def __init__(self, levels, root_fe: int | None = None) -> None:
        self.levels = levels                     # device arrays, (m, 8)
        # root_fe given: caller already transferred it (e.g. the fused
        # FRI chain returns all layer roots in one copy) — skip the
        # per-commitment device sync.
        self.root_fe = (int(limb.to_ints(_np.asarray(levels[-1]))[0])
                        if root_fe is None else root_fe)

    @property
    def root(self) -> bytes:
        return f128.fe_to_bytes_fold(self.root_fe)

    def open_paths(self, positions, pad_to: int = 0) -> List[List[bytes]]:
        """Sibling paths (bottom-up) for the given leaf indices.

        pad_to: pad the gather to this many indices (repeating the last)
        so the dispatched gather shapes are IDENTICAL across segments —
        deduped query counts vary per segment, and every distinct count
        otherwise triggers a fresh device compile of all level gathers.
        All levels are gathered in ONE jitted dispatch + ONE transfer
        per commitment (eager per-level gathers cost ~10 ms dispatch
        latency each over the tunneled device).
        """
        jnp = _jnp()
        if not positions:
            return []
        nq = len(positions)
        padded = list(positions) + [positions[-1]] * max(0, pad_to - nq)
        idx = jnp.asarray(_np.asarray(padded, dtype=_np.int32))
        depth = len(self.levels) - 1
        shapes = tuple(l.shape[0] for l in self.levels[:-1])
        flat = _np.asarray(
            _open_paths_fn(shapes)(tuple(self.levels[:-1]), idx))
        npad = len(padded)
        fes = limb.to_ints(flat)                 # (depth * npad,)
        paths = []
        for j in range(nq):
            paths.append([f128.fe_to_bytes_fold(int(fes[d * npad + j]))
                          for d in range(depth)])
        return paths


@lru_cache(maxsize=None)
def _fri_vals_fn(layer_sizes):
    """jitted (layers..., idxs (L, K)) -> (L*K, 8) value gather."""
    import jax
    jnp = _jnp()

    def fn(layers, idxs):
        return jnp.concatenate(
            [layer[idxs[d]] for d, layer in enumerate(layers)], axis=0)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _open_paths_multi_fn(level_sizes_per_comm):
    """jitted sibling-path gather across MANY commitments at once.

    level_sizes_per_comm: tuple (one entry per commitment) of tuples of
    level sizes (excluding the root).  idxs is (n_comms, npad); returns
    (sum(depths) * npad, 8) — all siblings of all commitments in one
    dispatch + one transfer (the per-commitment variant costs a device
    round-trip per FRI layer)."""
    import jax
    jnp = _jnp()

    def fn(levels_nested, idxs):
        out = []
        for ci, levels in enumerate(levels_nested):
            cur = idxs[ci]
            for level in levels:
                out.append(level[cur ^ 1])
                cur = cur >> 1
        return jnp.concatenate(out, axis=0)

    return jax.jit(fn)


def open_paths_multi(comms: List["_DevCommitment"], positions_per_comm,
                     pad_to: int) -> List[List[List[bytes]]]:
    """Batched _DevCommitment.open_paths over several commitments.

    Returns, per commitment, the same structure open_paths returns."""
    jnp = _jnp()
    idx_rows = []
    for ps in positions_per_comm:
        padded = list(ps) + [ps[-1]] * (pad_to - len(ps))
        idx_rows.append(_np.asarray(padded, dtype=_np.int32))
    shapes = tuple(tuple(l.shape[0] for l in c.levels[:-1]) for c in comms)
    flat = _np.asarray(_open_paths_multi_fn(shapes)(
        tuple(tuple(c.levels[:-1]) for c in comms),
        jnp.asarray(_np.stack(idx_rows))))
    fes = limb.to_ints(flat)
    out: List[List[List[bytes]]] = []
    off = 0
    for ci, c in enumerate(comms):
        depth = len(c.levels) - 1
        nq = len(positions_per_comm[ci])
        paths = [[f128.fe_to_bytes_fold(int(fes[off + d * pad_to + j]))
                  for d in range(depth)] for j in range(nq)]
        out.append(paths)
        off += depth * pad_to
    return out


@lru_cache(maxsize=None)
def _open_paths_fn(level_sizes):
    """jitted (levels..., idx) -> (depth*npad, 8) sibling gather."""
    import jax
    jnp = _jnp()

    def fn(levels, idx):
        cur = idx
        out = []
        for level in levels:
            out.append(level[cur ^ 1])
            cur = cur >> 1
        return jnp.concatenate(out, axis=0)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _lde_cols_mapped_fn(n: int, blowup: int, n_chunks: int):
    """LDE over a flat column axis in ONE dispatch with a bounded
    transient: lax.map over column chunks keeps the NTT's 16-bit
    limb-product intermediate (~512 B x N per column) to one chunk at a
    time.  The caller reshapes (C, n, 8) -> (n_chunks, C/n_chunks, n, 8).

    Motivation: the tunneled TPU's AOT compile rejects graphs whose
    peak allocation exceeds HBM, and a wave's flat vmap over S x 219
    columns materializes a multi-10 GB product tensor; chunking bounds
    it regardless of wave width."""
    import jax
    jnp = _jnp()

    def one(col):
        # powers tables build on device (log2(N) scalar seeds) — host
        # tables would bake as multi-MB MLIR constants, see _lde_polys_fn
        col = col.astype(jnp.uint32)
        poly = ntt.intt(col, jnp)
        return poly, ntt.coset_evaluate(poly, blowup, jnp)

    def fn(chunked):                      # (n_chunks, cc, n, 8)
        return jax.lax.map(jax.vmap(one), chunked)

    return jax.jit(fn)


def _commit_cols_fn(C: int, N: int, chunk: int, partition_size: int):
    """Whole column-major commit (leaf hashing + tree) in ONE dispatch.

    lax.map over row chunks bounds the transposed working set to chunk
    rows; the host-driven chunk loop costs a dispatch round-trip per
    chunk over the tunneled device.

    The jitted body bakes the FS-hasher round count at trace time, so
    the cache must key on it (a process that switches
    ZKL_POSEIDON_HASHER_ROUNDS — e.g. the full-strength slow-tier test
    — would otherwise reuse a stale executable)."""
    return _commit_cols_fn_impl(C, N, chunk, partition_size,
                                pos.hasher_rounds())


@lru_cache(maxsize=None)
def _commit_cols_fn_impl(C: int, N: int, chunk: int,
                         partition_size: int, rounds: int):
    import jax
    jnp = _jnp()

    def fn(cols_arr):
        def body(i):
            blk = jax.lax.dynamic_slice_in_dim(cols_arr, i * chunk,
                                               chunk, 1)
            rows = jnp.transpose(blk, (1, 0, 2))
            return pj.hash_rows_partitioned(rows, partition_size, jnp)

        leaves = jax.lax.map(body, jnp.arange(N // chunk))
        return tuple(pj.merkle_tree(leaves.reshape(N, limb.NLIMB), jnp))

    return jax.jit(fn)


def _commit_cols_device(cols_arr, partition_size: int) -> _DevCommitment:
    """Commit to the rows of a column-major (C, N, 8) array without ever
    materializing the full row-major transpose."""
    jnp = _jnp()
    C, N = cols_arr.shape[0], cols_arr.shape[1]
    chunk = min(ROW_CHUNK, N)
    if N % chunk == 0:
        return _DevCommitment(
            _commit_cols_fn(C, N, chunk, partition_size)(cols_arr))
    fn = _leaf_chunk_fn(C, partition_size, chunk)
    parts = [fn(cols_arr[:, s:s + chunk]) for s in range(0, N, chunk)]
    leaves = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    levels = kernels.merkle_levels_fn(N)(leaves)
    return _DevCommitment(levels)


def _commit_rows_device(rows, partition_size: int) -> _DevCommitment:
    """Commit to an already row-major (N, W, 8) array (small widths)."""
    levels = kernels.commit_device(rows, partition_size)
    return _DevCommitment(levels)


@lru_cache(maxsize=None)
def _gather_rows_fn(n_cols: int, nq: int):
    import jax
    jnp = _jnp()

    def fn(cols_arr, idx):
        return jnp.transpose(cols_arr[:, idx], (1, 0, 2))   # (nq, C, 8)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# stage 3: composition + quotient
# ---------------------------------------------------------------------------

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
    """jit over the Poseidon/ROM scan blocks; cached per (structure,
    suite): the jitted closure bakes the AIR's Poseidon round
    constants / MDS, which derive from the program id — two programs
    with identical layout MUST NOT share this executable (a collision
    here silently evaluates one program's constraints with the other
    program's round constants)."""
    key = ("scan", air.trace_width, air.trace_len, blowup, specs,
           dataclasses.astuple(air.features), air.rom_enabled,
           air.pub.core.program_id)
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    import jax
    jnp = _jnp()
    w = air.trace_width

    def fn(lde, gates_p, alphas_arr):
        cur = [FVec(lde[c], jnp) for c in range(w)]
        nxt = [FVec(jnp.roll(lde[c], -blowup, axis=0), jnp)
               for c in range(w)]
        acc = eval_scan_blocks(air, cur, nxt, None, alphas_arr, specs,
                               jnp, gates=gates_p)
        return acc.a

    f = jax.jit(fn)
    _STAGE_CACHE[key] = f
    return f


@lru_cache(maxsize=None)
def _quotient_fn(n: int, blowup: int, Q: int, ngc: int, ngs: int,
                 dperiod: int, blowup_c: int = 0):
    """Boundary terms + zerofier + quotient split + quotient LDE.

    Returns a plain Python function composing TWO jitted executables
    (_quotient_comp_fn for the boundary/zerofier scans,
    _quotient_finish_fn for the interpolate/evaluate tail).  The
    single fused executable this used to be triggers hard crashes in
    jaxlib 0.9.0's XLA:CPU path — aborts/SIGSEGVs in compile-and-load,
    serialize AND deserialize, at every trace size — while the two
    halves are stable.  Results are exact integer field math either
    way, so proof bytes are unchanged.

    blowup_c (default = blowup) is the COMPOSITION evaluation domain
    blowup: the quotient polynomial has degree < Q*n (the capacity
    invariant tests/test_deg.py enforces), so evaluating composition
    on the blowup_c=Q sub-domain — the even-index subset of the full
    LDE — determines it exactly and halves the constraint-eval work at
    blowup 16.  comb/lde/divisor/zinv inputs must be sampled on that
    sub-domain; q_polys (and therefore the proof bytes) are identical
    to the full-domain evaluation."""
    comp_fn = _quotient_comp_fn(n, ngc, ngs, dperiod,
                                blowup_c or blowup)
    finish_fn = _quotient_finish_fn(n, blowup, Q, blowup_c or blowup)

    def quotient(comb, lde, cyc_idx, cyc_vals, cyc_divp, cyc_betas,
                 sgl_idx, sgl_vals, sgl_div, sgl_betas, zinv):
        comp = comp_fn(comb, lde, cyc_idx, cyc_vals, cyc_divp,
                       cyc_betas, sgl_idx, sgl_vals, sgl_div,
                       sgl_betas, zinv)
        return finish_fn(comp)

    return quotient


@lru_cache(maxsize=None)
def _quotient_comp_fn(n: int, ngc: int, ngs: int, dperiod: int,
                      blowup_c: int):
    """Boundary-term scans + zerofier apply: comb -> comp (N_c, 8).

    zkl_nocache: its persistent-cache entries crash XLA:CPU
    (de)serialization in jaxlib 0.9.0 (utils/jitcache skips them)."""
    import jax
    jnp = _jnp()
    N = n * blowup_c

    def zkl_nocache_quotient_comp(comb, lde, cyc_idx, cyc_vals,
                                  cyc_divp, cyc_betas, sgl_idx,
                                  sgl_vals, sgl_div, sgl_betas, zinv):
        comp = limb.mul(comb, zinv, jnp)
        # Boundary terms accumulate via lax.scan ONE GROUP AT A TIME:
        # the vectorized form materializes the limb-mul's 512 B/element
        # product transient for (n_groups x N) at once — 8 GB HBM at
        # ngc=64, N=65536, wave 4 (measured RESOURCE_EXHAUSTED) — while
        # the scan caps it at one group's N x 512 B.  Field addition is
        # exact mod p, so the serialized sum is bit-identical.
        if ngc:
            # fold beta into the (tiny) periodic divisor table first —
            # saves a full-domain limb mul per group
            divp_b = limb.mul(cyc_divp, cyc_betas[:, None], jnp)

            def cyc_body(acc, xs):
                idx, val, dp = xs
                numer = limb.sub(lde[idx], val[None], jnp)
                resh = numer.reshape(N // dperiod, dperiod, limb.NLIMB)
                term = limb.mul(resh, dp[None], jnp)
                return limb.add(acc, term.reshape(N, limb.NLIMB),
                                jnp), None

            comp, _ = jax.lax.scan(cyc_body, comp,
                                   (cyc_idx, cyc_vals, divp_b))
        if ngs:
            def sgl_body(acc, xs):
                idx, val, dv, beta = xs
                numer = limb.sub(lde[idx], val[None], jnp)
                term = limb.mul(limb.mul(numer, dv, jnp), beta[None],
                                jnp)
                return limb.add(acc, term, jnp), None

            comp, _ = jax.lax.scan(sgl_body, comp,
                                   (sgl_idx, sgl_vals, sgl_div,
                                    sgl_betas))
        return comp

    return jax.jit(zkl_nocache_quotient_comp)


@lru_cache(maxsize=None)
def _quotient_finish_fn(n: int, blowup: int, Q: int, blowup_c: int):
    """comp (N_c, 8) -> (q_polys (Q, n, 8), q_lde (Q, N, 8))."""
    import jax
    jnp = _jnp()

    def zkl_nocache_quotient_finish(comp):
        coeffs = ntt.coset_interpolate(comp, blowup_c, jnp)
        q_polys = coeffs[:Q * n].reshape(Q, n, limb.NLIMB)
        q_lde = jax.vmap(lambda p_: ntt.coset_evaluate(
            p_, blowup, jnp))(q_polys)
        return q_polys, q_lde

    return jax.jit(zkl_nocache_quotient_finish)


def _bucket(x: int, step: int = 8) -> int:
    return max(step, ((x + step - 1) // step) * step)


def _host_tables(air: ZkLispAir, groups, blowup: int):
    """Config-constant host tables: one-period periodic selectors,
    p_last, zerofier inverse, and divisor inverses (cyclic groups as one
    period; singles full-length).  Cached per configuration."""
    # Key on layout structure + group STRUCTURE only: the tables
    # (periodic selectors, p_last, zerofier and divisor inverses) depend
    # on offsets/steps but never on assertion values or boundary public
    # inputs, so all segments of a run share one entry (the old key
    # included air_pi.to_elements() and missed on every segment).
    key = ("tables", air.trace_width, air.trace_len, blowup,
           dataclasses.astuple(air.features), air.rom_enabled,
           tuple((g.column, g.offsets, g.step) for g in groups))
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    n = air.trace_len
    N = n * blowup
    cycle = STEPS_PER_LEVEL_P2
    dperiod = cycle * blowup

    per_p = _np.asarray(limb.from_ints(air.periodic_lde_period(blowup)))
    p_last = _p_last_lde(n, blowup, _np).a
    zinv = transition_zerofier_inv_lde(n, blowup, _np).a

    cyc_pos = [i for i, g in enumerate(groups) if not g.is_single]
    sgl_pos = [i for i, g in enumerate(groups) if g.is_single]
    cyc = [groups[i] for i in cyc_pos]
    sgl = [groups[i] for i in sgl_pos]
    g = f128.get_root_of_unity(n)
    wN = f128.get_root_of_unity(N)
    k = n // cycle

    cyc_divp = _np.zeros((0, dperiod, limb.NLIMB), dtype=_np.uint32)
    if cyc:
        xk_vals = []
        cur = pow(OFFSET, k, P)
        wk = pow(wN, k, P)
        for _ in range(dperiod):
            xk_vals.append(cur)
            cur = f128.mul(cur, wk)
        flat = []
        for grp in cyc:
            roots = [pow(g, o * k, P) for o in grp.offsets]
            for xv in xk_vals:
                prod = 1
                for r in roots:
                    prod = prod * ((xv - r) % P) % P
                flat.append(prod)
        inv_flat = f128.batch_inv(flat)
        cyc_divp = _np.asarray(limb.from_ints(
            [inv_flat[i * dperiod:(i + 1) * dperiod]
             for i in range(len(cyc))]), dtype=_np.uint32)

    sgl_div = _np.zeros((0, N, limb.NLIMB), dtype=_np.uint32)
    if sgl:
        # dedup by step: per-assertion (winterfell-compat) batching
        # yields many single groups sharing a step; invert each unique
        # (x - g^s) vector once and expand by index
        xs = lde_points_host(n, blowup)
        steps = sorted({grp.step for grp in sgl})
        flat = []
        for s in steps:
            gs = pow(g, s, P)
            flat.extend((x - gs) % P for x in xs)
        inv_flat = f128.batch_inv(flat)
        uniq = _np.asarray(limb.from_ints(
            [inv_flat[i * N:(i + 1) * N] for i in range(len(steps))]),
            dtype=_np.uint32)
        step_ix = {s: i for i, s in enumerate(steps)}
        sgl_div = uniq[[step_ix[grp.step] for grp in sgl]]

    out = (per_p, p_last, zinv, cyc_pos, cyc_divp, sgl_pos, sgl_div,
           dperiod)
    _STAGE_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# stage 4: OOD
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _ood_fn(n_cols: int, n: int):
    import jax
    jnp = _jnp()

    def fn(polys, zpow):
        # polys: (C, n, 8); zpow: (n, 8)
        terms = limb.mul(polys, zpow[None], jnp)
        return limb.sum_mod(terms, 1, jnp)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# stage 5: DEEP (row-chunked)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _deep_chunk_fn(w: int, Q: int, chunk: int):
    import jax
    jnp = _jnp()

    def fn(lde_blk, q_blk, coeffs, gz, gzg, inv_xz_blk, inv_xzg_blk):
        # lde_blk (w, chunk, 8), q_blk (Q, chunk, 8), coeffs (w+Q, 8)
        allc = jnp.concatenate([lde_blk, q_blk], axis=0)
        stacked = jnp.transpose(allc, (1, 0, 2))         # (chunk, w+Q, 8)
        gt = limb.dot(stacked, jnp.broadcast_to(
            coeffs[None], (chunk, w + Q, limb.NLIMB)), jnp)
        t1 = limb.mul(limb.sub(gt, gz[None], jnp), inv_xz_blk, jnp)
        t2 = limb.mul(limb.sub(gt, gzg[None], jnp), inv_xzg_blk, jnp)
        return limb.add(t1, t2, jnp)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _lde_xs_dev(n: int, blowup: int):
    """Device copy of the LDE domain points (cached per shape)."""
    jnp = _jnp()
    return jnp.asarray(limb.from_ints(lde_points_host(n, blowup)))


@lru_cache(maxsize=None)
def _deep_inv_fn(N: int):
    """jitted (xs, z, zg) -> (1/(x-z), 1/(x-zg)) via a product-tree
    batch inverse — the host Python ladder + 4 MB upload cost ~0.7 s
    per segment over the tunneled device."""
    import jax
    jnp = _jnp()

    def fn(xs, z, zg):
        d = jnp.concatenate([limb.sub(xs, z[None], jnp),
                             limb.sub(xs, zg[None], jnp)], axis=0)
        iv = limb.batch_inv_tree(d, jnp)
        return iv[:N], iv[N:]

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _deep_mxu_fn(w: int, Q: int, N: int):
    """Whole-domain DEEP composition in ONE dispatch, with the batched
    coefficient dot gt[x] = sum_i c_i * col_i[x] run as an int8-split
    MXU matmul (field/mxu.py) instead of the VPU limb dot — the VPU
    path materializes (N, w+Q, 8, 8) limb products (gigabytes of HBM
    traffic at N=2^16), the MXU path is a (N, (w+Q)*8) @ ((w+Q)*8, 16)
    integer matmul.  The DEEP coefficients arrive as uint8 weight
    planes built on host per segment (mxu.wmat_from_ints)."""
    import jax
    jnp = _jnp()
    from ..field import mxu

    def fn(t_lde, q_lde, w_lo, w_hi, gz, gzg, inv_xz, inv_xzg):
        allc = jnp.concatenate([t_lde, q_lde], axis=0)   # (w+Q, N, 8)
        stacked = jnp.transpose(allc, (1, 0, 2))         # (N, w+Q, 8)
        gt = mxu.field_matmul(stacked, w_lo, w_hi, jnp)[:, 0]
        t1 = limb.mul(limb.sub(gt, gz[None], jnp), inv_xz, jnp)
        t2 = limb.mul(limb.sub(gt, gzg[None], jnp), inv_xzg, jnp)
        return limb.add(t1, t2, jnp)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# stage 6: FRI
# ---------------------------------------------------------------------------

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


def _fri_chain_fn(N: int, num_layers: int):
    # keyed on the FS-hasher rounds baked in at trace time (the
    # on-device coin reseed/draw sponges)
    return _fri_chain_fn_impl(N, num_layers, pos.hasher_rounds())


@lru_cache(maxsize=None)
def _fri_chain_fn_impl(N: int, num_layers: int, rounds: int):
    """One jitted dispatch for the ENTIRE FRI phase.

    The per-layer loop (commit -> coin reseed -> alpha draw -> fold) has
    an inherent host sync per layer when the coin lives on host: the
    fold needs alpha, alpha needs the layer's Merkle root.  Over a
    tunneled device that is ~num_layers round-trips per segment.  The
    coin is Poseidon-based (prove/coin.py), so the whole chain runs on
    device instead: reseed = sponge(seed_fe, root_fe) under
    zkl/winter/hash/merge, draw = sponge(seed_fe, 1) under
    zkl/winter/hash/merge_with_int — and a drawn candidate IS the
    digest's lane-0 field element, always canonical, so the host retry
    loop can never trigger and the device draw is exact.  The host coin
    replays the reseeds from the returned roots (scalar, microseconds)
    to stay in sync for grinding and query draws.

    Returns (layers, levels_per_layer, roots (L, 8), final_layer).
    """
    import jax
    jnp = _jnp()
    one_fe = limb.from_ints([1])[0]

    def fn(deep, seed, x0s, inv2x0s):
        import contextlib

        from ..crypto import poseidon_pallas as pp
        # every merge/sponge in the chain goes through the Pallas kernel
        # (shapes dedupe to ~8 Mosaic compiles) — leaving the ~200 small
        # tree-level merges on the XLA scan path makes the chain's
        # one-time device compile cost minutes
        with (pp.force_pallas() if pp.enabled()
              else contextlib.nullcontext()):
            return _chain(deep, seed, x0s, inv2x0s)

    def _chain(deep, seed, x0s, inv2x0s):
        layer = deep
        size = N
        layers, levels_all, roots = [], [], []
        for d in range(num_layers):
            half = size // 2
            pairs = jnp.stack([layer[:half], layer[half:]], axis=1)
            leaves = pj.hash_rows_partitioned(pairs, 2, jnp)
            levels = tuple(pj.merkle_tree(leaves, jnp))
            root = levels[-1][0]                          # (8,)
            seed = pj.sponge_fes(
                jnp.stack([seed, root])[None],
                b"zkl/winter/hash/merge", jnp)[0]
            alpha = pj.sponge_fes(
                jnp.stack([seed, jnp.asarray(one_fe)])[None],
                b"zkl/winter/hash/merge_with_int", jnp)[0]
            layers.append(layer)
            levels_all.append(levels)
            roots.append(root)
            a_f = alpha[None]
            num1 = limb.mul(layer[:half], limb.add(a_f, x0s[d], jnp), jnp)
            num2 = limb.mul(layer[half:], limb.sub(a_f, x0s[d], jnp), jnp)
            layer = limb.mul(limb.sub(num1, num2, jnp), inv2x0s[d], jnp)
            size = half
        return (tuple(layers), tuple(levels_all),
                jnp.stack(roots), layer)

    return jax.jit(fn)


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


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------

def prove_trace_device(trace, air: ZkLispAir, air_pi,
                       options: ProofOptions,
                       limbs16=None) -> StarkProof:
    from ..utils.tracing import phase
    jnp = _jnp()
    n = trace.length
    w = trace.width
    blowup = options.blowup
    N = n * blowup
    context = ProofContext(w, n, options)
    Q = air.ce_blowup()

    # stage 1: trace polys + LDE.  Ship the trace as uint16 (limbs are
    # 16-bit) — halves the host->device transfer over the tunnel — and
    # widen to u32 inside the jit.  limbs16 may already be a device
    # array (prover.py prefetches segment uploads); jnp.asarray is then
    # a no-op.
    with phase("lde", rows=n, width=w):
        cols_u16 = (limbs16 if limbs16 is not None
                    else _np.asarray(trace.to_limbs(), dtype=_np.uint16))
        trace_polys, trace_lde = _lde_polys_fn(n, blowup)(
            jnp.asarray(cols_u16))
        trace_lde.block_until_ready()

    # stage 2: trace commitment
    with phase("trace_commit"):
        ps_main = options.partition_size(w)
        trace_comm = _commit_cols_device(trace_lde, ps_main)

    with phase("fs_coeff_draws"):
        coin = RandomCoin(context.to_elements() + air_pi.to_elements())
        coin.reseed(trace_comm.root)

        groups = group_assertions(air.get_assertions(), n,
                                  options.per_assertion)
        alphas = coin.draw_many(air.num_transition_constraints())
        betas = coin.draw_many(len(groups))

    # Composition evaluates on the blowup_c = Q sub-domain (the even
    # indices of the full LDE): the quotient has degree < Q*n, so Q*n
    # points determine it exactly — at blowup 16 this halves the
    # constraint-eval and boundary-term work with byte-identical output
    # (see _quotient_fn).
    blowup_c = Q if (0 < Q < blowup and blowup % Q == 0) else blowup
    stride_c = blowup // blowup_c
    trace_lde_c = (trace_lde if stride_c == 1
                   else trace_lde[:, ::stride_c])
    with phase("host_tables"):
        (per_p, p_last, zinv, cyc_pos, cyc_divp, sgl_pos, sgl_div,
         dperiod) = _host_tables(air, groups, blowup_c)
    cyc = [groups[i] for i in cyc_pos]
    sgl = [groups[i] for i in sgl_pos]
    gates_p = jnp.asarray(per_p[1:1 + 27])
    p_last_dev = jnp.asarray(p_last)
    alphas_dev = jnp.asarray(limb.from_ints(alphas))

    # stage 3: composition = scan blocks + bytecode VM
    with phase("record_cvm"):
        prog_cvm, specs = _record_cvm(air, per_p.shape[0] + 1)
    with phase("composition"):
        if specs:
            acc_scan = _scan_blocks_fn(air, specs, blowup_c)(
                trace_lde_c, gates_p, alphas_dev)
        else:
            acc_scan = None
        if prog_cvm.n_instr:
            acc_gen = cvm.execute(prog_cvm, trace_lde_c,
                                  jnp.asarray(per_p),
                                  p_last_dev, alphas_dev, blowup_c)
            comb = (acc_gen if acc_scan is None
                    else limb.add(acc_scan, acc_gen, jnp))
        else:
            comb = acc_scan
        comb.block_until_ready()

    # boundary + quotient
    cyc_betas = [betas[i] for i in cyc_pos]
    sgl_betas = [betas[i] for i in sgl_pos]
    ngc, ngs = _bucket(len(cyc)), (_bucket(len(sgl)) if sgl else 0)

    def pad_vals(ints, nb):
        out = _np.zeros((nb, limb.NLIMB), dtype=_np.uint32)
        if ints:
            out[:len(ints)] = limb.from_ints(ints)
        return jnp.asarray(out)

    cyc_idx = _np.zeros(ngc, dtype=_np.int32)
    cyc_idx[:len(cyc)] = [g.column for g in cyc]
    cyc_divp_a = _np.zeros((ngc, dperiod, limb.NLIMB), dtype=_np.uint32)
    if cyc:
        cyc_divp_a[:len(cyc)] = cyc_divp
    sgl_idx = _np.zeros(max(ngs, 1), dtype=_np.int32)
    sgl_div_a = _np.zeros((max(ngs, 1), n * blowup_c, limb.NLIMB),
                          dtype=_np.uint32)
    if sgl:
        sgl_idx[:len(sgl)] = [g.column for g in sgl]
        sgl_div_a[:len(sgl)] = sgl_div

    with phase("quotient"):
        q_polys, q_lde = _quotient_fn(n, blowup, Q, ngc, ngs, dperiod,
                                      blowup_c)(
            comb, trace_lde_c,
            jnp.asarray(cyc_idx), pad_vals([g.value for g in cyc], ngc),
            jnp.asarray(cyc_divp_a),
            pad_vals(cyc_betas, ngc),
            jnp.asarray(sgl_idx), pad_vals([g.value for g in sgl],
                                           max(ngs, 1)),
            jnp.asarray(sgl_div_a),
            pad_vals(sgl_betas, max(ngs, 1)),
            jnp.asarray(zinv))
        q_lde.block_until_ready()

    with phase("constraint_commit"):
        ps_con = options.partition_size(Q)
        constraint_comm = _commit_cols_device(q_lde, ps_con)
        coin.reseed(constraint_comm.root)

    # stage 4: OOD
    ph_ood = phase("ood")
    ph_ood.__enter__()
    z = coin.draw()
    g_trace = f128.get_root_of_unity(n)
    zg = f128.mul(z, g_trace)

    zp = jnp.asarray(limb.powers_np(z, n))
    zgp = jnp.asarray(limb.powers_np(zg, n))
    ood_t_cur = _to_host_ints(_ood_fn(w, n)(trace_polys, zp))
    ood_t_next = _to_host_ints(_ood_fn(w, n)(trace_polys, zgp))
    ood_q_cur = _to_host_ints(_ood_fn(Q, n)(q_polys, zp))
    ood_q_next = _to_host_ints(_ood_fn(Q, n)(q_polys, zgp))
    ood_evals = ood_t_cur + ood_q_cur + ood_t_next + ood_q_next
    coin.reseed(pos.hash_elements(ood_evals))
    ph_ood.__exit__(None, None, None)

    # stage 5: DEEP
    ph_deep = phase("deep")
    ph_deep.__enter__()
    gammas = coin.draw_many(w)
    deltas = coin.draw_many(Q)
    gz = sum(g_ * t for g_, t in zip(gammas, ood_t_cur)) % P
    gz = (gz + sum(d * q for d, q in zip(deltas, ood_q_cur))) % P
    gzg = sum(g_ * t for g_, t in zip(gammas, ood_t_next)) % P
    gzg = (gzg + sum(d * q for d, q in zip(deltas, ood_q_next))) % P

    inv_xz, inv_xzg = _deep_inv_fn(N)(
        _lde_xs_dev(n, blowup),
        jnp.asarray(limb.from_ints([z]))[0],
        jnp.asarray(limb.from_ints([zg]))[0])
    coeffs = jnp.asarray(limb.from_ints(gammas + deltas))
    gz_dev = jnp.asarray(limb.from_ints([gz]))[0]
    gzg_dev = jnp.asarray(limb.from_ints([gzg]))[0]

    chunk = min(ROW_CHUNK, N)
    import os as _os_deep
    if not _os_deep.environ.get("ZKL_NO_MXU_DEEP"):
        from ..field import mxu
        w_lo, w_hi = mxu.wmat_planes(
            mxu.wmat_from_ints([[c] for c in gammas + deltas]))
        deep = _deep_mxu_fn(w, Q, N)(
            trace_lde, q_lde, jnp.asarray(w_lo), jnp.asarray(w_hi),
            gz_dev, gzg_dev, inv_xz, inv_xzg)
    else:
        dfn = _deep_chunk_fn(w, Q, chunk)
        deep_parts = [
            dfn(trace_lde[:, s:s + chunk], q_lde[:, s:s + chunk], coeffs,
                gz_dev, gzg_dev, inv_xz[s:s + chunk], inv_xzg[s:s + chunk])
            for s in range(0, N, chunk)]
        deep = (deep_parts[0] if len(deep_parts) == 1
                else jnp.concatenate(deep_parts))
    deep.block_until_ready()
    ph_deep.__exit__(None, None, None)

    # stage 6: FRI
    ph_fri = phase("fri")
    ph_fri.__enter__()
    num_layers = options.num_fri_layers(N)
    fri_layers_vals = []
    fri_comms: List[_DevCommitment] = []
    layer = deep
    import os as _os
    if num_layers and not _os.environ.get("ZKL_NO_FUSED_FRI"):
        # one dispatch for the whole phase: on-device FS coin, all layer
        # commits + folds, ONE root transfer (see _fri_chain_fn)
        tabs = [_x0_tables(N >> d) for d in range(num_layers)]
        seed_fe = f128.fold_bytes32_to_fe(coin.seed)
        layers, levels_all, roots_dev, layer = _fri_chain_fn(
            N, num_layers)(
            deep, jnp.asarray(limb.from_ints([seed_fe]))[0],
            tuple(jnp.asarray(t[0]) for t in tabs),
            tuple(jnp.asarray(t[1]) for t in tabs))
        roots = limb.to_ints(_np.asarray(roots_dev))
        for d in range(num_layers):
            comm = _DevCommitment(levels_all[d], root_fe=int(roots[d]))
            fri_comms.append(comm)
            fri_layers_vals.append(layers[d])
            # replay the reseed on the host coin (draws don't mutate the
            # seed, so the alphas consumed on device need no replay)
            coin.reseed(comm.root)
    else:
        size = N
        for d in range(num_layers):
            half = size // 2
            pair_rows = jnp.stack([layer[:half], layer[half:]], axis=1)
            comm = _commit_rows_device(pair_rows, 2)
            fri_comms.append(comm)
            # keep full layers on device; only the handful of opened
            # values is transferred later (a full-layer transfer per
            # depth costs seconds over a tunneled device)
            fri_layers_vals.append(layer)
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
    ph_fri.__exit__(None, None, None)

    # grinding + positions (host-driven, device scan)
    with phase("grind", bits=options.grinding_factor):
        pow_nonce = coin.grind(options.grinding_factor)
    positions = sorted(set(coin.draw_integers(
        options.num_queries, N, pow_nonce)))

    # openings: gather opened rows on device (no full row-major copy).
    # Every gather is padded to the fixed query count so the dispatched
    # shapes repeat across segments (deduped counts vary, and each new
    # count would recompile the gathers — seconds per segment).
    nq_pad = options.num_queries
    pos_pad = list(positions) + [positions[-1]] * (nq_pad - len(positions))
    idx_dev = jnp.asarray(_np.asarray(pos_pad, dtype=_np.int32))
    t_rows = _np.asarray(_gather_rows_fn(w, nq_pad)(trace_lde, idx_dev))
    q_rows = _np.asarray(_gather_rows_fn(Q, nq_pad)(q_lde, idx_dev))

    with phase("openings", nq=len(positions)):
        from . import multiproof
        tc_paths = open_paths_multi(
            [trace_comm, constraint_comm],
            [list(positions), list(positions)], nq_pad)
        trace_open = QueryOpenings(
            [[int(v) for v in limb.to_ints(t_rows[j])]
             for j in range(len(positions))], tc_paths[0],
            multiproof.compress(positions, tc_paths[0]))
        constraint_open = QueryOpenings(
            [[int(v) for v in limb.to_ints(q_rows[j])]
             for j in range(len(positions))], tc_paths[1],
            multiproof.compress(positions, tc_paths[1]))

    with phase("fri_openings"):
        # fold the query positions through all layers on host first, so
        # every layer's (fixed-shape) value gather runs in ONE jitted
        # dispatch + ONE transfer
        foldeds = []
        pos_d = positions
        size_d = N
        for d in range(num_layers):
            half = size_d // 2
            folded = []
            for p_ in pos_d:
                m = p_ % half
                if m not in folded:
                    folded.append(m)
            foldeds.append((folded, half))
            pos_d = folded
            size_d = half
        idxs = []
        for folded, half in foldeds:
            fold_pad = folded + [folded[-1]] * (nq_pad - len(folded))
            idxs.append(_np.asarray(
                fold_pad + [half + m for m in fold_pad], dtype=_np.int32))
        vals_flat = limb.to_ints(_np.asarray(
            _fri_vals_fn(tuple(v.shape[0] for v in fri_layers_vals))(
                tuple(fri_layers_vals),
                jnp.asarray(_np.stack(idxs)))))    # (layers*2*nq_pad,)
        all_paths = open_paths_multi(
            fri_comms, [f for f, _ in foldeds], nq_pad)
        fri_open: List[FriLayerOpenings] = []
        for d, (folded, half) in enumerate(foldeds):
            nf = len(folded)
            base = d * 2 * nq_pad
            pairs = [(int(vals_flat[base + i]),
                      int(vals_flat[base + nq_pad + i]))
                     for i in range(nf)]
            fri_open.append(FriLayerOpenings(
                pairs, all_paths[d],
                multiproof.compress(folded, all_paths[d])))

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
