"""Constraint bytecode VM: trace-once execution of AIR transition
constraints on device.

Tracing ~500 heterogeneous constraint expressions through jit costs
minutes of Python time and produces enormous graphs.  Instead the
generic (non-scan) constraints are recorded ONCE per configuration into
a stack-machine bytecode (a few thousand instructions), and a single
`lax.scan` executor — whose traced body is just a 9-way `lax.switch`
over limb ops — evaluates sum_i alpha_i * C_i over the whole LDE
domain.  The bytecode is a runtime INPUT, so one compiled executable
(keyed only on array shapes) serves every program, feature mix and
public-input binding.

Pipeline:
  record   — run the AIR's constraint emitters on `Sym` operands
             (pure-Python tree nodes; milliseconds)
  compile  — post-order flatten each constraint tree to PUSH/ADD/SUB/
             MUL/EMIT instructions; stack depth = tree depth
  execute  — jit scan over the instruction arrays; carry is
             (stack (S,N,8), sp, acc (N,8))

Shapes are bucketed (stack S to a power of two, instruction count I to
multiples of 512, NOP-padded) to maximise executable reuse.

Two executors share the recorded program:

  scan    — the original one-instruction-per-`lax.scan`-step stack
            machine (bytecode as runtime input; maximal executable
            reuse, but ~4e3 sequential (N, 8) vector ops: dispatch
            overhead dominates — measured ~50x below arithmetic peak).
  leveled — the default on device backends (`ZKL_CVM_LEVEL=1/0`
            overrides; CPU defaults to scan — compile-dominated runs
            with the persistent cache disabled): the same Sym DAG
            is scheduled into topological LEVELS; each level is at most
            three BATCHED limb ops (one mul / add / sub over a (K, C, 8)
            gather from a unified operand table), so the whole program
            is ~tree-depth x 3 large device ops per row-chunk instead
            of ~4e3 small ones.  The schedule is baked into the
            executable as constants (keyed by a content hash), trading
            executable reuse for near-arithmetic-peak throughput.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as _np

from ..field import f128, limb

P = f128.P

OP_NOP = 0
OP_PUSH_CUR = 1
OP_PUSH_NXT = 2
OP_PUSH_PER = 3
OP_PUSH_CONST = 4
OP_ADD = 5
OP_SUB = 6
OP_MUL = 7
OP_EMIT = 8
OP_PUSH_PLAST = 9
OP_STORE_SLOT = 10     # pop top of stack into slot[arg]
OP_PUSH_SLOT = 11      # push slot[arg]


class Sym:
    """Constraint expression node.  kind: 'cur'|'nxt'|'per' (leaf with
    column index k), 'const' (field element k), 'add'|'sub'|'mul'."""
    __slots__ = ("kind", "a", "b", "k", "_depth")

    def __init__(self, kind: str, a: "Optional[Sym]" = None,
                 b: "Optional[Sym]" = None, k: int = 0):
        self.kind = kind
        self.a = a
        self.b = b
        self.k = k
        self._depth = -1

    @staticmethod
    def _coerce(o) -> "Optional[Sym]":
        if isinstance(o, Sym):
            return o
        if isinstance(o, int):
            return Sym("const", k=o % P)
        v = getattr(o, "v", None)          # Felt
        if isinstance(v, int):
            return Sym("const", k=v % P)
        return None

    def __add__(self, o):
        s = Sym._coerce(o)
        if s is None:
            return NotImplemented
        return Sym("add", self, s)

    __radd__ = __add__

    def __sub__(self, o):
        s = Sym._coerce(o)
        if s is None:
            return NotImplemented
        return Sym("sub", self, s)

    def __rsub__(self, o):
        s = Sym._coerce(o)
        if s is None:
            return NotImplemented
        return Sym("sub", s, self)

    def __mul__(self, o):
        s = Sym._coerce(o)
        if s is None:
            return NotImplemented
        return Sym("mul", self, s)

    __rmul__ = __mul__

    def __neg__(self):
        return Sym("sub", Sym("const", k=0), self)


def sym_leaves(width: int, n_periodic: int):
    """Leaf nodes for recording.  The LAST periodic column (p_last, a
    full-domain Lagrange selector) gets its own leaf kind — on device it
    is a separate (N, 8) input while the other periodics are passed as
    one-period tiles."""
    cur = [Sym("cur", k=i) for i in range(width)]
    nxt = [Sym("nxt", k=i) for i in range(width)]
    per = [Sym("per", k=i) for i in range(n_periodic - 1)]
    per.append(Sym("plast"))
    return cur, nxt, per


@dataclass
class CvmProgram:
    ops: _np.ndarray       # (I,) int32
    arg: _np.ndarray       # (I,) int32 — column/periodic/slot index
    imm: _np.ndarray       # (I, 8) uint32 — const limbs
    aidx: _np.ndarray      # (I,) int32 — alpha index for EMIT
    stack_size: int        # bucketed
    n_instr: int           # before padding
    n_slots: int = 0       # CSE slots (bucketed)
    levels: "Optional[LevelProgram]" = None   # leveled-executor schedule


_LEAF_OP = {"cur": OP_PUSH_CUR, "nxt": OP_PUSH_NXT, "per": OP_PUSH_PER,
            "plast": OP_PUSH_PLAST}
_BIN_OP = {"add": OP_ADD, "sub": OP_SUB, "mul": OP_MUL}


def _emit_tree(root: Sym, out: List[Tuple[int, int, int, int]],
               alpha_ix: int, slot_of=None, materialized=None) -> int:
    """Iterative post-order flatten; returns max stack depth used.

    slot_of (id(node) -> slot index) marks shared subexpressions: the
    first emission appends STORE_SLOT + PUSH_SLOT after computing the
    value, later uses emit a single PUSH_SLOT."""
    max_sp = 0
    sp = 0
    # (node, state) state 0=expand, 1=emit op after children
    work = [(root, 0)]
    while work:
        node, state = work.pop()
        slot = slot_of.get(id(node)) if slot_of is not None else None
        if state == 0:
            if slot is not None and id(node) in materialized:
                out.append((OP_PUSH_SLOT, slot, 0, 0))
                sp += 1
                max_sp = max(max_sp, sp)
            elif node.kind in _LEAF_OP:
                out.append((_LEAF_OP[node.kind], node.k, 0, 0))
                sp += 1
                max_sp = max(max_sp, sp)
            elif node.kind == "const":
                out.append((OP_PUSH_CONST, 0, node.k, 0))
                sp += 1
                max_sp = max(max_sp, sp)
            else:
                work.append((node, 1))
                work.append((node.b, 0))
                work.append((node.a, 0))
        else:
            out.append((_BIN_OP[node.kind], 0, 0, 0))
            sp -= 1
            if slot is not None and id(node) not in materialized:
                out.append((OP_STORE_SLOT, slot, 0, 0))
                out.append((OP_PUSH_SLOT, slot, 0, 0))
                materialized.add(id(node))
    assert sp == 1
    out.append((OP_EMIT, 0, 0, alpha_ix))
    return max_sp


MAX_SLOTS = 64       # slot buffers cost (slots, N, 8) u32 on device


def _assign_slots(roots: List[Tuple[Sym, int]]) -> dict:
    """CSE: shared binop subtrees (by object identity — the AIR emitters
    reuse Sym objects for common subexpressions) get slots, largest
    savings first."""
    uses: Dict[int, int] = {}
    size: Dict[int, int] = {}
    node_by_id: Dict[int, Sym] = {}
    for expr, _ in roots:
        stack = [expr]
        while stack:
            n = stack.pop()
            k = id(n)
            uses[k] = uses.get(k, 0) + 1
            if uses[k] == 1:
                node_by_id[k] = n
                if n.kind in _BIN_OP:
                    stack.append(n.a)
                    stack.append(n.b)

    def tree_size(n: Sym, cap: int = 64) -> int:
        total = 0
        stack = [n]
        while stack and total < cap:
            m = stack.pop()
            total += 1
            if m.kind in _BIN_OP:
                stack.append(m.a)
                stack.append(m.b)
        return total

    cands = [(k, (uses[k] - 1) * tree_size(node_by_id[k]))
             for k in uses
             if uses[k] >= 2 and node_by_id[k].kind in _BIN_OP]
    cands = [c for c in cands if c[1] >= 2]
    cands.sort(key=lambda c: -c[1])
    return {k: i for i, (k, _) in enumerate(cands[:MAX_SLOTS])}


def compile_constraints(roots: List[Tuple[Sym, int]],
                        i_bucket: int = 512,
                        s_min: int = 16) -> CvmProgram:
    """roots: [(expression, alpha index)] -> bytecode arrays."""
    slot_of = _assign_slots(roots)
    materialized: set = set()
    raw: List[Tuple[int, int, int, int]] = []
    depth = 0
    for expr, aix in roots:
        depth = max(depth, _emit_tree(expr, raw, aix, slot_of,
                                      materialized))
    n_instr = len(raw)
    padded = ((n_instr + i_bucket - 1) // i_bucket) * i_bucket
    padded = max(padded, i_bucket)
    raw = raw + [(OP_NOP, 0, 0, 0)] * (padded - n_instr)

    S = s_min
    while S < depth + 1:
        S *= 2

    ops = _np.asarray([r[0] for r in raw], dtype=_np.int32)
    arg = _np.asarray([r[1] for r in raw], dtype=_np.int32)
    imm = _np.asarray(limb.from_ints([r[2] for r in raw]))
    aidx = _np.asarray([r[3] for r in raw], dtype=_np.int32)
    ns = len(slot_of)
    n_slots = 0
    if ns:
        n_slots = 8
        while n_slots < ns:
            n_slots *= 2
    prog = CvmProgram(ops, arg, imm, aidx, S, n_instr, n_slots)
    prog.levels = compile_levels(roots)
    return prog


# ---------------------------------------------------------------------------
# leveled executor: batched level-order schedule of the constraint DAG
# ---------------------------------------------------------------------------

SRC_SLOT, SRC_CUR, SRC_NXT, SRC_PER, SRC_PLAST, SRC_CONST = range(6)
_BIN_KINDS = ("add", "sub", "mul")


@dataclass
class LevelProgram:
    """Level-order schedule of the (rebalanced) constraint DAG.

    Single-use add/mul chains are first rebalanced into log-depth trees
    (associativity is exact mod p, so values — and proof bytes — are
    unchanged), which collapses the long sequential sum tails the AIR
    emitters produce.  levels[L] is then a list of
    (opkind, a_src, a_k, b_src, b_k, out_start) batches — at most one
    batch per opkind per level, each a set of INDEPENDENT ops executed
    as one batched limb op over a (K, C, 8) gather.  Outputs land at
    STATIC contiguous positions (out_start, append order) via
    dynamic_update_slice — TPU scatters serialize per index, appends
    don't.  Root values are combined at the end:
    acc = sum_i alphas[root_aidx[i]] * value_i.
    """
    levels: list            # [[(kind, a_src, a_k, b_src, b_k, start)]]
    n_slots: int            # total binop outputs (append positions)
    root_src: _np.ndarray   # (R,) int32
    root_k: _np.ndarray     # (R,) int32
    root_aidx: _np.ndarray  # (R,) int32
    consts: _np.ndarray     # (n_const, 8) uint32 limb pool
    sig: str                # content hash — executable cache key


_LEVEL_REGISTRY: Dict[str, LevelProgram] = {}


def _rebalance_roots(roots: List[Tuple[Sym, int]]) -> List[Tuple[Sym, int]]:
    """Rewrite single-use add/mul chains as balanced (log-depth) trees.

    Field add/mul are associative and commutative and every limb op
    returns the canonical representative, so any reassociation computes
    the SAME field element — proof bytes are unchanged (pinned by
    tests/test_cvm_level.py against the scan executor).  Shared
    subexpressions (operand refcount >= 2) and roots stay materialized:
    a chain never expands past them, preserving the DAG's sharing."""
    uses: Dict[int, int] = {}
    node_by_id: Dict[int, Sym] = {}
    for r, _ in roots:
        uses[id(r)] = uses.get(id(r), 0) + 1   # pin roots (never folded)
        stack = [r]
        while stack:
            n = stack.pop()
            if id(n) not in node_by_id:
                node_by_id[id(n)] = n
                if n.kind in _BIN_KINDS:
                    stack.append(n.a)
                    stack.append(n.b)
    # count operand edges (each edge once, including repeats)
    for k, n in node_by_id.items():
        if n.kind in _BIN_KINDS:
            for ch in (n.a, n.b):
                uses[id(ch)] = uses.get(id(ch), 0) + 1

    def chain_terms(n: Sym) -> List[Sym]:
        if n.kind == "sub":
            return [n.a, n.b]
        terms: List[Sym] = []
        stack = [(n, True)]
        while stack:
            m, top = stack.pop()
            if m.kind == n.kind and (top or uses[id(m)] == 1):
                stack.append((m.b, False))
                stack.append((m.a, False))
            else:
                terms.append(m)
        # stack pops b-subtree first under LIFO; order is irrelevant
        # for correctness (commutative) but keep it deterministic
        return terms

    memo: Dict[int, Sym] = {}
    work = [(r, 0) for r, _ in roots]
    while work:
        n, state = work.pop()
        if id(n) in memo:
            continue
        if n.kind not in _BIN_KINDS:
            memo[id(n)] = n
            continue
        if state == 0:
            work.append((n, 1))
            for t in chain_terms(n):
                work.append((t, 0))
        else:
            terms = [memo[id(t)] for t in chain_terms(n)]
            if n.kind != "sub" and len(terms) > 2:
                while len(terms) > 1:
                    nxt = [Sym(n.kind, terms[i], terms[i + 1])
                           for i in range(0, len(terms) - 1, 2)]
                    if len(terms) % 2:
                        nxt.append(terms[-1])
                    terms = nxt
                memo[id(n)] = terms[0]
            else:
                memo[id(n)] = Sym(n.kind, terms[0], terms[1])
    return [(memo[id(r)], aix) for r, aix in roots]


def compile_levels(roots: List[Tuple[Sym, int]]) -> Optional[LevelProgram]:
    """Rebalance, then schedule the Sym DAG (shared nodes by object
    identity) into topological levels with append-order output
    positions.  Returns None for an empty program."""
    import hashlib

    if not roots:
        return None
    roots = _rebalance_roots(roots)

    # 1. level of every unique node (iterative post-order)
    level: Dict[int, int] = {}
    node_by_id: Dict[int, Sym] = {}
    work = [(r, 0) for r, _ in roots]
    while work:
        n, state = work.pop()
        if state == 0:
            if id(n) in level:
                continue
            node_by_id[id(n)] = n
            if n.kind in _BIN_KINDS:
                work.append((n, 1))
                work.append((n.a, 0))
                work.append((n.b, 0))
            else:
                level[id(n)] = 0
        else:
            if id(n) not in level:
                level[id(n)] = 1 + max(level[id(n.a)], level[id(n.b)])

    # 2. const pool
    const_ix: Dict[int, int] = {}
    for k, n in node_by_id.items():
        if n.kind == "const" and n.k not in const_ix:
            const_ix[n.k] = len(const_ix)
    const_vals = [0] * len(const_ix)
    for v, i in const_ix.items():
        const_vals[i] = v

    # 3. schedule: batches in (level, add/sub/mul) order; every output
    # gets the next append position — static contiguous ranges, no
    # reuse (a scatter-free executor beats a smaller table on TPU)
    from collections import defaultdict
    by_level = defaultdict(lambda: defaultdict(list))
    for k, n in node_by_id.items():
        if n.kind in _BIN_KINDS:
            by_level[level[k]][n.kind].append(k)
    slot_of_n: Dict[int, int] = {}
    n_slots = 0
    sched = []
    for L in sorted(by_level):
        lvl_ids = []
        for kind in _BIN_KINDS:
            ids = by_level[L].get(kind)
            if not ids:
                continue
            start = n_slots
            for k in ids:
                slot_of_n[k] = n_slots
                n_slots += 1
            lvl_ids.append((kind, ids, start))
        sched.append(lvl_ids)

    def src_of(n: Sym) -> Tuple[int, int]:
        if n.kind in _BIN_KINDS:
            return SRC_SLOT, slot_of_n[id(n)]
        if n.kind == "cur":
            return SRC_CUR, n.k
        if n.kind == "nxt":
            return SRC_NXT, n.k
        if n.kind == "per":
            return SRC_PER, n.k
        if n.kind == "plast":
            return SRC_PLAST, 0
        return SRC_CONST, const_ix[n.k]

    levels_out = []
    for lvl_ids in sched:
        lvl = []
        for kind, ids, start in lvl_ids:
            a_src = _np.empty(len(ids), _np.int32)
            a_k = _np.empty(len(ids), _np.int32)
            b_src = _np.empty(len(ids), _np.int32)
            b_k = _np.empty(len(ids), _np.int32)
            for i, k in enumerate(ids):
                n = node_by_id[k]
                a_src[i], a_k[i] = src_of(n.a)
                b_src[i], b_k[i] = src_of(n.b)
            lvl.append((kind, a_src, a_k, b_src, b_k, start))
        levels_out.append(lvl)

    root_src = _np.empty(len(roots), _np.int32)
    root_k = _np.empty(len(roots), _np.int32)
    root_aidx = _np.asarray([aix for _, aix in roots], _np.int32)
    for i, (r, _) in enumerate(roots):
        root_src[i], root_k[i] = src_of(r)
    consts = _np.asarray(limb.from_ints(const_vals)).reshape(-1, limb.NLIMB)

    h = hashlib.sha256()
    h.update(_np.int64(n_slots).tobytes())
    for lvl in levels_out:
        for kind, a_src, a_k, b_src, b_k, start in lvl:
            h.update(kind.encode())
            h.update(_np.int64(start).tobytes())
            for arr in (a_src, a_k, b_src, b_k):
                h.update(arr.tobytes())
        h.update(b"|")
    for arr in (root_src, root_k, root_aidx, consts):
        h.update(arr.tobytes())
    lp = LevelProgram(levels_out, n_slots, root_src, root_k, root_aidx,
                      consts, h.hexdigest())
    _LEVEL_REGISTRY[lp.sig] = lp
    return lp


@lru_cache(maxsize=None)
def _exec_level_fn(sig: str, w: int, n_perp: int, period: int, N: int,
                   blowup: int):
    """Build + jit the leveled executor.  The schedule is baked in as
    constants (cache key = content hash + shapes); rows are processed
    in chunks sized to a fixed per-call memory budget so the unified
    operand table stays bounded regardless of N.  Outputs are written
    with dynamic_update_slice at static contiguous offsets — never a
    scatter."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    lp = _LEVEL_REGISTRY[sig]
    NS = max(lp.n_slots, 1)
    n_const = lp.consts.shape[0]
    n_fixed = 2 * w + n_perp + 1 + n_const
    off = {SRC_CUR: 0, SRC_NXT: w, SRC_PER: 2 * w,
           SRC_PLAST: 2 * w + n_perp, SRC_CONST: 2 * w + n_perp + 1,
           SRC_SLOT: n_fixed}
    rows_total = n_fixed + NS

    # chunk: biggest power of two <= 4096 whose table fits ~192 MB
    C = min(N, 4096)
    budget = int(os.environ.get("ZKL_CVM_TABLE_BYTES", str(192 << 20)))
    while C > 1024 and rows_total * C * limb.NLIMB * 4 > budget:
        C //= 2
    if period > C:
        C = period
    assert N % C == 0 and (C % period == 0 or period % C == 0)
    n_chunks = N // C

    def flat(src, k):
        res = _np.empty(len(src), _np.int32)
        for i in range(len(src)):
            res[i] = off[int(src[i])] + int(k[i])
        return res

    sched = []
    for lvl in lp.levels:
        sched.append([(kind, flat(a_src, a_k), flat(b_src, b_k),
                       n_fixed + start)
                      for kind, a_src, a_k, b_src, b_k, start in lvl])
    root_flat = flat(lp.root_src, lp.root_k)
    consts_np = lp.consts
    root_aidx = lp.root_aidx

    def fn(lde, per_p, p_last, alphas):
        rows = jnp.arange(C, dtype=jnp.int32)

        def body(carry, ci):
            r0 = ci * C
            cur_blk = lax.dynamic_slice(lde, (0, r0, 0),
                                        (w, C, limb.NLIMB))
            nxt_idx = jnp.remainder(r0 + rows + blowup, N)
            nxt_blk = jnp.take(lde, nxt_idx, axis=1)
            if period <= C:
                per_blk = jnp.broadcast_to(
                    per_p[:, None], (n_perp, C // period, period,
                                     limb.NLIMB)
                ).reshape(n_perp, C, limb.NLIMB)
            else:
                per_blk = lax.dynamic_slice(
                    per_p, (0, jnp.remainder(r0, period), 0),
                    (n_perp, C, limb.NLIMB))
            plast_blk = lax.dynamic_slice(
                p_last, (r0, 0), (C, limb.NLIMB))[None]
            const_blk = jnp.broadcast_to(
                jnp.asarray(consts_np)[:, None, :],
                (n_const, C, limb.NLIMB))
            U = jnp.concatenate(
                [cur_blk, nxt_blk, per_blk, plast_blk, const_blk,
                 jnp.zeros((NS, C, limb.NLIMB), jnp.uint32)], 0)
            for lvl in sched:
                for kind, a_idx, b_idx, start in lvl:
                    A = U[a_idx]
                    B = U[b_idx]
                    if kind == "mul":
                        R = limb.mul(A, B, jnp)
                    elif kind == "add":
                        R = limb.add(A, B, jnp)
                    else:
                        R = limb.sub(A, B, jnp)
                    U = lax.dynamic_update_slice(U, R, (start, 0, 0))
            Rr = U[root_flat]
            al = alphas[jnp.asarray(root_aidx)]
            term = limb.mul(Rr, al[:, None, :], jnp)
            return carry, limb.sum_mod(term, 0, jnp)

        _, accs = lax.scan(body, 0,
                           jnp.arange(n_chunks, dtype=jnp.int32))
        return accs.reshape(N, limb.NLIMB)

    return jax.jit(fn)


def execute_leveled(lp: LevelProgram, lde, per_p, p_last, alphas,
                    blowup: int):
    """Leveled-executor entry: same contract as `execute`."""
    _LEVEL_REGISTRY.setdefault(lp.sig, lp)
    w, N = lde.shape[0], lde.shape[1]
    fn = _exec_level_fn(lp.sig, w, per_p.shape[0], per_p.shape[1], N,
                        blowup)
    return fn(lde, per_p, p_last, alphas)


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _exec_fn(w: int, n_perp: int, period: int, N: int, blowup: int,
             S: int, I: int, NS: int):
    """Memory-lean executor: `nxt` columns are rolls of `lde` (never
    materialized as a second (w, N, 8) array), short-periodic columns
    are tiled from one period, p_last is its own (N, 8) input; NS CSE
    slot buffers hold shared subexpressions."""
    import jax
    import jax.numpy as jnp
    reps = N // period

    def fn(lde, per_p, p_last, alphas, ops, arg, imm, aidx):
        stack0 = limb.zeros((S, N), jnp)
        slots0 = limb.zeros((max(NS, 1), N), jnp)
        acc0 = limb.zeros((N,), jnp)

        def body(carry, x):
            stack, sp, acc, slots = carry
            op, a, im, ai = x
            top = stack[sp - 1]
            sec = stack[sp - 2]

            def push(v):
                return stack.at[sp].set(v), sp + 1, acc, slots

            def binop(v):
                return stack.at[sp - 2].set(v), sp - 1, acc, slots

            def tile(col):
                return jnp.broadcast_to(
                    col[None], (reps, period, limb.NLIMB)
                ).reshape(N, limb.NLIMB)

            branches = [
                lambda: (stack, sp, acc, slots),                # NOP
                lambda: push(lde[a]),                           # PUSH_CUR
                lambda: push(jnp.roll(lde[a], -blowup, axis=0)),
                lambda: push(tile(per_p[a])),                   # PUSH_PER
                lambda: push(jnp.broadcast_to(im[None],
                                              (N, limb.NLIMB))),
                lambda: binop(limb.add(sec, top, jnp)),         # ADD
                lambda: binop(limb.sub(sec, top, jnp)),         # SUB
                lambda: binop(limb.mul(sec, top, jnp)),         # MUL
                lambda: (stack, sp - 1,                         # EMIT
                         limb.add(acc, limb.mul(
                             top, alphas[ai][None], jnp), jnp),
                         slots),
                lambda: push(p_last),                           # PUSH_PLAST
                lambda: (stack, sp - 1, acc,                    # STORE_SLOT
                         slots.at[a].set(top)),
                lambda: push(slots[a]),                         # PUSH_SLOT
            ]
            stack, sp, acc, slots = jax.lax.switch(op, branches)
            return (stack, sp, acc, slots), None

        (_, _, acc, _), _ = jax.lax.scan(
            body, (stack0, jnp.int32(0), acc0, slots0),
            (ops, arg, imm, aidx))
        return acc

    return jax.jit(fn)


def execute(prog: CvmProgram, lde, per_p, p_last, alphas, blowup: int):
    """Run the bytecode on device: returns (N, 8) accumulated
    sum_i alpha_i * C_i over the evaluation domain."""
    import os

    import jax
    import jax.numpy as jnp

    # Leveled executor by default on device backends (near-arithmetic-
    # peak).  The CPU backend defaults to the scan executor: its win is
    # runtime, its cost is per-process XLA compile seconds, and CPU runs
    # (tests, dryruns) are compile-dominated with the persistent cache
    # disabled there (see utils/jitcache.py).  Both executors produce
    # identical bytes (tests/test_cvm_level.py).
    choice = os.environ.get("ZKL_CVM_LEVEL", "")
    if choice == "":
        try:
            choice = "0" if jax.default_backend() == "cpu" else "1"
        except Exception:
            choice = "1"
    if prog.levels is not None and choice != "0":
        return execute_leveled(prog.levels, lde, per_p, p_last, alphas,
                               blowup)
    w, N = lde.shape[0], lde.shape[1]
    fn = _exec_fn(w, per_p.shape[0], per_p.shape[1], N, blowup,
                  prog.stack_size, prog.ops.shape[0], prog.n_slots)
    return fn(lde, per_p, p_last, alphas,
              jnp.asarray(prog.ops), jnp.asarray(prog.arg),
              jnp.asarray(prog.imm), jnp.asarray(prog.aidx))


def interpret(prog: CvmProgram, cur_rows, nxt_rows, per_rows,
              alphas: List[int]) -> int:
    """Host reference interpreter over a single row (ints, for tests).
    `per_rows` covers ALL periodic columns; the last entry is p_last."""
    stack: List[int] = []
    slots: Dict[int, int] = {}
    acc = 0
    n = prog.ops.shape[0]
    imm_ints = limb.to_ints(prog.imm)
    for i in range(n):
        op = int(prog.ops[i])
        a = int(prog.arg[i])
        if op == OP_NOP:
            continue
        elif op == OP_STORE_SLOT:
            slots[a] = stack.pop()
        elif op == OP_PUSH_SLOT:
            stack.append(slots[a])
        elif op == OP_PUSH_CUR:
            stack.append(cur_rows[a])
        elif op == OP_PUSH_NXT:
            stack.append(nxt_rows[a])
        elif op == OP_PUSH_PER:
            stack.append(per_rows[a])
        elif op == OP_PUSH_PLAST:
            stack.append(per_rows[-1])
        elif op == OP_PUSH_CONST:
            stack.append(int(imm_ints[i]))
        elif op == OP_ADD:
            b2 = stack.pop(); a2 = stack.pop()
            stack.append((a2 + b2) % P)
        elif op == OP_SUB:
            b2 = stack.pop(); a2 = stack.pop()
            stack.append((a2 - b2) % P)
        elif op == OP_MUL:
            b2 = stack.pop(); a2 = stack.pop()
            stack.append((a2 * b2) % P)
        elif op == OP_EMIT:
            v = stack.pop()
            acc = (acc + v * alphas[int(prog.aidx[i])]) % P
    assert not stack
    return acc
