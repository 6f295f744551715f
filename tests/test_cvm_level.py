"""Leveled CVM executor (cvm.compile_levels / execute_leveled) vs the
scan executor and the host row interpreter.

The leveled executor is the default composition path
(`ZKL_CVM_LEVEL`), so equality with the scan executor — which the
device byte-equality tiers pin against the host prover — is the
correctness contract.  Random DAGs with heavy node sharing stress the
slot allocator's reuse logic (a slot freed too early corrupts a later
gather; these tests would see it as a value mismatch)."""

import numpy as np
import pytest

from zklisp_tpu.field import f128, limb
from zklisp_tpu.prove import cvm

P = f128.P


def _rand_fe(rng):
    return ((int(rng.integers(0, 2**63)) << 64)
            | int(rng.integers(0, 2**63))) % P


def _rand_limbs(rng, shape):
    vals = [_rand_fe(rng) for _ in range(int(np.prod(shape)))]
    return np.asarray(limb.from_ints(vals)).reshape(*shape, limb.NLIMB)


def _random_dag(rng, width, n_per, n_roots, n_nodes):
    """Pool-based random DAG: every new binop draws operands from the
    whole pool (leaves + existing nodes), so sharing and deep reuse
    chains arise naturally."""
    cur, nxt, per = cvm.sym_leaves(width, n_per)
    pool = cur + nxt + per + [cvm.Sym("const", k=_rand_fe(rng))
                              for _ in range(4)]
    kinds = ["add", "sub", "mul"]
    for _ in range(n_nodes):
        a = pool[int(rng.integers(len(pool)))]
        b = pool[int(rng.integers(len(pool)))]
        pool.append(cvm.Sym(kinds[int(rng.integers(3))], a, b))
    roots = []
    for i in range(n_roots):
        roots.append((pool[len(pool) - 1 - int(rng.integers(n_nodes // 2))],
                      i))
    return roots


def _run_both(prog, width, n_per, N, period, blowup, rng, n_alpha):
    import jax.numpy as jnp

    lde = _rand_limbs(rng, (width, N))
    per_p = _rand_limbs(rng, (n_per - 1, period))
    p_last = _rand_limbs(rng, (N,))
    alphas = _rand_limbs(rng, (n_alpha,))

    acc_lvl = np.asarray(cvm.execute_leveled(
        prog.levels, jnp.asarray(lde), jnp.asarray(per_p),
        jnp.asarray(p_last), jnp.asarray(alphas), blowup))

    import os
    os.environ["ZKL_CVM_LEVEL"] = "0"
    try:
        acc_scan = np.asarray(cvm.execute(
            prog, jnp.asarray(lde), jnp.asarray(per_p),
            jnp.asarray(p_last), jnp.asarray(alphas), blowup))
    finally:
        del os.environ["ZKL_CVM_LEVEL"]
    return lde, per_p, p_last, alphas, acc_lvl, acc_scan


def test_leveled_matches_scan_and_interpreter():
    rng = np.random.default_rng(7)
    width, n_per, N, period, blowup = 6, 4, 64, 8, 4
    roots = _random_dag(rng, width, n_per, n_roots=10, n_nodes=60)
    prog = cvm.compile_constraints(roots)
    assert prog.levels is not None

    lde, per_p, p_last, alphas, acc_lvl, acc_scan = _run_both(
        prog, width, n_per, N, period, blowup, rng, n_alpha=10)
    assert np.array_equal(acc_lvl, acc_scan)

    alpha_ints = limb.to_ints(alphas)
    lde_ints = limb.to_ints(lde)
    per_ints = limb.to_ints(per_p)
    plast_ints = limb.to_ints(p_last)
    acc_ints = limb.to_ints(acc_lvl)
    for r in (0, 1, N - 1, N - blowup):
        cur_rows = [int(lde_ints[c, r]) for c in range(width)]
        nxt_rows = [int(lde_ints[c, (r + blowup) % N])
                    for c in range(width)]
        per_rows = ([int(per_ints[c, r % period])
                     for c in range(n_per - 1)]
                    + [int(plast_ints[r])])
        want = cvm.interpret(prog, cur_rows, nxt_rows, per_rows,
                             [int(a) for a in alpha_ints])
        assert int(acc_ints[r]) == want


def test_leveled_multi_chunk_and_deep_reuse():
    """N large enough to force the chunked row loop (C=1024), plus a
    bigger DAG so slots actually get freed and reused across levels."""
    rng = np.random.default_rng(11)
    width, n_per, N, period, blowup = 4, 3, 2048, 16, 32
    roots = _random_dag(rng, width, n_per, n_roots=24, n_nodes=300)
    prog = cvm.compile_constraints(roots)
    lp = prog.levels
    n_nodes = sum(len(b[1]) for lvl in lp.levels for b in lvl)
    assert lp.n_slots == n_nodes, "append positions must cover all ops"

    _, _, _, _, acc_lvl, acc_scan = _run_both(
        prog, width, n_per, N, period, blowup, rng, n_alpha=24)
    assert np.array_equal(acc_lvl, acc_scan)


def test_leveled_real_air_program():
    """The leveled schedule of a REAL recorded AIR program equals the
    scan executor on random inputs (catches source-kind or periodic
    handling the synthetic DAGs miss)."""
    import jax.numpy as jnp

    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.compiler import compile_entry
    from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
    from zklisp_tpu.prove import stark_device as sd
    from zklisp_tpu.trace import build as tb

    prog_c = compile_entry("(def (main a b) (+ (* a a) b))", [3, 4])
    pi = (PublicInputsBuilder(prog_c)
          .with_main_args([VmArg.u64(3), VmArg.u64(4)]).build())
    trace = tb.build_trace(prog_c, pi)
    rom_acc = tb.rom_acc_from_program(prog_c)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc,
                                    None, None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    blowup = 8
    per_p = np.asarray(limb.from_ints(air.periodic_lde_period(blowup)))
    prog, _ = sd._record_cvm(air, per_p.shape[0] + 1)
    if not prog.n_instr:
        pytest.skip("program has no generic constraints")

    rng = np.random.default_rng(3)
    w, N = air.trace_width, trace.length * blowup
    n_alpha = air.num_transition_constraints()
    lde = _rand_limbs(rng, (w, N))
    p_last = _rand_limbs(rng, (N,))
    alphas = _rand_limbs(rng, (n_alpha,))

    acc_lvl = np.asarray(cvm.execute_leveled(
        prog.levels, jnp.asarray(lde), jnp.asarray(per_p),
        jnp.asarray(p_last), jnp.asarray(alphas), blowup))
    import os
    os.environ["ZKL_CVM_LEVEL"] = "0"
    try:
        acc_scan = np.asarray(cvm.execute(
            prog, jnp.asarray(lde), jnp.asarray(per_p),
            jnp.asarray(p_last), jnp.asarray(alphas), blowup))
    finally:
        del os.environ["ZKL_CVM_LEVEL"]
    assert np.array_equal(acc_lvl, acc_scan)
