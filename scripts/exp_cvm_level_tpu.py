"""Microbench: scan vs leveled CVM executor on the live backend.

Builds the rollup-bench program's recorded constraint program at the
flagship segment config (n=4096, blowup_c=8 -> N=32768), runs both
executors on random limb inputs, and prints warm per-call times.

Usage: ZKL_DEVICE=jax python scripts/exp_cvm_level_tpu.py [--reps 5]
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--blowup-c", type=int, default=8)
    ap.add_argument("--vmap", type=int, default=0,
                    help="vmap width (0 = unbatched)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.compiler import compile_entry
    from zklisp_tpu.core.pi import PublicInputsBuilder
    from zklisp_tpu.field import limb
    from zklisp_tpu.prove import cvm
    from zklisp_tpu.prove import stark_device as sd
    from zklisp_tpu.prove import planner
    from zklisp_tpu.prove.params import ProverOptions
    from zklisp_tpu.trace import build as tb

    print("backend:", jax.default_backend(), flush=True)

    base = open(os.path.join(os.path.dirname(__file__), "..",
                             "examples", "rollup-bench.zlisp")).read()
    n_ops = args.rows // 32
    # calibrate batch count like bench_e2e.rollup_source
    from scripts.bench_e2e import rollup_source
    src, k, nops = rollup_source(n_ops)
    prog_c = compile_entry(src, [])
    pi = PublicInputsBuilder(prog_c).build()
    opts = ProverOptions(queries=64, blowup=16, grind=16,
                         min_security_bits=0)
    segments = planner.plan_segments(prog_c, pi, opts)
    trace = tb.build_trace(prog_c, pi)
    rom_acc = tb.rom_acc_from_program(prog_c)
    from zklisp_tpu.parallel.mesh_prover import _SegPrep
    prep = _SegPrep(0, len(segments), segments[0], trace, prog_c, pi,
                    opts.to_proof_options(), 0, pi.program_id, rom_acc)
    air = prep.air
    n = prep.n
    bc = args.blowup_c
    N = n * bc
    per_p = np.asarray(limb.from_ints(air.periodic_lde_period(bc)))
    prog, specs = sd._record_cvm(air, per_p.shape[0] + 1)
    lp = prog.levels
    n_batches = sum(len(lvl) for lvl in lp.levels)
    print(f"w={air.trace_width} n={n} N={N} instr={prog.n_instr} "
          f"levels={len(lp.levels)} batches={n_batches} "
          f"slots={lp.n_slots} roots={len(lp.root_aidx)}", flush=True)

    rng = np.random.default_rng(0)
    S = max(args.vmap, 1)

    def rl(shape):
        return rng.integers(0, 1 << 16, size=shape + (limb.NLIMB,),
                            dtype=np.uint32)

    lde = jnp.asarray(rl((S, air.trace_width, N) if args.vmap
                         else (air.trace_width, N)))
    p_last = jnp.asarray(rl((N,)))
    n_alpha = air.num_transition_constraints()
    alphas = jnp.asarray(rl((S, n_alpha) if args.vmap else (n_alpha,)))
    per_dev = jnp.asarray(per_p)

    def bench(name, fn):
        r = fn()
        jax.block_until_ready(r)
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            r = fn()
            jax.block_until_ready(r)
            ts.append(time.time() - t0)
        print(f"{name}: warm {min(ts)*1e3:.1f} ms (median "
              f"{sorted(ts)[len(ts)//2]*1e3:.1f} ms)", flush=True)
        return r

    if args.vmap:
        lvl_fn = jax.jit(jax.vmap(
            lambda l, a: cvm.execute_leveled(lp, l, per_dev, p_last,
                                             a, bc),
            in_axes=(0, 0)))
        scan_fn = jax.jit(jax.vmap(
            lambda l, a: cvm._exec_fn(
                air.trace_width, per_p.shape[0], per_p.shape[1], N, bc,
                prog.stack_size, prog.ops.shape[0], prog.n_slots)(
                    l, per_dev, p_last, a, jnp.asarray(prog.ops),
                    jnp.asarray(prog.arg), jnp.asarray(prog.imm),
                    jnp.asarray(prog.aidx)),
            in_axes=(0, 0)))
        t0 = time.time()
        a = bench("leveled(vmap)", lambda: lvl_fn(lde, alphas))
        print(f"  (incl compile {time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        b = bench("scan(vmap)", lambda: scan_fn(lde, alphas))
        print(f"  (incl compile {time.time()-t0:.1f}s)", flush=True)
    else:
        t0 = time.time()
        a = bench("leveled", lambda: cvm.execute_leveled(
            lp, lde, per_dev, p_last, alphas, bc))
        print(f"  (incl compile {time.time()-t0:.1f}s)", flush=True)
        os.environ["ZKL_CVM_LEVEL"] = "0"
        t0 = time.time()
        b = bench("scan", lambda: cvm.execute(
            prog, lde, per_dev, p_last, alphas, bc))
        print(f"  (incl compile {time.time()-t0:.1f}s)", flush=True)
    print("equal:", bool(np.array_equal(np.asarray(a), np.asarray(b))),
          flush=True)


if __name__ == "__main__":
    main()
