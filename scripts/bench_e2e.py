#!/usr/bin/env python
"""End-to-end prove benchmark: 2^16-row trace on one chip (north star).

Builds a fib-chain program sized to a 65536-row trace (2048 ops), proves
all 16 default segments with the jit-staged device prover, aggregates,
and prints per-phase wall times plus proved-rows/s.

Usage: ZKL_DEVICE=jax python scripts/bench_e2e.py [--rows 65536]
       [--queries 64] [--grind 16] [--blowup 16] [--verify]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("ZKL_FORCE_CPU"):
    # must happen before any backend init (sitecustomize pins
    # jax_platforms=axon,cpu; env JAX_PLATFORMS is ignored)
    import jax

    jax.config.update("jax_platforms", "cpu")


HERE = os.path.dirname(os.path.abspath(__file__))
ROLLUP_ZLISP = os.path.join(HERE, "..", "examples", "rollup-bench.zlisp")


def _calibrated_source(n_ops_target: int, src_of_k, args) -> tuple:
    """Binary-search the largest k whose program stays <= target ops."""
    from zklisp_tpu.compiler import compile_entry

    lo, hi, best = 1, n_ops_target, None
    while lo <= hi:
        mid = (lo + hi) // 2
        try:
            prog = compile_entry(src_of_k(mid), args)
        except Exception:
            hi = mid - 1
            continue
        n = len(prog.ops)
        if n <= n_ops_target:
            best = (mid, n)
            lo = mid + 1
        else:
            hi = mid - 1
    k, n = best
    return src_of_k(k), k, n


def fib_chain_source(n_ops_target: int) -> tuple:
    """A loop program whose op count lands in (target/2, target]."""
    def src(k: int) -> str:
        return (
            "(def (main a b)\n"
            f"  (loop :max {k} ((i 0) (x a) (y b))\n"
            "    x\n"
            "    (recur (+ i 1) y (+ x y))))\n"
        )

    return _calibrated_source(n_ops_target, src, [1, 1])


def rollup_source(n_ops_target: int) -> tuple:
    """examples/rollup-bench.zlisp with BATCH scaled to the target op
    count — the BASELINE.md workload (RAM tx table + safe-arith debits
    + sponge digest chain), NOT the lighter pure-ALU fib chain."""
    import re

    base = open(ROLLUP_ZLISP).read()

    def src(k: int) -> str:
        return re.sub(r"\(def BATCH \d+\)", f"(def BATCH {k})", base)

    return _calibrated_source(n_ops_target, src, [])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--grind", type=int, default=16)
    ap.add_argument("--blowup", type=int, default=16)
    ap.add_argument("--security-bits", type=int, default=0)
    ap.add_argument("--concurrency", type=int, default=2,
                    help="in-flight segments (device threads; the "
                         "reference rollup-bench config uses "
                         "max_concurrent_segments=8 on an M3 Max)")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--skip-byte-check", action="store_true",
                    help="skip the device/host StepProof byte-equality "
                         "evidence run")
    ap.add_argument("--no-agg", action="store_true")
    ap.add_argument("--once", action="store_true",
                    help="skip the steady-state second round")
    ap.add_argument("--workload", choices=("rollup", "fib"),
                    default="rollup",
                    help="rollup = examples/rollup-bench.zlisp (the "
                         "BASELINE headline, RAM+sponge-heavy); fib = "
                         "pure-ALU chain (lighter per-row ceiling)")
    args = ap.parse_args()

    from zklisp_tpu.compiler import compile_entry
    from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
    from zklisp_tpu.prove.params import ProverOptions
    from zklisp_tpu.prove import prover
    from zklisp_tpu.trace import build as tb
    from zklisp_tpu.agg import aggregate as agg

    n_ops = args.rows // 32
    t0 = time.time()
    if args.workload == "rollup":
        src, k, nops = rollup_source(n_ops)
        main_args, vm_args = [], []
    else:
        src, k, nops = fib_chain_source(n_ops)
        main_args, vm_args = [1, 1], [VmArg.u64(1), VmArg.u64(1)]
    prog = compile_entry(src, main_args)
    t_compile = time.time() - t0
    rows = (1 << max(0, (len(prog.ops) - 1).bit_length())) * 32
    print(f"program: workload={args.workload} k={k} ops={nops} "
          f"trace_rows={rows} (compile {t_compile:.2f}s)", flush=True)

    b = PublicInputsBuilder(prog)
    if vm_args:
        b = b.with_main_args(vm_args)
    pi = b.build()
    opts = ProverOptions(queries=args.queries, blowup=args.blowup,
                         grind=args.grind,
                         min_security_bits=args.security_bits,
                         max_concurrent_segments=args.concurrency)

    t0 = time.time()
    trace = tb.build_trace(prog, pi)
    t_trace = time.time() - t0
    print(f"trace build: {t_trace:.2f}s ({rows} rows)", flush=True)

    # prove (segment loop; device prover compiles once per segment shape)
    t0 = time.time()
    steps = prover.prove_program(prog, pi, opts)
    t_prove = time.time() - t0
    print(f"prove: {t_prove:.2f}s for {len(steps)} segments "
          f"({rows / t_prove:.1f} rows/s incl. trace/compile overheads)",
          flush=True)

    t_agg = 0.0
    if not args.no_agg:
        t0 = time.time()
        agg_pi = agg.build_agg_public(steps)
        agg_pi.pi_digest = pi.digest()
        if os.environ.get("ZKL_AGG_PROFILE"):
            import cProfile
            import pstats
            pr = cProfile.Profile()
            pr.enable()
            proof, digest = agg.recursion_prove(steps, agg_pi, opts)
            pr.disable()
            pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
        else:
            proof, digest = agg.recursion_prove(steps, agg_pi, opts)
        t_agg = time.time() - t0
        print(f"aggregate: {t_agg:.2f}s", flush=True)
        if args.verify:
            t0 = time.time()
            agg.verify_agg(proof, agg_pi)
            print(f"verify agg: {time.time() - t0:.2f}s", flush=True)

    total = t_trace + t_prove + t_agg
    cold = rows / total
    # salvage line: if the steady round exceeds the caller's budget,
    # bench.py falls back to the last INTERIM result instead of failing
    print("INTERIM " + json.dumps({
        "metric": "proved_rows_per_sec_2e16_e2e",
        "value": round(cold, 1), "unit": "rows/s", "vs_baseline": None,
        "baseline_note": "reference publishes no machine-readable "
                         "baseline (BASELINE.md); no denominator exists",
        "detail": {"workload": args.workload,
                   "rows": rows, "segments": len(steps),
                   "cold_rows_per_sec": round(cold, 1),
                   "phase": "cold-only (steady round not finished)",
                   "trace_s": round(t_trace, 2),
                   "prove_s": round(t_prove, 2),
                   "agg_s": round(t_agg, 2),
                   "queries": args.queries, "blowup": args.blowup,
                   "grind": args.grind}}), flush=True)

    # steady-state round: same shapes, all executables warm — the
    # throughput of a long-running prover (the one-time per-process
    # device compiles dominate the cold round on this tunneled chip)
    steady = None
    t_prove2 = t_agg2 = 0.0
    verify_s = None
    verified = None
    if not args.once:
        if args.no_agg:
            t0 = time.time()
            steps = prover.prove_program(prog, pi, opts)
            t_prove2 = time.time() - t0
        else:
            # the steady round exercises the PIPELINED chain: child FS
            # replay prefetched behind later proving waves
            # (agg.prove_chain), the long-running service's real path
            t0 = time.time()
            proof, digest, agg_pi = agg.prove_chain(prog, pi, opts)
            t_chain = time.time() - t0
            t_prove2 = agg.LAST_CHAIN_TIMINGS.get("steps_s", t_chain)
            t_agg2 = agg.LAST_CHAIN_TIMINGS.get("agg_s", 0.0)
            # the recorded run must carry evidence the artifact VERIFIES
            # (reference verify path: prove.rs:732-800); verify time is
            # excluded from the throughput number, matching the
            # reference's prove-only accounting
            t0 = time.time()
            agg.verify_agg(proof, agg_pi)
            verify_s = round(time.time() - t0, 2)
            verified = True
            print(f"verify agg (steady): {verify_s:.2f}s ok", flush=True)
        steady = rows / (t_trace + t_prove2 + t_agg2)
        print(f"steady round: prove {t_prove2:.2f}s agg {t_agg2:.2f}s",
              flush=True)
        # salvage line again: protect the steady number from a
        # timeout/crash during the byte-equality check below
        print("INTERIM " + json.dumps({
            "metric": "proved_rows_per_sec_2e16_e2e",
            "value": round(steady, 1), "unit": "rows/s",
            "vs_baseline": None,
            "detail": {"workload": args.workload, "rows": rows,
                       "segments": len(steps),
                       "cold_rows_per_sec": round(cold, 1),
                       "trace_s": round(t_trace, 2),
                       "prove_s": round(t_prove, 2),
                       "agg_s": round(t_agg, 2),
                       "steady_prove_s": round(t_prove2, 2),
                       "steady_agg_s": round(t_agg2, 2),
                       "verify_s": verify_s, "verified": verified,
                       "phase": "steady (byte check not finished)",
                       "queries": args.queries, "blowup": args.blowup,
                       "grind": args.grind}}), flush=True)

    # Device/host byte-equality evidence ON THIS BACKEND: prove one
    # small single-segment program twice — jit-staged device path vs
    # the numpy host prover — and compare StepProof bytes.  The fast
    # test tier asserts this on CPU; running it here records it for the
    # real TPU (exact integer limb math should agree everywhere, but
    # the MXU-assisted paths deserve recorded evidence, not "should").
    bytes_equal = None
    if os.environ.get("ZKL_DEVICE", "").lower() in ("jax", "tpu") \
            and not args.skip_byte_check:
        try:
            t0 = time.time()
            bsrc = ("(def (main a b)\n"
                    "  (let ((h (hash2 a b)))\n"
                    "    (+ (* h h) (hash2 h a))))\n")
            bprog = compile_entry(bsrc, [3, 5])
            bpi = (PublicInputsBuilder(bprog)
                   .with_main_args([VmArg.u64(3), VmArg.u64(5)])
                   .build())
            bopts = ProverOptions(queries=8, blowup=8, grind=0,
                                  min_security_bits=0)
            dev_steps = prover.prove_program(bprog, bpi, bopts)
            saved = os.environ.get("ZKL_DEVICE", "")
            os.environ["ZKL_DEVICE"] = ""
            try:
                host_steps = prover.prove_program(bprog, bpi, bopts)
            finally:
                os.environ["ZKL_DEVICE"] = saved
            bytes_equal = (len(dev_steps) == len(host_steps) and all(
                d.to_bytes() == h.to_bytes()
                for d, h in zip(dev_steps, host_steps)))
            print(f"byte check: device==host {bytes_equal} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"byte check skipped: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "proved_rows_per_sec_2e16_e2e",
        "value": round(steady if steady is not None else cold, 1),
        "unit": "rows/s",
        # the reference publishes no machine-readable numbers
        # (BASELINE.md), so there is no honest denominator
        "vs_baseline": None,
        "baseline_note": "reference publishes no machine-readable "
                         "baseline (BASELINE.md); no denominator exists",
        "detail": {
            "workload": args.workload,
            "rows": rows, "segments": len(steps),
            "cold_rows_per_sec": round(cold, 1),
            "trace_s": round(t_trace, 2), "prove_s": round(t_prove, 2),
            "agg_s": round(t_agg, 2),
            "steady_prove_s": round(t_prove2, 2),
            "steady_agg_s": round(t_agg2, 2),
            "verify_s": verify_s, "verified": verified,
            "device_host_bytes_equal": bytes_equal,
            "queries": args.queries, "blowup": args.blowup,
            "grind": args.grind,
            "device": os.environ.get("ZKL_DEVICE", "host"),
        },
    }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # keep stdout machine-readable for bench.py
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "proved_rows_per_sec_2e16_e2e", "value": None,
            "unit": "rows/s", "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e)[:400]}",
        }), flush=True)
