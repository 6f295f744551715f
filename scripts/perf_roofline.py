#!/usr/bin/env python
"""Roofline accounting for the steady-state wave prover (PERF.md).

Three parts:
  1. DEVICE CEILING — microbenchmark the f128 limb kernels the prover
     is built from (elementwise limb.mul, limb.dot, and the batched
     Poseidon permutation) on the actual backend.  This is the
     "speed of light" for the chosen 16-bit-limb representation: no
     prover phase can exceed it.
  2. WORK COUNT — analytic f128-multiply counts per prover phase at
     the north-star config (2^16-row rollup trace, 16 segments of
     n=4096, w=219, blowup=16, q=64), with the composition phase's
     per-row mul count taken from the recorded constraint bytecode
     (exact, not estimated).
  3. ACHIEVED — divide work by measured phase wall times (pass them in
     with --phase name=seconds, from a traced bench run) and print
     achieved-vs-ceiling utilization per phase.

Usage:
  ZKL_DEVICE=jax python scripts/perf_roofline.py            # ceiling
  python scripts/perf_roofline.py --counts                  # work only
  python scripts/perf_roofline.py --phase wave_lde=2.4 \
      --phase wave_trace_commit=3.15 ... --ceiling 2.1e9
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

POSEIDON_ROUNDS = 27
T = 12


def perm_muls(t: int = T, rounds: int = POSEIDON_ROUNDS) -> int:
    """f128 muls in one Poseidon2 permutation: x^3 S-box (2 muls/lane)
    + dense t x t MDS per round."""
    return rounds * (2 * t + t * t)


def ntt_muls(size: int) -> int:
    """Radix-2 NTT butterflies: one twiddle mul per butterfly."""
    return (size // 2) * int(math.log2(size))


def merkle_tree_perms(leaves: int) -> int:
    return leaves - 1


def leaf_hash_perms(width: int, partition_size: int) -> float:
    """Per-row permutations of the partitioned leaf hash
    (PoseidonHasher semantics: rate-10 absorb per partition, then one
    merge pass over partition digests)."""
    nparts = math.ceil(width / partition_size)
    per_part = math.ceil(partition_size / 10)
    merge = math.ceil(nparts / 10) if nparts > 1 else 0
    return nparts * per_part + merge


def phase_work(n=4096, w=219, blowup=16, q=64, n_seg=16,
               cvm_muls_per_row=None, n_constraints=None, Q=8):
    """f128-mul counts per phase for the WHOLE 16-segment round."""
    N = n * blowup
    Nc = n * Q              # composition evaluates on the ce sub-domain
    ps_main = 16            # select_partitions_for_trace at w=219
    ps_con = Q

    lde = n_seg * w * (ntt_muls(n) + n + N + ntt_muls(N))
    # trace commit: per row leaf hash over w cols + tree
    commit_perms = n_seg * (N * leaf_hash_perms(w, ps_main)
                            + merkle_tree_perms(N))
    trace_commit = commit_perms * perm_muls()

    if cvm_muls_per_row is None:
        # measured on the recorded bytecode for the rollup AIR; see
        # --counts which derives it live
        cvm_muls_per_row = 4000
    # scan-block (Poseidon t=12 + ROM t=3 transition) muls per row:
    # 27 rounds x (12 lanes x^3: 24 + MDS 144 + gate 12) for t=12 and
    # 27 x (6 + 9 + 3) for t=3 — evaluated outside the cvm bytecode
    scan_muls_per_row = 27 * (24 + 144 + 12) + 27 * (6 + 9 + 3)
    composition = n_seg * Nc * (cvm_muls_per_row + scan_muls_per_row)

    # quotient: divisor apply + beta combine per group (dominated by
    # the per-row mul with the zerofier inverse and the iNTT/NTT pair)
    quotient = n_seg * (Nc * 8 + ntt_muls(Nc) * Q + ntt_muls(N) * Q)

    con_commit_perms = n_seg * (N * leaf_hash_perms(Q, ps_con)
                                + merkle_tree_perms(N))
    constraint_commit = con_commit_perms * perm_muls()

    # OOD: two dot(polys, zpows) over (w+Q) cols x n, both z and zg
    ood = n_seg * 2 * (w + Q) * n

    # DEEP: per row, (w+Q) muls for the coefficient combine + 2 muls
    # for the inverse-weighted terms
    deep = n_seg * N * (w + Q + 4)

    # FRI: fold layers N/2 + N/4 + ... (~N per chain) x ~3 muls/fold
    fri = n_seg * 3 * N

    return {
        "wave_lde": lde,
        "wave_trace_commit": trace_commit,
        "wave_composition": composition,
        "wave_quotient": quotient,
        "wave_constraint_commit": constraint_commit,
        "wave_ood": ood,
        "wave_deep_sync": deep,
        "wave_fri": fri,
    }


def measure_ceiling() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zklisp_tpu.field import limb
    from zklisp_tpu.crypto import poseidon_jax as pj

    rng = np.random.default_rng(0)
    M = 1 << 22
    a = jnp.asarray(rng.integers(0, 1 << 16, (M, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (M, 8), dtype=np.uint32))

    mul_fn = jax.jit(lambda x, y: limb.mul(x, y, jnp))
    out = mul_fn(a, b); out.block_until_ready()
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        out = mul_fn(out, b)
    out.block_until_ready()
    mul_rate = M * reps / (time.time() - t0)

    S = 1 << 15
    states = jnp.asarray(
        rng.integers(0, 1 << 16, (S, T, 8), dtype=np.uint32))
    perm_fn = jax.jit(
        lambda s: pj.permute12_batch(s, pj.pos.HASHER_SUITE_ID, jnp))
    o = perm_fn(states); o.block_until_ready()
    t0 = time.time()
    for _ in range(4):
        o = perm_fn(o)
    o.block_until_ready()
    perm_rate = S * 4 / (time.time() - t0)

    return {
        "elementwise_mul_per_s": mul_rate,
        "poseidon_perm_per_s": perm_rate,
        "poseidon_muls_per_s": perm_rate * perm_muls(),
        "device": str(jax.devices()[0]),
    }


def live_cvm_muls() -> tuple:
    """Record the rollup AIR's constraint bytecode and count muls/row."""
    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.compiler import compile_entry
    from zklisp_tpu.core.pi import PublicInputsBuilder
    from zklisp_tpu.prove import stark_device as sd
    from zklisp_tpu.trace import build as tb
    import re

    base = open(os.path.join(os.path.dirname(__file__), "..",
                             "examples", "rollup-bench.zlisp")).read()
    src = re.sub(r"\(def BATCH \d+\)", "(def BATCH 2)", base)
    prog = compile_entry(src, [])
    pi = PublicInputsBuilder(prog).build()
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    prog_cvm, specs = sd._record_cvm(air, 32)
    import numpy as np
    from zklisp_tpu.prove.cvm import OP_MUL
    n_mul = int(np.sum(np.asarray(prog_cvm.ops) == OP_MUL))
    # scan-block constraints (specs) evaluate outside the cvm; count
    # their muls from the spec structure when present (approximate by
    # the Poseidon transition cost per scanned block)
    return air.num_transition_constraints(), n_mul, prog_cvm.n_instr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", action="store_true")
    ap.add_argument("--ceiling", type=float, default=None,
                    help="f128 muls/s device ceiling (skip measuring)")
    ap.add_argument("--phase", action="append", default=[],
                    help="name=seconds measured wall time")
    args = ap.parse_args()

    out = {}
    try:
        ncon, cvm_mul, n_instr = live_cvm_muls()
        out["n_constraints"] = ncon
        out["cvm_instr"] = n_instr
        out["cvm_muls_per_row"] = cvm_mul
    except Exception as e:
        print(f"# cvm count failed: {e}", file=sys.stderr)
        cvm_mul = None

    work = phase_work(cvm_muls_per_row=cvm_mul)
    out["work_f128_muls"] = work
    out["work_total"] = sum(work.values())

    if not args.counts:
        if args.ceiling:
            out["ceiling_muls_per_s"] = args.ceiling
        else:
            out["ceiling"] = measure_ceiling()
            out["ceiling_muls_per_s"] = out["ceiling"]["elementwise_mul_per_s"]

    phases = dict(p.split("=") for p in args.phase)
    if phases and out.get("ceiling_muls_per_s"):
        ceil = float(out["ceiling_muls_per_s"])
        util = {}
        for name, secs in phases.items():
            secs = float(secs)
            if name in work and secs > 0:
                util[name] = {
                    "measured_s": secs,
                    "muls": work[name],
                    "achieved_muls_per_s": round(work[name] / secs),
                    "pct_of_ceiling": round(
                        100 * work[name] / secs / ceil, 1),
                }
        out["utilization"] = util

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
