#!/usr/bin/env python
"""Benchmark: the north-star metric — end-to-end proved rows/s on one chip.

Workload: examples/rollup-bench.zlisp (the BASELINE.md headline config —
RAM tx table + safe-arith debits/credits + sponge digest chain, 2^16-row
trace, queries=64, blowup=16, grind=16), proved segment-parallel with the
jit-staged device prover and aggregated STARK-in-STARK.

Robustness contract (the driver records this output as BENCH_r{N}.json and
parses the LAST JSON line on stdout):
  1. A GUARANTEED number lands first: the weakened-config rollup e2e runs
     on the CPU backend inside a bounded subprocess and its JSON line is
     printed IMMEDIATELY — so even if the driver's outer budget kills this
     process mid-TPU-attempt, a measured value is already on stdout.
  2. Then the flaky tunneled-TPU backend is probed in a throwaway
     subprocess (bounded retries) and, if alive, the full-config TPU e2e
     runs under the remaining budget; on success its JSON line is printed
     LAST and becomes the headline.  On TPU failure nothing more is
     printed to stdout (the CPU line stays the last parseable result) and
     diagnostics go to stderr.
Always exits 0.

Modes: default = the flow above; --small = weakened params only;
--cpu = force CPU backend; --lde-commit = legacy kernel-level metric;
--workload fib = pure-ALU chain instead of rollup.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# One shared wall-clock budget for everything (the driver enforces an
# outer timeout we cannot see; r3 was SIGKILLed mid-retry, so every
# phase below derives its timeout from the remaining budget).
TOTAL_BUDGET_S = int(os.environ.get("ZKL_BENCH_BUDGET_S", "2400"))
_DEADLINE = time.time() + TOTAL_BUDGET_S

PROBE_ATTEMPTS = 2
PROBE_TIMEOUT_S = 660      # cold tunnel contact measured up to ~9.5 min
RETRY_WAIT_S = 60
CPU_GUARANTEE_TIMEOUT_S = 1100   # measured ~660s on this 2-CPU box

_PROBE_SRC = r"""
import json, time, sys
t0 = time.time()
try:
    import jax, jax.numpy as jnp
    devs = jax.devices()
    x = jax.device_put(jnp.arange(8, dtype=jnp.uint32))
    ok = int(jax.device_get(x).sum()) == 28
    print(json.dumps({"ok": ok, "device": str(devs[0]),
                      "n_devices": len(devs),
                      "init_s": round(time.time() - t0, 1)}))
except Exception as e:
    print(json.dumps({"ok": False, "error_type": type(e).__name__,
                      "error": str(e)[:400],
                      "init_s": round(time.time() - t0, 1)}))
"""


def _remaining() -> float:
    return _DEADLINE - time.time()


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _note(msg: str) -> None:
    print("# " + msg, file=sys.stderr, flush=True)


def _run_bench_e2e(extra_args, env_extra, timeout_s):
    """Run scripts/bench_e2e.py; return (result_dict_or_None, info).

    bench_e2e prints progress lines + INTERIM lines + one final JSON
    line on stdout; we forward progress to stderr and return the last
    JSON object with a non-null value (final beats INTERIM)."""
    cmd = [sys.executable, os.path.join(HERE, "scripts", "bench_e2e.py")]
    cmd += list(extra_args)
    env = dict(os.environ)
    env.setdefault("ZKL_DEVICE", "jax")
    env.update(env_extra)
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=max(30, timeout_s), env=env)
        stdout, rc = out.stdout, out.returncode
        stderr_tail = out.stderr[-2000:]
        timed_out = False
    except subprocess.TimeoutExpired as e:
        stdout = e.stdout or ""
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
        stderr_tail = ""
        rc, timed_out = None, True
    best, err = None, None
    for line in stdout.splitlines():
        line = line.strip()
        payload = line[len("INTERIM "):] if line.startswith("INTERIM {") \
            else line
        if payload.startswith("{") and '"metric"' in payload:
            try:
                res = json.loads(payload)
            except ValueError:
                continue
            if res.get("value") is not None:
                best = res
                if line.startswith("INTERIM"):
                    best.setdefault("detail", {})["phase"] = \
                        best["detail"].get("phase", "cold-only")
            else:
                err = res
        elif line:
            _note(line)
    info = {"rc": rc, "timed_out": timed_out,
            "elapsed_s": round(time.time() - t0, 1),
            "error": (err or {}).get("error"),
            "stderr_tail": stderr_tail}
    return best, info


def probe_backend() -> bool:
    attempts = []
    for i in range(PROBE_ATTEMPTS):
        if _remaining() < 120:
            _note("probe skipped: budget exhausted")
            return False
        tmo = min(PROBE_TIMEOUT_S, max(60, _remaining() - 60))
        t0 = time.time()
        try:
            out = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                                 capture_output=True, text=True,
                                 timeout=tmo)
            line = out.stdout.strip().splitlines()[-1] \
                if out.stdout.strip() else "{}"
            res = json.loads(line)
        except subprocess.TimeoutExpired:
            res = {"ok": False, "error_type": "Timeout",
                   "error": f"backend probe exceeded {tmo:.0f}s",
                   "init_s": round(time.time() - t0, 1)}
        except Exception as e:
            res = {"ok": False, "error_type": type(e).__name__,
                   "error": str(e)[:400]}
        attempts.append(res)
        if res.get("ok"):
            _note(f"backend ok: {res.get('device')} "
                  f"(init {res.get('init_s')}s)")
            return True
        _note(f"probe attempt {i + 1} failed: {res.get('error_type')}: "
              f"{str(res.get('error'))[:200]}")
        if i + 1 < PROBE_ATTEMPTS and _remaining() > RETRY_WAIT_S + 120:
            time.sleep(RETRY_WAIT_S)
    return False


def run_lde_commit(small: bool, cpu: bool) -> None:
    """Legacy kernel-level metric: LDE + Merkle commit of one segment."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    n = 512 if small else 4096
    width = 219
    blowup = 4 if small else 16
    N = n * blowup
    chunk = min(N, 4096)
    partition_size = 16

    from zklisp_tpu.prove import kernels

    dev = jax.devices()[0]
    _ = jax.device_get(jnp.zeros((8,), jnp.uint32))

    rng = np.random.default_rng(7)
    cols = rng.integers(0, 1 << 16, size=(width, n, 8), dtype=np.uint32)
    cols_d = jax.device_put(jnp.asarray(cols), dev)

    lde_fn = kernels.lde_columns_fn(n, blowup)
    leaf_fn = kernels.leaf_hash_fn(width, partition_size)
    tree_fn = kernels.merkle_levels_fn(N)

    def run_once():
        lde = lde_fn(cols_d)
        rows = jnp.transpose(lde, (1, 0, 2))
        leaves = []
        for off in range(0, N, chunk):
            leaves.append(leaf_fn(rows[off:off + chunk]))
        leaves = jnp.concatenate(leaves, axis=0)
        levels = tree_fn(leaves)
        return levels[-1]

    t0 = time.time()
    root = run_once()
    root.block_until_ready()
    compile_s = time.time() - t0

    iters = 1 if small else 2
    t0 = time.time()
    for _ in range(iters):
        root = run_once()
    root.block_until_ready()
    steady = (time.time() - t0) / iters

    _emit({"metric": "lde_commit_rows_per_sec_2e16",
           "value": round(N / steady, 1), "unit": "rows/s",
           "vs_baseline": None,
           "detail": {"trace_rows": n, "lde_rows": N, "width": width,
                      "blowup": blowup, "steady_s": round(steady, 3),
                      "compile_s": round(compile_s, 1),
                      "device": str(dev)}})


def main() -> None:
    argv = sys.argv[1:]
    cpu = "--cpu" in argv
    small = "--small" in argv or cpu
    workload = "fib" if "--workload=fib" in argv or \
        ("--workload" in argv and "fib" in argv) else "rollup"
    if "--lde-commit" in argv:
        if cpu:
            import jax
            jax.config.update("jax_platforms", "cpu")
        run_lde_commit(small, cpu)
        return

    weak = ["--rows", "8192", "--queries", "8", "--blowup", "8",
            "--grind", "0", "--security-bits", "0", "--once"]
    full = ["--workload", workload]
    guaranteed = None

    # Phase 1 — guaranteed number FIRST (CPU backend, weakened rollup):
    # its JSON line goes out immediately so the round records a value
    # even if the driver's outer budget kills us later.
    tmo = min(CPU_GUARANTEE_TIMEOUT_S, _remaining() * 0.55)
    _note(f"phase 1: CPU guarantee run (budget {tmo:.0f}s)")
    # ZKL_DEVICE="" pins the numpy host prover: the jit-staged path's
    # cold CPU compiles alone exceed 20 min at this shape, while the
    # host path finishes the whole weakened e2e in ~8 min (measured).
    res, info = _run_bench_e2e(weak + ["--workload", workload],
                               {"ZKL_FORCE_CPU": "1", "ZKL_DEVICE": ""},
                               tmo)
    if res is not None:
        res.setdefault("detail", {})
        res["detail"]["device"] = "cpu-fallback (weakened cfg; NOT the " \
            "TPU north star)"
        _emit(res)
        guaranteed = res
    else:
        _note(f"phase 1 produced no value: {info}")

    if cpu or small:
        if guaranteed is None:
            _emit({"metric": "proved_rows_per_sec_2e16_e2e",
                   "value": None, "unit": "rows/s", "vs_baseline": None,
                   "error": "weakened CPU e2e failed", "detail": info})
        return

    # Phase 2 — the real thing: full-config rollup on the tunneled TPU.
    if not probe_backend():
        if guaranteed is None:
            _emit({"metric": "proved_rows_per_sec_2e16_e2e",
                   "value": None, "unit": "rows/s", "vs_baseline": None,
                   "error": "TPU backend unavailable and CPU guarantee "
                            "run failed", "detail": info})
        return
    # Attempt 1 = full kernel config; attempt 2 degrades the compile
    # surface (no Pallas Poseidon, no MXU NTT) — the r3 failure was the
    # tunnel's remote-compile helper crashing on the same graphs every
    # retry, so an identical second attempt is wasted budget.
    # attempt 2 also disables the wave-assembly overlap (two waves of
    # device arrays resident) in case attempt 1 died on HBM pressure
    attempt_envs = [{}, {"ZKL_NO_PALLAS_POSEIDON": "1",
                         "ZKL_NO_MXU_NTT": "1",
                         "ZKL_WAVE_OVERLAP": "0"}]
    for i, extra_env in enumerate(attempt_envs):
        if _remaining() < 300:
            break
        _note(f"phase 2: TPU e2e attempt {i + 1} env={extra_env} "
              f"(budget {_remaining():.0f}s)")
        res, info = _run_bench_e2e(full, extra_env, _remaining() - 30)
        if res is not None:
            res.setdefault("detail", {})
            res["detail"].setdefault("device", "tpu")
            if extra_env:
                res["detail"]["degraded_kernels"] = list(extra_env)
            _emit(res)   # last line on stdout -> the headline
            return
        _note(f"TPU e2e attempt failed: {json.dumps(info)[:400]}")
    _note("TPU e2e did not produce a value; CPU guarantee line stands")
    if guaranteed is None:
        _emit({"metric": "proved_rows_per_sec_2e16_e2e",
               "value": None, "unit": "rows/s", "vs_baseline": None,
               "error": "no e2e value from TPU or CPU", "detail": info})


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        _emit({"metric": "proved_rows_per_sec_2e16_e2e", "value": None,
               "unit": "rows/s", "vs_baseline": None,
               "error": f"{type(e).__name__}: {e}"})
    sys.exit(0)
