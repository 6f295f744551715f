#!/usr/bin/env python
"""Benchmark: the north-star metric — end-to-end proved rows/s on one chip.

Default mode proves a full 2^16-row trace at the reference rollup-bench
config (BASELINE.md: queries=64, blowup=16, grind=16) with the jit-staged
device prover — 16 segments + STARK-in-STARK aggregation — and reports
proved trace rows/s. The headline value is the STEADY-STATE round (all
executables warm, the throughput of a long-running prover); the cold
round including per-process first-execution compiles is in `detail`.

Robustness contract (the driver records this output as BENCH_r{N}.json):
ALWAYS prints exactly ONE JSON line on stdout and exits 0 —
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": N, ...}
on success, or the same shape with "value": null plus an "error" field
carrying a structured diagnosis when the tunneled TPU backend is
unavailable or the run times out. The flaky axon backend is probed in a
THROWAWAY SUBPROCESS with bounded retries before the real bench starts,
so a failed init can never poison or hang the measuring process.

Modes: default = e2e north star; --small = weakened params (CI smoke);
--cpu = force CPU backend; --lde-commit = legacy kernel-level metric.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# Bounded-retry policy for the axon tunnel: each probe subprocess gets
# PROBE_TIMEOUT_S; after a failure we wait RETRY_WAIT_S and try again.
PROBE_ATTEMPTS = 3
PROBE_TIMEOUT_S = 660      # cold tunnel contact measured up to ~9.5 min
RETRY_WAIT_S = 90
BENCH_TIMEOUT_S = 3000     # hard budget for the full e2e run (cold+steady)
E2E_RETRY_MIN_S = 900      # only retry a failed e2e if this much budget remains
_E2E_DEADLINE = None       # set on first run_e2e call; shared by retries

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


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _fail(metric: str, error: str, detail: dict,
          try_cpu_fallback: bool = False) -> None:
    if try_cpu_fallback:
        detail = dict(detail)
        detail["cpu_fallback"] = _cpu_fallback_result()
    _emit({"metric": metric, "value": None, "unit": "rows/s",
           "vs_baseline": None, "error": error, "detail": detail})
    sys.exit(0)


CPU_FALLBACK_TIMEOUT_S = 2000


def _cpu_fallback_result() -> dict:
    """When the TPU backend is unreachable, still produce a measured
    number: the weakened-config e2e on the CPU backend, clearly
    labeled.  Proves the prove+aggregate pipeline end to end even when
    the tunneled chip is down."""
    cmd = [sys.executable, os.path.join(HERE, "scripts", "bench_e2e.py"),
           "--rows", "8192", "--queries", "8", "--blowup", "8",
           "--grind", "0", "--security-bits", "0"]
    env = dict(os.environ)
    env["ZKL_FORCE_CPU"] = "1"
    env.setdefault("ZKL_DEVICE", "jax")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=CPU_FALLBACK_TIMEOUT_S, env=env)
    except subprocess.TimeoutExpired:
        return {"error": f"cpu fallback exceeded "
                         f"{CPU_FALLBACK_TIMEOUT_S}s"}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                res = json.loads(line)
            except ValueError:
                break
            res["device"] = "cpu-fallback (NOT the TPU north star)"
            return res
    return {"error": f"cpu fallback rc={out.returncode}",
            "stderr_tail": out.stderr[-500:]}


def probe_backend(cpu: bool) -> dict:
    """Probe jax backend init + one transfer in a throwaway subprocess.

    Returns the probe dict on success; on persistent failure emits the
    structured-error JSON line and exits 0 (never raises, never leaves a
    traceback on stdout).
    """
    attempts = []
    env = dict(os.environ)
    if cpu:
        env["ZKL_FORCE_CPU"] = "1"
    src = _PROBE_SRC
    if cpu:
        src = ("import jax\n"
               "jax.config.update('jax_platforms','cpu')\n") + src
    for i in range(PROBE_ATTEMPTS):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", src], capture_output=True,
                text=True, timeout=PROBE_TIMEOUT_S, env=env)
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
            res = json.loads(line)
        except subprocess.TimeoutExpired:
            res = {"ok": False, "error_type": "Timeout",
                   "error": f"backend probe exceeded {PROBE_TIMEOUT_S}s",
                   "init_s": round(time.time() - t0, 1)}
        except Exception as e:  # malformed output etc.
            res = {"ok": False, "error_type": type(e).__name__,
                   "error": str(e)[:400]}
        attempts.append(res)
        if res.get("ok"):
            return res
        if i + 1 < PROBE_ATTEMPTS:
            print(f"# probe attempt {i + 1} failed "
                  f"({res.get('error_type')}); retrying in {RETRY_WAIT_S}s",
                  file=sys.stderr, flush=True)
            time.sleep(RETRY_WAIT_S)
    _fail("proved_rows_per_sec_2e16_e2e",
          "TPU backend unavailable after bounded retries "
          f"({PROBE_ATTEMPTS} attempts x {PROBE_TIMEOUT_S}s): "
          f"{attempts[-1].get('error_type')}: {attempts[-1].get('error')}",
          {"probe_attempts": attempts}, try_cpu_fallback=not cpu)


def run_e2e(small: bool, cpu: bool, extra: list,
            attempts: int = 2) -> None:
    """Run scripts/bench_e2e.py in a subprocess under a hard time budget.

    bench_e2e prints its own single JSON line (steady-state headline);
    we pass it through verbatim. Device-side crashes (the tunneled
    remote-compile service 500s intermittently) get one bounded retry;
    after that the structured-error line carries a measured CPU-fallback
    number so the round still records throughput data.
    """
    cmd = [sys.executable, os.path.join(HERE, "scripts", "bench_e2e.py")]
    if small:
        cmd += ["--rows", "8192", "--queries", "8", "--blowup", "8",
                "--grind", "0", "--security-bits", "0"]
    cmd += extra
    env = dict(os.environ)
    env.setdefault("ZKL_DEVICE", "jax")
    if cpu:
        env["ZKL_FORCE_CPU"] = "1"
    # ONE overall deadline shared by every attempt: the driver enforces
    # an outer budget, so a retry must consume remaining time, not
    # stack a second full budget on top.
    global _E2E_DEADLINE
    if _E2E_DEADLINE is None:
        _E2E_DEADLINE = time.time() + BENCH_TIMEOUT_S
    remaining = max(60.0, _E2E_DEADLINE - time.time())
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=remaining, env=env)
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout or b"")
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
        # salvage the cold-round result if the steady round blew the
        # budget: bench_e2e emits "INTERIM {json}" after the cold round
        interim = None
        for line in stdout.splitlines():
            if line.startswith("INTERIM {"):
                try:
                    interim = json.loads(line[len("INTERIM "):])
                except ValueError:
                    pass
        if interim is not None:
            interim.setdefault("detail", {})["budget_note"] = (
                f"steady round exceeded {BENCH_TIMEOUT_S}s budget; "
                "value is the cold round")
            _emit(interim)
            sys.exit(0)
        _fail("proved_rows_per_sec_2e16_e2e",
              f"e2e bench exceeded {BENCH_TIMEOUT_S}s budget",
              {"elapsed_s": round(time.time() - t0, 1),
               "partial_output": stdout[-2000:]})
        return
    # progress lines go to stderr so stdout is exactly one JSON line
    err_line = None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                res = json.loads(line)
            except ValueError:
                res = None
            if res is not None and res.get("value") is not None:
                print(line, flush=True)
                sys.exit(0)
            # a structured-error line from bench_e2e (device crash
            # mid-run): fall through to retry / CPU fallback
            err_line = res if res is not None else {"raw": line}
            print("# e2e error: "
                  + str((err_line.get("error") or line))[:300],
                  file=sys.stderr, flush=True)
        elif line:
            print("# " + line, file=sys.stderr, flush=True)
    can_retry = (attempts > 1
                 and _E2E_DEADLINE - time.time() > E2E_RETRY_MIN_S)
    if err_line is not None and not can_retry:
        err_line.setdefault("detail", {})
        if not cpu:
            err_line["detail"]["cpu_fallback"] = _cpu_fallback_result()
        _emit(err_line)
        sys.exit(0)
    if can_retry:
        # tunneled-TPU compile service crashes are transient; one retry
        # within the shared deadline
        print(f"# e2e attempt failed rc={out.returncode}; retrying",
              file=sys.stderr, flush=True)
        time.sleep(RETRY_WAIT_S)
        return run_e2e(small, cpu, extra, attempts - 1)
    _fail("proved_rows_per_sec_2e16_e2e",
          f"e2e bench exited rc={out.returncode} without a JSON result",
          {"elapsed_s": round(time.time() - t0, 1),
           "stdout_tail": out.stdout[-1000:],
           "stderr_tail": out.stderr[-2000:]},
          try_cpu_fallback=not cpu)


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
           "vs_baseline": 1.0,
           "detail": {"trace_rows": n, "lde_rows": N, "width": width,
                      "blowup": blowup, "steady_s": round(steady, 3),
                      "compile_s": round(compile_s, 1),
                      "device": str(dev)}})


if __name__ == "__main__":
    argv = sys.argv[1:]
    cpu = "--cpu" in argv
    small = "--small" in argv or cpu
    extra = [a for a in argv
             if a not in ("--cpu", "--small", "--lde-commit")]
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if "--lde-commit" in argv:
        run_lde_commit(small, cpu)
    else:
        probe = probe_backend(cpu)
        print(f"# backend ok: {probe.get('device')} "
              f"(init {probe.get('init_s')}s)", file=sys.stderr, flush=True)
        run_e2e(small, cpu, extra)
