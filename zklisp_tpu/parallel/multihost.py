"""Multi-HOST (multi-process) proving over jax.distributed.

BASELINE.md's north star names "1 chip, 1 host, and N>=2 hosts (target
>=8x rows/s scaling 1->8 hosts)"; SURVEY §7.1 step 9 calls for N-host
segment distribution over DCN.  The reference has no distribution at
all — its parallel mode is a single-process rayon pool over segments
(prove.rs:1018-1051) whose segments are proved independently (no
prev_state chaining).  That independence IS the multi-host story:

- `init_multihost` brings up the JAX distributed runtime
  (coordinator + process_id/num_processes, args or env), after which
  `jax.devices()` is the global chip set and `jax.local_devices()`
  this host's slice.
- `prove_program_multihost` plans segments once (deterministic on
  every process), assigns waves of segments round-robin by
  process_index, proves the local share with the existing wave/mesh
  prover on the LOCAL device mesh (no cross-host traffic during
  proving — each wave's collectives ride ICI only), then exchanges the
  serialized StepProofs with one padded-uint8 `process_allgather`
  (the cross-host hop; rides DCN).  Every process returns the full,
  segment-ordered step list, byte-identical to the single-process
  prover's output (asserted by the dryrun + tests/test_multihost.py).
- Aggregation after the gather is host-side and deterministic, so it
  can run redundantly everywhere or only on process 0 — the CLI story
  is "process 0 writes the artifact".

The trace is built redundantly per process (host compute, seconds)
instead of broadcast: witness bytes never cross hosts, only proof
bytes do — the same artifact-boundary seam the reference's formats
define (proof/step.rs ZKLSTP1).

Validated without a cluster by `dryrun_multihost` (__graft_entry__):
N CPU subprocesses, each with M virtual devices, gather byte-compared
against the single-process path.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as _np

from ..compiler.builder import Program
from ..core import pi as pi_mod
from ..prove import planner
from ..prove.formats import StepProof
from ..prove.params import ProverOptions


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize from args or ZKL_COORD / ZKL_NPROCS /
    ZKL_PROC_ID env (falling back to JAX's own auto-detection, which
    covers real TPU pods where the runtime knows its topology)."""
    import jax

    coordinator = coordinator or os.environ.get("ZKL_COORD")
    if num_processes is None and os.environ.get("ZKL_NPROCS"):
        num_processes = int(os.environ["ZKL_NPROCS"])
    if process_id is None and os.environ.get("ZKL_PROC_ID"):
        process_id = int(os.environ["ZKL_PROC_ID"])
    if coordinator is None:
        jax.distributed.initialize()        # TPU-pod auto-detection
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def _local_mesh():
    import jax
    from jax.sharding import Mesh
    return Mesh(_np.array(jax.local_devices()), axis_names=("seg",))


def _allgather_bytes(blobs: List[Optional[bytes]]) -> List[bytes]:
    """Exchange per-slot byte strings across processes.

    `blobs` has one slot per segment; each process fills only the slots
    it owns (None elsewhere).  Two process_allgathers: int lengths
    (also validates single ownership), then one padded uint8 matrix.
    Returns the fully populated slot list (identical on every
    process)."""
    from jax.experimental import multihost_utils as mh

    n = len(blobs)
    lens = _np.asarray([len(b) if b is not None else -1 for b in blobs],
                       dtype=_np.int64)
    all_lens = _np.asarray(mh.process_allgather(lens))    # (nproc, n)
    owners = (all_lens >= 0).sum(axis=0)
    if not (owners == 1).all():
        bad = [i for i in range(n) if owners[i] != 1]
        raise RuntimeError(f"segment ownership not exclusive: {bad}")
    maxlen = int(all_lens.max())
    mat = _np.zeros((n, max(maxlen, 1)), dtype=_np.uint8)
    for i, b in enumerate(blobs):
        if b is not None:
            mat[i, :len(b)] = _np.frombuffer(b, dtype=_np.uint8)
    all_mat = _np.asarray(mh.process_allgather(mat))   # (nproc, n, L)
    out: List[bytes] = []
    for i in range(n):
        p = int(_np.argmax(all_lens[:, i] >= 0))
        out.append(all_mat[p, i, :int(all_lens[p, i])].tobytes())
    return out


def prove_program_multihost(program: Program,
                            pub_inputs: pi_mod.PublicInputs,
                            opts: ProverOptions,
                            wave: int = 0) -> List[StepProof]:
    """prove_program across all processes of the distributed runtime.

    Each process proves the segment waves assigned to it on its LOCAL
    device mesh and the StepProofs are allgathered; returns the full
    segment-ordered list on every process, byte-identical to the
    single-process prover."""
    import jax

    from .mesh_prover import prove_program_mesh

    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc == 1:
        return prove_program_mesh(program, pub_inputs, opts,
                                  mesh=_local_mesh(), wave=wave)

    segments = planner.plan_segments(program, pub_inputs, opts)
    n_seg = len(segments)

    # Contiguous blocks (not strided): keeps each host's share in as
    # few structure groups as possible under per-segment feature
    # trimming, and matches the boundary-chain order should a chained
    # mode ever span hosts.
    base, rem = divmod(n_seg, nproc)
    counts = [base + (1 if p < rem else 0) for p in range(nproc)]
    starts = [sum(counts[:p]) for p in range(nproc)]
    lo, hi = starts[pid], starts[pid] + counts[pid]

    local_steps: List[Optional[StepProof]] = [None] * n_seg
    if hi > lo:
        # prove only the local share: segment_subset restricts the wave
        # prover's work; indices/segments_total stay GLOBAL so the zl1
        # containers match the single-process output byte-for-byte
        steps = prove_program_mesh(program, pub_inputs, opts,
                                   mesh=_local_mesh(), wave=wave,
                                   segment_subset=range(lo, hi))
        for i, s in zip(range(lo, hi), steps):
            local_steps[i] = s

    blobs = [s.to_bytes() if s is not None else None
             for s in local_steps]
    gathered = _allgather_bytes(blobs)
    return [StepProof.from_bytes(b) for b in gathered]


def dryrun_config():
    """The multi-segment toy config shared by dryrun_multichip,
    dryrun_multihost's workers, and the parent's single-process
    reference run (all three must prove the SAME program with the SAME
    options for the byte-compare to mean anything)."""
    from ..compiler import compile_entry
    from ..core.pi import PublicInputsBuilder, VmArg

    src = ("(def (main a b)\n"
           "  (loop :max 3 ((i 0) (x a) (y b))\n"
           "    x\n"
           "    (recur (+ i 1) y (+ x y))))\n")
    prog = compile_entry(src, [1, 1])
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(1), VmArg.u64(1)])
          .build())
    opts = ProverOptions(queries=2, blowup=8, grind=0,
                        min_security_bits=0, max_segment_rows=64)
    return prog, pi, opts


def encode_steps(steps: List[StepProof]) -> bytes:
    import struct
    out = bytearray(struct.pack("<I", len(steps)))
    for s in steps:
        b = s.to_bytes()
        out += struct.pack("<Q", len(b))
        out += b
    return bytes(out)


def decode_steps(data: bytes) -> List[bytes]:
    import struct
    n, = struct.unpack_from("<I", data, 0)
    off = 4
    out = []
    for _ in range(n):
        ln, = struct.unpack_from("<Q", data, off)
        off += 8
        out.append(data[off:off + ln])
        off += ln
    return out


def _worker_main(argv: Optional[List[str]] = None) -> None:
    """Dryrun worker process: join the distributed runtime on virtual
    CPU devices, prove the shared toy config multi-host, and (process 0)
    write the gathered steps to --out."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax
    if "xla_force_host_platform_device_count" in \
            os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    init_multihost(args.coord, args.nprocs, args.proc_id)

    prog, pi, opts = dryrun_config()
    # wave = local device count: keeps the wave shapes identical across
    # workers AND the parent's reference run (shared jitcache entries)
    steps = prove_program_multihost(prog, pi, opts,
                                    wave=len(jax.local_devices()))
    if jax.process_index() == 0:
        tmp = args.out + ".tmp"
        with open(tmp, "wb") as f:
            f.write(encode_steps(steps))
        os.replace(tmp, args.out)


def prove_chain_multihost(program, pub_inputs, opts: ProverOptions):
    """Multi-host prove_chain: distributed step proving, then
    aggregation from the gathered steps (deterministic, computed
    redundantly on every process — the artifact is identical
    everywhere; callers typically persist it on process 0 only)."""
    from ..agg import aggregate as agg

    steps = prove_program_multihost(program, pub_inputs, opts)
    agg_pi = agg.build_agg_public(steps)
    agg_pi.pi_digest = pub_inputs.digest()
    proof, digest = agg.recursion_prove(steps, agg_pi, opts)
    return proof, digest, agg_pi


def run_dryrun_multihost(n_procs: int = 2, devices_per_proc: int = 4,
                         timeout_s: Optional[float] = None) -> None:
    """Launch n_procs CPU worker subprocesses, each with
    devices_per_proc virtual devices, prove the shared toy config
    through the full multi-host path, and byte-compare the gathered
    StepProofs against THIS process's single-process mesh prover.

    This is the no-cluster validation of the DCN story (VERDICT r4
    missing #2): real processes, real jax.distributed runtime (Gloo
    collectives), real allgather of proof bytes."""
    import socket
    import subprocess
    import sys
    import tempfile
    import time

    if timeout_s is None:
        # cold wave-executable compiles in N concurrent workers on few
        # CPUs dominate; warm jitcache runs finish in ~a minute
        timeout_s = float(os.environ.get("ZKL_MH_DRYRUN_TIMEOUT",
                                         "2400"))

    # pick a coordinator port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " "
                        f"--xla_force_host_platform_device_count="
                        f"{devices_per_proc}").strip()
    # weakened FS hasher (the reference's own ZKL_POSEIDON_HASHER_ROUNDS
    # knob) + radix-2 NTT: the dryrun budget is CPU compile time; the
    # parent reference run below uses the SAME env
    env.setdefault("ZKL_POSEIDON_HASHER_ROUNDS", "4")
    env.setdefault("ZKL_NO_MXU_NTT", "1")

    out_path = tempfile.mktemp(prefix="zkl_mh_steps_")
    procs = []
    try:
        for p in range(n_procs):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "zklisp_tpu.parallel.multihost",
                 "--coord", coord, "--nprocs", str(n_procs),
                 "--proc-id", str(p), "--out", out_path],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))

        deadline = time.time() + timeout_s
        for p_, proc in enumerate(procs):
            try:
                _, err = proc.communicate(
                    timeout=max(10, deadline - time.time()))
            except subprocess.TimeoutExpired:
                raise RuntimeError(
                    f"multihost worker {p_} timed out after "
                    f"{timeout_s:.0f}s")
            if proc.returncode != 0:
                raise RuntimeError(
                    f"multihost worker {p_} rc={proc.returncode}: "
                    f"{err[-2000:]}")
        with open(out_path, "rb") as f:
            gathered = decode_steps(f.read())
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
        if os.path.exists(out_path):
            os.unlink(out_path)

    # single-process reference under the same weakened env.  Use a mesh
    # of the WORKERS' local size so the reference run hits the same
    # persistent-jitcache executables the workers just compiled (the
    # cross-mesh-shape byte-identity is separately pinned by
    # tests/test_mesh_prover.py).
    os.environ.setdefault("ZKL_POSEIDON_HASHER_ROUNDS", "4")
    os.environ.setdefault("ZKL_NO_MXU_NTT", "1")
    import jax

    from .mesh_prover import default_mesh, prove_program_mesh
    prog, pi, opts = dryrun_config()
    n_dev = min(devices_per_proc, len(jax.devices()))
    ref = prove_program_mesh(prog, pi, opts, mesh=default_mesh(n_dev),
                             wave=n_dev)
    assert len(ref) == len(gathered) >= 2, \
        (len(ref), len(gathered))
    for i, (r, g) in enumerate(zip(ref, gathered)):
        assert r.to_bytes() == g, \
            f"multihost step {i} differs from single-process bytes"


if __name__ == "__main__":
    _worker_main()
