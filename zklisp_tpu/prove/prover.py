"""Prover/verifier orchestration (src/prove.rs prove_program et al.).

prove_program: plan segments -> build the full trace once -> per segment:
derive the segment-local layout + feature mask, slice the trace, compute
boundary state, prove with the STARK core, wrap into a zl1 StepProof.

verify_proof: the "slow path" that rebuilds the trace to derive boundary
public inputs, then verifies the inner STARK (prove.rs:802-941).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as _np

from ..air.airpi import (SegmentBoundaries, build_air_pi_for_trace,
                         compute_vm_usage_mask,
                         segment_boundaries_from_full)
from ..air.zk_air import AirPublicInputs, ZkLispAir
from ..compiler.builder import Program
from ..core import pi as pi_mod
from ..field import f128
from ..trace import build as tb
from ..trace.layout import Columns, LayoutConfig, STEPS_PER_LEVEL_P2
from . import planner, stark
from .formats import StepMeta, StepProof, Zl1Proof
from .params import (ProofOptions, ProverOptions,
                     estimate_conjectured_security_bits,
                     select_partitions_for_trace)


class ProveError(Exception):
    pass


class MerkleRootMismatch(ProveError):
    """The trace's computed merkle-verify root chain does not match
    PublicInputs.merkle_root — the proof could never verify."""


def check_merkle_root_binding(full_trace,
                              pub_inputs: pi_mod.PublicInputs) -> None:
    """Fail fast on a wrong merkle root BEFORE proving.

    The AIR binds every merkle_last accumulator to the PI root
    (vm/air/merkle.rs root assertion); the reference only discovers a
    mismatch at verify time ("OOD constraint composition mismatch"),
    after a full proving run.  The trace builder already computed every
    chain root host-side (trace.merkle_roots), so compare here and
    raise a named error in seconds.  Streamed traces skip the check
    (their slotted sinks carry no ledger).  Opt out:
    ZKL_MERKLE_ROOT_CHECK=0 (used by adversarial tests that need the
    doomed artifact)."""
    if not (pub_inputs.feature_mask & pi_mod.FM_MERKLE):
        return
    if os.environ.get("ZKL_MERKLE_ROOT_CHECK", "") == "0":
        return
    roots = getattr(full_trace, "merkle_roots", None)
    if not roots:
        return
    expected = f128.be_from_le8(pub_inputs.merkle_root)
    for i, root in enumerate(roots):
        if root != expected:
            raise MerkleRootMismatch(
                f"merkle-verify chain {i} computes root {root:#034x} "
                f"but PublicInputs.merkle_root decodes to "
                f"{expected:#034x}; a proof built now could never "
                f"verify — fix the root passed to with_merkle_root / "
                f"--merkle-root (crypto.poseidon.merkle_root_from_path "
                f"computes it from the path)")


def _xp():
    """Array namespace for the device compute path.

    ZKL_DEVICE=eager routes the limb math through jax.numpy op-by-op;
    default numpy (host).  ZKL_DEVICE=jax selects the jit-staged device
    prover (stark_device.prove_trace_device) instead — see _device_mode.
    """
    if os.environ.get("ZKL_DEVICE", "").lower() == "eager":
        import jax.numpy as jnp
        return jnp
    return _np


def _device_mode() -> bool:
    """True when segments should be proved with the jit-staged prover
    (compiled once per segment shape; proofs byte-identical to host)."""
    on = os.environ.get("ZKL_DEVICE", "").lower() in ("jax", "tpu")
    if on:
        from ..utils import jitcache
        jitcache.enable()
    return on


def prove_program(program: Program, pub_inputs: pi_mod.PublicInputs,
                  opts: ProverOptions,
                  on_steps=None) -> List[StepProof]:
    # on_steps: optional hook called with each batch of finished
    # StepProofs as soon as it is assembled (aggregation pipelining —
    # agg.prove_chain prefetches child FS replay behind later waves).
    # ZKL_MESH=1: shard segments across all visible devices (waves of
    # structurally-identical segments, every stage one vmapped dispatch
    # — parallel/mesh_prover.py).  Proofs byte-identical to this path.
    mesh_env = os.environ.get("ZKL_MESH", "")
    if mesh_env not in ("", "0"):
        import jax
        if len(jax.devices()) > 1:
            from ..parallel.mesh_prover import prove_program_mesh
            return prove_program_mesh(program, pub_inputs, opts,
                                      on_steps=on_steps)
    base_opts = opts.to_proof_options()
    segments = planner.plan_segments(program, pub_inputs, opts)
    if not segments:
        raise ProveError("segment planner returned no segments")

    # Streamed trace source for long traces: only one segment of rows
    # is ever resident (ZKL_STREAM_TRACE=1 forces it on, =0 off;
    # default: traces >= 2^19 rows).  The reference builds the full
    # trace unconditionally (prove.rs:995-999).
    n_rows_total = max(s.r_end for s in segments)
    stream_env = os.environ.get("ZKL_STREAM_TRACE", "")
    stream_mode = (stream_env not in ("", "0")
                   or (not stream_env and n_rows_total >= (1 << 19)))

    # Device default for multi-segment programs: WAVE proving — every
    # prover stage one vmapped dispatch covering several segments
    # (parallel/mesh_prover.py with a single-device "mesh").  Divides
    # the per-stage dispatch count by the wave width, which is what a
    # high-latency tunneled chip is bound by.  Proofs byte-identical to
    # the serial path (asserted in tests).  Opt out: ZKL_WAVE=0.
    if (not stream_mode and len(segments) > 1 and _device_mode()
            and os.environ.get("ZKL_WAVE", "") != "0"):
        from ..parallel.mesh_prover import prove_program_mesh
        return prove_program_mesh(program, pub_inputs, opts,
                                  on_steps=on_steps)
    if stream_mode:
        from ..trace.stream import StreamedTrace
        full_trace = StreamedTrace(program, pub_inputs, segments)
    else:
        full_trace = tb.build_trace(program, pub_inputs)
        check_merkle_root_binding(full_trace, pub_inputs)
    suite_id = pub_inputs.program_id
    rom_acc = (tb.rom_acc_from_program(program)
               if any(pub_inputs.program_id) else (0, 0, 0))

    max_parallel = max(opts.max_concurrent_segments or 1, 1)
    n_seg = len(segments)

    if max_parallel == 1 or n_seg == 1:
        # Device mode: enqueue segment trace uploads ahead of compute.
        # jax.device_put is async, so the (slow, tunneled) host->device
        # transfers overlap the per-segment device compute instead of
        # sitting inside each segment's LDE stage.  Full-trace mode
        # prefetches everything up front (slices are cheap); streamed
        # mode double-buffers one segment ahead so only two windows are
        # ever resident.
        dev16s = [None] * n_seg
        windows = [None] * n_seg
        prefetch = None
        if _device_mode():
            import jax
            if stream_mode:
                prefetch = ThreadPoolExecutor(max_workers=1)

                def _prep(seg):
                    _, seg_layout = _segment_layout(program, pub_inputs,
                                                    seg)
                    window = full_trace.segment_table(seg)
                    seg_t = window.slice_rows(0, window.length,
                                              seg_layout.seg_to_full)
                    return window, jax.device_put(seg_t.to_limbs16())
            else:
                for i, seg in enumerate(segments):
                    dev16s[i] = jax.device_put(
                        segment_limbs16(full_trace, program, pub_inputs,
                                        seg))
        steps = []
        prev_state: Optional[tb.PrevState] = None
        fut = (prefetch.submit(_prep, segments[0])
               if prefetch is not None else None)
        for i, seg in enumerate(segments):
            if fut is not None:
                windows[i], dev16s[i] = fut.result()
                fut = (prefetch.submit(_prep, segments[i + 1])
                       if i + 1 < n_seg else None)
            step, state_out = prove_segment(
                suite_id, rom_acc, i, n_seg, seg, full_trace, program,
                pub_inputs, base_opts, opts.min_security_bits, prev_state,
                dev16=dev16s[i], window=windows[i])
            steps.append(step)
            windows[i] = dev16s[i] = None
            prev_state = tb.PrevState(state_out)
            if on_steps is not None:
                on_steps([step])
        if prefetch is not None:
            prefetch.shutdown(wait=False)
        return steps

    # Parallel segment proving (the reference's bounded rayon pool,
    # prove.rs:1017-1051; prev_state chaining is not checked in parallel
    # mode, matching the reference).
    if _device_mode():
        # Device path: THREADS, not forks — XLA dispatch releases the
        # GIL, so in-flight segments keep the chip busy through each
        # other's host-side phases, and forked children would each pay
        # the per-process first-dispatch device compiles.  Segment 0
        # runs alone first to warm every stage executable (two threads
        # tracing the same jit would compile it twice).
        steps = [None] * n_seg

        def _run(i: int) -> None:
            step, _ = prove_segment(
                suite_id, rom_acc, i, n_seg, segments[i], full_trace,
                program, pub_inputs, base_opts, opts.min_security_bits,
                None)
            steps[i] = step
            if on_steps is not None:
                on_steps([step])

        _run(0)
        if n_seg > 1:
            with ThreadPoolExecutor(max_workers=max_parallel) as ex:
                list(ex.map(_run, range(1, n_seg)))
        return steps

    # Host path: fork a process pool AFTER building the full trace
    # (Python threads would serialize on the GIL): children inherit the
    # trace copy-on-write and only receive the segment index; results
    # come back as serialized step proofs.
    import multiprocessing as mp
    global _FORK_STATE
    _FORK_STATE = (suite_id, rom_acc, n_seg, segments, full_trace,
                   program, pub_inputs, base_opts, opts.min_security_bits)
    ctx = mp.get_context("fork")
    with ctx.Pool(processes=max_parallel) as pool:
        blobs = pool.map(_prove_segment_forked, range(n_seg))
    from .formats import StepProof as _SP
    return [_SP.from_bytes(b) for b in blobs]


_FORK_STATE = None


def _prove_segment_forked(i: int) -> bytes:
    (suite_id, rom_acc, n_seg, segments, full_trace, program,
     pub_inputs, base_opts, min_bits) = _FORK_STATE
    step, _ = prove_segment(suite_id, rom_acc, i, n_seg, segments[i],
                            full_trace, program, pub_inputs, base_opts,
                            min_bits, None)
    return step.to_bytes()


def _uniform_segments(in_mesh: bool = False) -> bool:
    """Uniform-segment mode (device/mesh paths, default on): every
    segment keeps the program-wide feature mask and the FULL trace's
    usage mask, so all segments share one AIR structure — one set of
    jit-compiled prover-stage executables and full waves instead of
    one executable set per usage profile (the rollup workload's 16
    segments otherwise split into 4 structure groups / 7 padded
    waves).  The reference's per-segment trimming (prove.rs:1071-1107)
    is a CPU optimization — fewer columns per proof — that inverts on
    a jit-compiled device.  The mesh/wave prover always counts as a
    device path (its tests run on virtual CPU devices without
    ZKL_DEVICE set, and the wave-vs-serial byte-identity contract
    requires both paths to agree).  Opt out: ZKL_UNIFORM_SEGMENTS=0."""
    return ((in_mesh or _device_mode())
            and os.environ.get("ZKL_UNIFORM_SEGMENTS", "") != "0")


def uniform_usage_for(full_trace,
                      in_mesh: bool = False) -> Optional[Tuple[int, int]]:
    """(vm_usage_mask, ram_delta_clk_bits) of the FULL trace, cached on
    the trace object; None when uniform mode is off or the trace does
    not support it (streamed windows scan per segment)."""
    if not _uniform_segments(in_mesh):
        return None
    if getattr(full_trace, "_uniform_usage", None) is None:
        try:
            full_trace._uniform_usage = compute_vm_usage_mask(
                full_trace, Columns.baseline())
        except AttributeError:
            return None
    return full_trace._uniform_usage


def _segment_layout(program: Program, pub_inputs: pi_mod.PublicInputs,
                    seg: tb.Segment, in_mesh: bool = False):
    """Effective feature mask + column layout for one segment.

    Factored out of prove_segment so the device path can slice segment
    limb arrays for upload prefetch before proving starts."""
    lvl_start = seg.r_start // STEPS_PER_LEVEL_P2
    lvl_end = seg.r_end // STEPS_PER_LEVEL_P2
    seg_features = planner.compute_segment_features_for_levels(
        program, lvl_start, lvl_end)

    base_mask = pub_inputs.feature_mask
    seg_mask = planner.compute_segment_feature_mask(pub_inputs,
                                                    seg_features)
    use_seg_mask = (seg_mask != 0 and seg_mask != base_mask
                    and not _uniform_segments(in_mesh))
    eff_mask = seg_mask if use_seg_mask else base_mask
    fmap_vm = bool(eff_mask & pi_mod.FM_VM)
    rom_enabled = any(pub_inputs.program_id)

    layout_cfg = LayoutConfig(
        vm=fmap_vm,
        ram=bool(eff_mask & pi_mod.FM_RAM),
        sponge=bool(eff_mask & pi_mod.FM_SPONGE),
        merkle=bool(eff_mask & pi_mod.FM_MERKLE),
        rom=rom_enabled)
    return eff_mask, tb.SegmentLayout(Columns.baseline(), layout_cfg)


def segment_limbs16(full_trace, program: Program,
                    pub_inputs: pi_mod.PublicInputs,
                    seg: tb.Segment) -> _np.ndarray:
    """(C, n, 8) uint16 limb slice of the full trace for one segment."""
    _, seg_layout = _segment_layout(program, pub_inputs, seg)
    from ..trace.stream import StreamedTrace
    if isinstance(full_trace, StreamedTrace):
        window = full_trace.segment_table(seg)
        seg_t = window.slice_rows(0, window.length,
                                  seg_layout.seg_to_full)
        return seg_t.to_limbs16()
    full16 = full_trace.to_limbs16()
    return _np.ascontiguousarray(
        full16[seg_layout.seg_to_full, seg.r_start:seg.r_end])


def prove_segment(suite_id: bytes, rom_acc: Tuple[int, int, int],
                  segment_index: int, segments_total: int,
                  seg: tb.Segment, full_trace, program: Program,
                  pub_inputs: pi_mod.PublicInputs,
                  base_opts: ProofOptions, min_bits: int,
                  prev_state: Optional[tb.PrevState],
                  dev16=None, window=None) -> Tuple[StepProof, bytes]:
    eff_mask, seg_layout = _segment_layout(program, pub_inputs, seg)
    from ..trace.stream import StreamedTrace
    streaming = isinstance(full_trace, StreamedTrace)

    from ..utils.tracing import phase
    with phase("segment_trace", rows=seg.r_end - seg.r_start):
        if streaming:
            if window is None:
                window = full_trace.segment_table(seg)
            trace, state_in_hash, state_out_hash = \
                tb.segment_from_window(window, seg_layout, prev_state)
        else:
            trace, state_in_hash, state_out_hash = \
                tb.build_segment_trace_with_state(full_trace, seg,
                                                  seg_layout, prev_state)

    with phase("boundaries"):
        boundaries = (full_trace.boundaries(seg) if streaming
                      else segment_boundaries_from_full(full_trace, seg))

    num_partitions, hash_rate = select_partitions_for_trace(
        trace.width, trace.length)
    wf_opts = base_opts.with_partitions(num_partitions, hash_rate)

    with phase("air_pi"):
        air_pi = build_air_pi_for_trace(
            pub_inputs, eff_mask, rom_acc, seg_layout.cols, boundaries,
            trace, usage_override=uniform_usage_for(full_trace))
        pi_len = len(air_pi.to_elements())
        air = ZkLispAir(trace.width, trace.length, air_pi)

    # ZKL_PREFLIGHT env (prove.rs:128-136): run the row-wise constraint
    # check with the exact prover AIR before proving.
    pf_mode = os.environ.get("ZKL_PREFLIGHT", "off").lower()
    if pf_mode in ("console", "json"):
        from ..air.preflight import run_preflight
        violations = run_preflight(air, trace)
        if violations:
            raise ProveError(f"preflight violations: {violations[:3]}")

    meta = StepMeta.from_env(trace.length, wf_opts, min_bits, pi_len)
    if _device_mode():
        from .stark_device import prove_trace_device
        # segment limbs as a numpy slice of the cached full-trace u16
        # array (converting ~1M Python ints per segment costs seconds);
        # dev16, when given, is that slice already device_put (upload
        # prefetched behind the previous segment's compute).
        seg16 = (dev16 if dev16 is not None
                 else (trace.to_limbs16() if streaming
                       else segment_limbs16(full_trace, program,
                                            pub_inputs, seg)))
        inner = prove_trace_device(trace, air, air_pi, wf_opts,
                                   limbs16=seg16)
    else:
        inner = stark.prove_trace(trace, air, air_pi, wf_opts, _xp())

    with phase("step_assembly"):
        boundary = _boundary_dict(boundaries, state_in_hash,
                                  state_out_hash)
        zl1 = Zl1Proof.new_multi_segment(
            suite_id, meta, pub_inputs, segment_index, segments_total,
            boundary, inner)
        step = StepProof(zl1, pub_inputs, rom_acc, air_pi.vm_usage_mask,
                         air_pi.ram_delta_clk_bits)
    return step, state_out_hash


def _boundary_dict(boundaries, state_in_hash, state_out_hash) -> dict:
    return dict(
        pc_init=f128.fe_to_bytes_fold(boundaries.pc_init),
        state_in_hash=state_in_hash,
        state_out_hash=state_out_hash,
        ram_gp_unsorted_in=f128.fe_to_bytes_fold(
            boundaries.ram_gp_unsorted_in),
        ram_gp_unsorted_out=f128.fe_to_bytes_fold(
            boundaries.ram_gp_unsorted_out),
        ram_gp_sorted_in=f128.fe_to_bytes_fold(
            boundaries.ram_gp_sorted_in),
        ram_gp_sorted_out=f128.fe_to_bytes_fold(
            boundaries.ram_gp_sorted_out),
        rom_s_in_0=f128.fe_to_bytes_fold(boundaries.rom_s_in[0]),
        rom_s_in_1=f128.fe_to_bytes_fold(boundaries.rom_s_in[1]),
        rom_s_in_2=f128.fe_to_bytes_fold(boundaries.rom_s_in[2]),
        rom_s_out_0=f128.fe_to_bytes_fold(boundaries.rom_s_out[0]),
        rom_s_out_1=f128.fe_to_bytes_fold(boundaries.rom_s_out[1]),
        rom_s_out_2=f128.fe_to_bytes_fold(boundaries.rom_s_out[2]),
    )


def air_pi_from_step(step: StepProof) -> AirPublicInputs:
    """Rebuild AirPublicInputs from a StepProof (agg/fs.rs:44-65)."""
    zp = step.proof.pi
    return AirPublicInputs(
        core=step.pi_core,
        segment_feature_mask=0,
        rom_acc=tuple(step.rom_acc),
        pc_init=f128.fe_from_bytes_fold(zp.pc_init),
        ram_gp_unsorted_in=f128.fe_from_bytes_fold(zp.ram_gp_unsorted_in),
        ram_gp_unsorted_out=f128.fe_from_bytes_fold(
            zp.ram_gp_unsorted_out),
        ram_gp_sorted_in=f128.fe_from_bytes_fold(zp.ram_gp_sorted_in),
        ram_gp_sorted_out=f128.fe_from_bytes_fold(zp.ram_gp_sorted_out),
        rom_s_in=(f128.fe_from_bytes_fold(zp.rom_s_in_0),
                  f128.fe_from_bytes_fold(zp.rom_s_in_1),
                  f128.fe_from_bytes_fold(zp.rom_s_in_2)),
        rom_s_out=(f128.fe_from_bytes_fold(zp.rom_s_out_0),
                   f128.fe_from_bytes_fold(zp.rom_s_out_1),
                   f128.fe_from_bytes_fold(zp.rom_s_out_2)),
        vm_usage_mask=step.vm_usage_mask,
        ram_delta_clk_bits=step.ram_delta_clk_bits,
    )


def verify_step(step: StepProof, min_bits: int = 0) -> None:
    """Verify a single step proof against its recorded public inputs.

    Note: unlike the trusted-setup-free slow path (verify_proof), this
    trusts the boundary state recorded in the zl1 container; chain-level
    checks (verify_chain / aggregation) bind the boundaries together.
    """
    eff_mask = _effective_mask_for_step(step)
    air_pi = air_pi_from_step(step)
    air_pi.segment_feature_mask = eff_mask
    stark.verify_trace(step.proof.inner, air_pi, min_bits)


def _effective_mask_for_step(step: StepProof) -> int:
    """Reconstruct the effective feature mask the prover used.

    RAM/Merkle/ROM trims are width-visible (their column blocks are
    dropped); sponge presence is recovered from the recorded
    vm_usage_mask (VM_USAGE_SPONGE tracks op_sponge occurrence, the same
    predicate the planner uses); Poseidon follows sponge|merkle.
    """
    from ..trace.layout import VM_USAGE_SPONGE
    width = step.proof.inner.context.trace_width
    baseline = Columns.baseline().width()
    base = step.pi_core.feature_mask
    if width >= baseline:
        return base
    rom_enabled = any(step.pi_core.program_id)
    found = None
    for ram in (True, False):
        for merkle in (True, False):
            cfg = LayoutConfig(vm=True, ram=ram, sponge=True,
                               merkle=merkle, rom=rom_enabled)
            if Columns(cfg).width() == width:
                found = (ram, merkle)
                break
        if found:
            break
    if found is None:
        raise stark.VerifyError("cannot derive segment layout from width")
    ram, merkle = found
    sponge = (bool(base & pi_mod.FM_SPONGE)
              and bool(step.vm_usage_mask & (1 << VM_USAGE_SPONGE)))
    mask = pi_mod.FM_VM | (base & pi_mod.FM_VM_EXPECT)
    if ram and (base & pi_mod.FM_RAM):
        mask |= pi_mod.FM_RAM
    if sponge:
        mask |= pi_mod.FM_SPONGE
    if merkle and (base & pi_mod.FM_MERKLE):
        mask |= pi_mod.FM_MERKLE
    if (sponge or (merkle and (base & pi_mod.FM_MERKLE))) \
            and (base & pi_mod.FM_POSEIDON):
        mask |= pi_mod.FM_POSEIDON
    return mask


def verify_proof(inner: stark.StarkProof, program: Program,
                 pi: pi_mod.PublicInputs, min_bits: int = 0) -> None:
    """Slow-path verification: rebuild the trace to derive boundary PI
    (prove.rs verify_proof)."""
    pi.validate_flags()
    rom_acc = (tb.rom_acc_from_program(program) if any(pi.program_commitment)
               else (0, 0, 0))
    trace = tb.build_trace(program, pi)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc, None,
                                    None, trace)
    stark.verify_trace(inner, air_pi, min_bits)
