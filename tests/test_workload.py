"""Workload-scale tests: the reference's rollup_bench_ram.rs /
rollup_bench_recursion.rs tier, on this framework's ledger-settle
workload (RAM + safe-arith gadgets + sponge digest chain) AND on the
reference's own rollup-bench.zlisp source (read from /root/reference at
test time, never vendored)."""

import os

import pytest

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.preflight import run_preflight
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import compile_entry, compile_str
from zklisp_tpu.core.pi import PublicInputsBuilder, VmArg
from zklisp_tpu.trace import build as tb
from zklisp_tpu.trace.layout import Columns

HERE = os.path.dirname(os.path.abspath(__file__))
LEDGER = os.path.join(HERE, "..", "examples", "ledger-settle.zlisp")
ROLLUP_REF = "/root/reference/examples/rollup-bench.zlisp"


def _ram_invariants(trace, cols: Columns) -> list:
    """Scan the embedded sorted RAM table for the memory-consistency
    invariants the RAM AIR enforces (rollup_bench_ram.rs
    scan_ram_read_vs_last semantics):
      * reads return the last write to the same address,
      * the first access of a new address, if a read, returns 0,
      * (addr, clk) is sorted with strictly increasing clk per addr."""
    bad = []
    prev = None          # (addr, clk, last_write)
    last_write = 0
    for row in range(trace.length):
        if trace.get(cols.ram_sorted, row) != 1:
            continue
        addr = trace.get(cols.ram_s_addr, row)
        clk = trace.get(cols.ram_s_clk, row)
        val = trace.get(cols.ram_s_val, row)
        is_w = trace.get(cols.ram_s_is_write, row)
        if prev is not None:
            p_addr, p_clk = prev
            if addr < p_addr:
                bad.append(("addr order", row))
            elif addr == p_addr and clk <= p_clk:
                bad.append(("clk order", row))
        new_addr = prev is None or addr != prev[0]
        if new_addr:
            last_write = 0
        if not is_w and val != last_write:
            bad.append(("read != last write", row, val, last_write))
        if is_w:
            last_write = val
        prev = (addr, clk)
    return bad


def _trace_and_air(prog, pi):
    trace = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, pi.feature_mask, rom_acc,
                                    None, None, trace)
    air = ZkLispAir(trace.width, trace.length, air_pi)
    return trace, air


@pytest.fixture(scope="module")
def ledger():
    src = open(LEDGER).read()
    prog = compile_entry(src, [])
    pi = PublicInputsBuilder(prog).build()
    trace, air = _trace_and_air(prog, pi)
    return prog, pi, trace, air


def test_ledger_ram_invariants(ledger):
    prog, pi, trace, air = ledger
    bad = _ram_invariants(trace, Columns.baseline())
    assert bad == [], bad[:5]
    # the workload actually exercises RAM: fund+settle writes/reads
    n_events = sum(1 for r in range(trace.length)
                   if trace.get(Columns.baseline().ram_sorted, r) == 1)
    assert n_events >= 3 * 16    # >= fund writes + per-transfer accesses


def test_ledger_gp_permutation_closes(ledger):
    """Unsorted and sorted RAM grand products agree at the end of the
    trace (the permutation argument's closing equality)."""
    prog, pi, trace, air = ledger
    cols = Columns.baseline()
    last = trace.length - 1
    gp_u = trace.get(cols.ram_gp_unsorted, last)
    gp_s = trace.get(cols.ram_gp_sorted, last)
    assert gp_u == gp_s != 0


def test_ledger_preflight_clean(ledger):
    prog, pi, trace, air = ledger
    assert run_preflight(air, trace) == []


@pytest.mark.skipif(not os.path.exists(ROLLUP_REF),
                    reason="reference checkout not available")
def test_reference_rollup_bench_trace_invariants():
    """The reference's own rollup-bench workload (compiled from its
    source with the CLI-style args of rollup_bench_ram.rs:34-60: fee
    sum u64:10, expected root bytes32:0x01) builds a trace satisfying
    the RAM invariants and a clean preflight under this framework."""
    src = open(ROLLUP_REF).read()
    prog = compile_entry(src, [10, 1])
    root = bytes([1] + [0] * 31)
    pi = (PublicInputsBuilder(prog)
          .with_main_args([VmArg.u64(10), VmArg.bytes32(root)])
          .build())
    trace, air = _trace_and_air(prog, pi)
    bad = _ram_invariants(trace, Columns.baseline())
    assert bad == [], bad[:5]
    assert run_preflight(air, trace) == []


@pytest.mark.slow
def test_ledger_recursion_e2e():
    """Multi-segment prove -> aggregate -> verify of the ledger
    workload at weakened options (the reference's
    rollup_bench_recursion.rs tier)."""
    from zklisp_tpu.agg import aggregate as agg
    from zklisp_tpu.prove import prover
    from zklisp_tpu.prove.params import ProverOptions

    src = open(LEDGER).read()
    prog = compile_entry(src, [])
    pi = PublicInputsBuilder(prog).build()
    opts = ProverOptions(queries=8, blowup=8, grind=0,
                         min_security_bits=0)
    steps = prover.prove_program(prog, pi, opts)
    assert len(steps) >= 2
    agg_pi = agg.build_agg_public(steps)
    agg_pi.pi_digest = pi.digest()
    proof, digest = agg.recursion_prove(steps, agg_pi, opts)
    agg.verify_agg(proof, agg_pi)
    # tamper: a broken boundary chain must be rejected
    import copy
    bad_pi = copy.deepcopy(agg_pi)
    bad_pi.vm_state_final = bytes([bad_pi.vm_state_final[0] ^ 1]) \
        + bad_pi.vm_state_final[1:]
    with pytest.raises(Exception):
        steps2 = list(steps)
        agg.recursion_prove(steps2, bad_pi, opts)
