"""Poseidon2 suite derivation + batched kernels vs host reference."""

import random

import numpy as np

from zklisp_tpu.crypto import poseidon as pos
from zklisp_tpu.crypto import poseidon_jax as pj
from zklisp_tpu.field import f128, limb

SID = bytes([7] * 32)


def test_suite_shapes_and_determinism():
    s = pos.get_poseidon_suite(SID)
    assert len(s.rc) == 27 and all(len(r) == 12 for r in s.rc)
    assert len(s.mds) == 12 and all(len(r) == 12 for r in s.mds)
    assert s.rc[0][0] != 0 and s.rc[26][11] != 0
    assert pos.get_poseidon_suite(SID) is s  # cached
    # different suite -> different params
    s2 = pos.get_poseidon_suite(bytes([8] * 32))
    assert s2.rc[0][0] != s.rc[0][0]


def test_mds_is_cauchy_invertible():
    s = pos.get_poseidon_suite(SID)
    # no zero entries (x_i + y_j != 0 guaranteed by derivation)
    assert all(v != 0 for row in s.mds for v in row)


def test_two_lane_hash_equals_sponge_absorb():
    h = pos.poseidon_hash_two_lanes(SID, 1, 2)
    assert h == pos.sponge_absorb([1, 2], SID)
    assert h != pos.poseidon_hash_two_lanes(SID, 2, 1)


def test_hasher_digest_format():
    d = pos.hash_bytes(b"hello")
    assert len(d) == 32 and d[16:] == b"\x00" * 16
    assert pos.merge(d, d) != d
    assert pos.merge_many([]) == b"\x00" * 32
    assert pos.merge_with_int(d, 1) != pos.merge_with_int(d, 2)


def test_batched_permutation_matches_host():
    rng = random.Random(1)
    states = [[rng.randrange(f128.P) for _ in range(12)] for _ in range(4)]
    suite = pos.get_poseidon_suite(SID)
    exp = [pos.permute_12(s, suite) for s in states]
    got = limb.to_ints(pj.permute12_batch(limb.from_ints(states), SID, np))
    assert [list(r) for r in got] == exp


def test_batched_rom_permutation_matches_host():
    rng = random.Random(2)
    mds3, rc3 = pos.get_rom_suite(SID)
    states = [[rng.randrange(f128.P) for _ in range(3)] for _ in range(4)]
    exp = [pos.permute_3(s, mds3, rc3) for s in states]
    got = limb.to_ints(pj.permute3_batch(limb.from_ints(states), SID, np))
    assert [list(r) for r in got] == exp


def test_hash_rows_matches_hash_elements():
    rng = random.Random(3)
    for W in (1, 2, 7, 19, 25):
        rows = [[rng.randrange(f128.P) for _ in range(W)] for _ in range(3)]
        exp = [pos.hash_elements(r) for r in rows]
        got = limb.to_ints(pj.hash_rows(limb.from_ints(rows), np))
        assert [f128.fe_to_bytes_fold(v) for v in got] == exp, W


def test_merkle_tree_matches_host_merge():
    rng = random.Random(4)
    leaves = [rng.randrange(f128.P) for _ in range(8)]

    def hmerge(a, b):
        return f128.fe_from_bytes_fold(
            pos.merge(f128.fe_to_bytes_fold(a), f128.fe_to_bytes_fold(b)))

    tree = pj.merkle_tree(limb.from_ints(leaves), np)
    l1 = [hmerge(leaves[i], leaves[i + 1]) for i in range(0, 8, 2)]
    l2 = [hmerge(l1[i], l1[i + 1]) for i in range(0, 4, 2)]
    root = hmerge(l2[0], l2[1])
    assert list(limb.to_ints(tree[1])) == l1
    assert list(limb.to_ints(tree[3]))[0] == root


def test_partitioned_row_hash():
    rng = random.Random(5)
    rows = [[rng.randrange(f128.P) for _ in range(10)] for _ in range(3)]
    got = limb.to_ints(
        pj.hash_rows_partitioned(limb.from_ints(rows), 5, np))
    exp = [pos.merge_many([pos.hash_elements(r[:5]), pos.hash_elements(r[5:])])
           for r in rows]
    assert [f128.fe_to_bytes_fold(v) for v in got] == exp


def test_program_field_commitment_nonzero():
    fc = pos.program_field_commitment(SID)
    assert fc[0] != 0 and fc[1] != 0


def test_rom_weights():
    w = pos.rom_weights_for_seed(pos.ROM_W_SEED_0)
    assert len(w) == 59
    assert w[0] == pow(3, 18, f128.P)
    assert w[58] == pow(3, 76, f128.P)


def test_default_hasher_rounds_roundtrip(monkeypatch):
    """One prove/verify roundtrip at the DEFAULT 27 hasher rounds (the
    conftest weakens ZKL_POSEIDON_HASHER_ROUNDS to 8 for suite speed)."""
    import numpy as np

    from zklisp_tpu.air.airpi import build_air_pi_for_trace
    from zklisp_tpu.air.zk_air import ZkLispAir
    from zklisp_tpu.compiler import builder as B, ops as O
    from zklisp_tpu.core.pi import PublicInputsBuilder
    from zklisp_tpu.prove import stark
    from zklisp_tpu.prove.params import ProofOptions
    from zklisp_tpu.trace import build as tb

    monkeypatch.delenv("ZKL_POSEIDON_HASHER_ROUNDS", raising=False)
    b = B.ProgramBuilder()
    for op in [O.Const(0, 7), O.Const(1, 9), O.Add(2, 0, 1), O.End()]:
        b.push(op)
    prog = b.finalize(B.CompilerMetrics())
    pi = PublicInputsBuilder(prog).build()
    tr = tb.build_trace(prog, pi)
    rom_acc = tb.rom_acc_from_program(prog)
    air_pi = build_air_pi_for_trace(pi, 0, rom_acc, None, None, tr)
    air = ZkLispAir(tr.width, tr.length, air_pi)
    opts = ProofOptions(num_queries=4, blowup=8, grinding_factor=0)
    proof = stark.prove_trace(tr, air, air_pi, opts, np)
    stark.verify_trace(proof, air_pi)
