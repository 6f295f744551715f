"""Batch Merkle multiproof: compression of query openings.

The reference ships winterfell's compressed batch multiproofs and
decompresses them during aggregation (agg/child.rs:162-520); this is
the TPU build's equivalent (prove/multiproof.py)."""

import numpy as np
import pytest

from zklisp_tpu.field import limb
from zklisp_tpu.prove import multiproof
from zklisp_tpu.prove.commit import commit_rows


@pytest.fixture(scope="module")
def tree():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 1 << 16, size=(64, 4, limb.NLIMB),
                        dtype=np.uint32)
    return commit_rows(rows, 4, np)


def _leaf(comm, p):
    from zklisp_tpu.field import f128
    return f128.fe_to_bytes_fold(int(limb.to_ints(
        comm.levels[0][p:p + 1])[0]))


@pytest.mark.parametrize("positions", [
    [0], [63], [0, 1], [5, 37], [0, 1, 2, 3], [7, 21, 22, 40, 41, 63],
    [13], list(range(0, 64, 7)),
])
def test_compress_expand_roundtrip(tree, positions):
    paths = [tree.open(p) for p in positions]
    mp = multiproof.compress(positions, paths)
    expanded, root = multiproof.expand(
        mp, positions, [_leaf(tree, p) for p in positions])
    assert expanded == paths
    assert root == tree.root


def test_compression_saves_nodes(tree):
    positions = [8, 9, 10, 11, 40, 41]    # adjacent pairs share subtrees
    paths = [tree.open(p) for p in positions]
    mp = multiproof.compress(positions, paths)
    naive = sum(len(p) for p in paths)
    assert mp.num_nodes() < naive
    # pairs never ship their partner's sibling at level 0
    assert len(mp.nodes[0]) == 0


def test_unsorted_positions(tree):
    positions = [41, 8, 63, 9]
    paths = [tree.open(p) for p in positions]
    mp = multiproof.compress(positions, paths)
    expanded, root = multiproof.expand(
        mp, positions, [_leaf(tree, p) for p in positions])
    assert expanded == paths and root == tree.root


def test_canonical_independent_of_input_order(tree):
    """wf-compat surface: the compressed node set must be CANONICAL —
    a function of the position SET only (winterfell's BatchMerkleProof
    sorts/folds positions deterministically, agg/child.rs decompression
    depends on it) — so any permutation of the same positions yields
    byte-identical compressed nodes."""
    import itertools
    positions = [41, 7, 22, 63, 21, 40]
    base = None
    for perm in itertools.islice(
            itertools.permutations(positions), 0, 24, 5):
        perm = list(perm)
        mp = multiproof.compress(perm, [tree.open(p) for p in perm])
        key = tuple(tuple(level) for level in mp.nodes)
        if base is None:
            base = key
        assert key == base, f"non-canonical compression for {perm}"


def test_fri_folded_positions_pairs(tree):
    """Adjacent sibling pairs (the shape FRI folding produces after
    fold_positions) compress with zero redundant sibling nodes and
    still expand to verifying paths."""
    positions = [10, 11, 30, 31, 54, 55]
    paths = [tree.open(p) for p in positions]
    mp = multiproof.compress(positions, paths)
    expanded, root = multiproof.expand(
        mp, positions, [_leaf(tree, p) for p in positions])
    assert expanded == paths and root == tree.root
    # every sibling leaf is in the opened set, so no level-0 sibling
    # nodes ship at all — compression must exploit the pairing
    assert len(mp.nodes[0]) == 0
    lone = multiproof.compress([10, 30, 54],
                               [tree.open(p) for p in [10, 30, 54]])
    assert mp.num_nodes() < lone.num_nodes() + 3


def test_malformed_proofs_rejected(tree):
    positions = [5, 37]
    paths = [tree.open(p) for p in positions]
    mp = multiproof.compress(positions, paths)
    leaves = [_leaf(tree, p) for p in positions]

    import copy
    short = copy.deepcopy(mp)
    short.nodes[0] = short.nodes[0][:-1]
    with pytest.raises(ValueError):
        multiproof.expand(short, positions, leaves)

    extra = copy.deepcopy(mp)
    extra.nodes[1] = extra.nodes[1] + [b"\x00" * 32]
    with pytest.raises(ValueError):
        multiproof.expand(extra, positions, leaves)

    # tampered node changes the reconstructed root
    bad = copy.deepcopy(mp)
    lvl = next(i for i, l in enumerate(bad.nodes) if l)
    node = bytearray(bad.nodes[lvl][0])
    node[0] ^= 1
    bad.nodes[lvl][0] = bytes(node)
    _, root = multiproof.expand(bad, positions, leaves)
    assert root != tree.root
