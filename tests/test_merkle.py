"""Merkle tree construction vs a golden-model chained reduction, plus
proof generation/verification."""

import os

import numpy as np
import pytest

from anemoi_tpu.ff import golden
from anemoi_tpu.ff.limb_ops import decode_ints, encode_ints
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.merkle.tree import MerkleTree


def _golden_root(inst, leaves):
    k = inst.width // inst.digest_size
    level = list(leaves)
    while len(level) > 1:
        level = [
            golden.jive_compress_k(
                inst, level[i : i + inst.width], k
            )[0]
            for i in range(0, len(level), inst.width)
        ]
    return level[0]


_CASES = [("vesta", "anemoi_2_1", 16)]
if os.environ.get("ANEMOI_FULL_PARITY"):
    _CASES.append(("vesta", "anemoi_4_3", 16))  # arity-4 tree; CI sweep


@pytest.mark.parametrize("field,iname,n_leaves", _CASES)
def test_tree_root_matches_golden(field, iname, n_leaves):
    inst = get_instance(field, iname)
    fp = inst.field
    rng = np.random.default_rng(3)
    leaves = [int(rng.integers(0, 2**62)) for _ in range(n_leaves)]
    arr = encode_ints(leaves, fp)  # (L, N) Montgomery

    tree = MerkleTree(inst, chunk_b=8)
    root = tree.root(arr)
    got = decode_ints(np.asarray(root), fp)[0]
    assert got == _golden_root(inst, leaves)


def test_tree_proof_roundtrip():
    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    rng = np.random.default_rng(4)
    leaves = [int(rng.integers(0, 2**62)) for _ in range(8)]
    arr = encode_ints(leaves, fp)
    tree = MerkleTree(inst, chunk_b=8)
    root, levels = tree.root(arr, return_levels=True)
    levels = [np.asarray(l) for l in levels]
    for idx in (0, 3, 7):
        path = tree.prove(levels, idx)
        leaf = levels[0][:, idx : idx + 1]
        assert tree.verify(root, leaf, idx, path)
    # tampered leaf fails
    path = tree.prove(levels, 2)
    bad = levels[0][:, 5:6]
    assert not tree.verify(root, bad, 2, path)
