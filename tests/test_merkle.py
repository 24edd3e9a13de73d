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


def test_checkpoint_resume_return_levels(tmp_path):
    """A resumed run with return_levels=True must return the SAME levels a
    fresh run would (regression: it used to return only levels above the
    resume point, silently breaking proofs built from a resumed tree)."""
    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    rng = np.random.default_rng(5)
    leaves = [int(rng.integers(0, 2**62)) for _ in range(8)]
    arr = encode_ints(leaves, fp)
    tree = MerkleTree(inst, chunk_b=8)

    ckpt = tmp_path / "ckpt"
    root, fresh_levels = tree.root(arr, return_levels=True, checkpoint_dir=ckpt)
    # every level file exists -> a restart resumes from the deepest (the root)
    root2, resumed_levels = tree.root(arr, return_levels=True, checkpoint_dir=ckpt)
    assert np.array_equal(np.asarray(root), np.asarray(root2))
    assert len(resumed_levels) == len(fresh_levels)
    for a, b in zip(fresh_levels, resumed_levels):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # proofs from the resumed tree verify
    resumed_levels = [np.asarray(l) for l in resumed_levels]
    for idx in (0, 5):
        path = tree.prove(resumed_levels, idx)
        assert tree.verify(root2, resumed_levels[0][:, idx : idx + 1], idx, path)


def test_checkpoint_resume_missing_level_raises(tmp_path):
    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    rng = np.random.default_rng(6)
    leaves = [int(rng.integers(0, 2**62)) for _ in range(8)]
    arr = encode_ints(leaves, fp)
    tree = MerkleTree(inst, chunk_b=8)
    ckpt = tmp_path / "ckpt"
    tree.root(arr, checkpoint_dir=ckpt)
    (ckpt / "level_1.npy").unlink()  # deepest (level_3) still present
    with pytest.raises(FileNotFoundError):
        tree.root(arr, return_levels=True, checkpoint_dir=ckpt)
