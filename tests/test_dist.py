"""Multi-chip sharding on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): shard_map Jive, sharded Merkle
forest vs unsharded root, and root invariance across device counts."""

import jax
import numpy as np
import pytest

from anemoi_tpu.dist.forest import sharded_jive_fn, sharded_merkle_root_fn
from anemoi_tpu.dist.mesh import chip_mesh, shard_batch
from anemoi_tpu.ff import golden
from anemoi_tpu.ff.limb_ops import decode_ints, encode_ints
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.merkle.tree import MerkleTree
from anemoi_tpu.modes import batched as bm


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_jive_matches_golden():
    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    L = fp.n_limbs
    mesh = chip_mesh(8)
    rng = np.random.default_rng(0)
    n = 16
    states = [[int(rng.integers(0, 2**62)) for _ in range(inst.width)] for _ in range(n)]
    arr = bm.encode_states(inst, states).reshape(inst.width * L, n)
    out = np.asarray(sharded_jive_fn(inst, mesh)(shard_batch(arr, mesh)))
    got = [decode_ints(out[:, i : i + 1], fp)[0] for i in range(n)]
    assert got == [golden.jive_compress(inst, s)[0] for s in states]


def test_sharded_forest_root_invariant():
    # kept small: the jitted forest inlines one permutation graph per tree
    # level, which dominates XLA CPU compile time.  Truth comes from the
    # golden scalar chained reduction (no second jitted tree), which also
    # proves the sharded subtree-then-top order equals the flat tree.
    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    rng = np.random.default_rng(1)
    n_leaves = 16
    leaves = [int(rng.integers(0, 2**62)) for _ in range(n_leaves)]
    arr = encode_ints(leaves, fp)

    level = list(leaves)
    while len(level) > 1:
        level = [
            golden.jive_compress(inst, level[i : i + 2])[0]
            for i in range(0, len(level), 2)
        ]
    expected = level[0]

    mesh = chip_mesh(8)
    fn = sharded_merkle_root_fn(inst, mesh, n_leaves, chunk_b=8)
    root = np.asarray(fn(shard_batch(np.asarray(arr), mesh)))
    assert decode_ints(root, fp)[0] == expected
