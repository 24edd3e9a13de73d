"""Sharded Merkle forest: leaves partitioned over the device mesh, per-shard
subtrees reduced locally, the top of the tree combined via an all-gather of
per-shard roots (a few field elements -- communication-trivial, so scaling
is compute-bound; SURVEY.md section 5).

Bit-exactness: with N leaves over D shards (N/D and D powers of the arity),
subtree-then-top reduction computes exactly the same root as the single-chip
tree -- verified in tests/test_dist.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..fields.params import InstanceParams
from ..merkle.tree import MerkleTree


def sharded_merkle_root_fn(
    inst: InstanceParams,
    mesh: jax.sharding.Mesh,
    n_leaves: int,
    *,
    backend: str = "jit",
    chunk_b: int | None = None,
):
    """Returns jitted f(leaves: int32[L, n_leaves]) -> int32[L, 1] root.

    leaves sharded over the mesh's last axis; per-device subtree reduction
    runs with zero communication, then one all_gather of per-shard roots
    (L*4 bytes each) feeds a replicated top-tree reduction.
    """
    axis = mesh.axis_names[-1]
    n_dev = mesh.shape[axis]
    chunk_b = chunk_b or max(16, min(2048, n_leaves // n_dev // 2))
    tree = MerkleTree(inst, backend=backend, chunk_b=chunk_b)
    assert n_leaves % n_dev == 0
    # shard and top-tree shapes must be powers of the arity
    tree.num_levels(n_leaves // n_dev)
    if n_dev > 1:
        tree.num_levels(n_dev)

    def local_forest(leaves_local):
        root_local = tree.root(leaves_local)  # (L, 1)
        if n_dev == 1:
            return root_local
        all_roots = jax.lax.all_gather(
            root_local[:, 0], axis, axis=1, tiled=False
        )  # (L, n_dev), replicated
        return tree.root(all_roots)

    fn = shard_map(
        local_forest,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, None),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_jive_fn(
    inst: InstanceParams,
    mesh: jax.sharding.Mesh,
    k: int = 2,
    *,
    backend: str = "jit",
):
    """Batch-parallel Jive compression over the mesh: states int32[W*L, N]
    with N sharded over chips; no cross-device communication at all."""
    axis = mesh.axis_names[-1]

    if backend == "pallas":
        from ..ff.pallas_backend import jive_pallas

        kernel = jive_pallas(inst, k)

        def local(states):
            return kernel(states)

    else:
        from ..modes.batched import jive_compress_batch_fn

        compress = jive_compress_batch_fn(inst, k)
        L = inst.field.n_limbs

        def local(states):
            n = states.shape[-1]
            out = compress(states.reshape(inst.width, L, n))
            return out.reshape(-1, n)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis),
        check_rep=False,
    )
    return jax.jit(fn)
