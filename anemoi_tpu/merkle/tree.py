"""Batched Merkle-tree construction over Anemoi Jive compression.

The reference provides only the node combiner (`Sponge::merge` /
`Jive::compress_k`, reference: src/<field>/anemoi_*/hasher.rs); tree
construction itself is net-new TPU-first design (SURVEY.md section 2.5):

  * a level is a single batched Jive kernel call: children are gathered by
    strided column slices (child j of node i is column arity*i + j), the
    whole level reduces in one fused kernel invocation;
  * levels iterate host-side (log_arity(N) steps), optionally chunked so one
    compiled kernel shape serves every level;
  * digests stay in Montgomery limb form end to end -- no domain conversions
    between levels.

Layout: a level of N digests is int32[L, N] (digest_size == 1 for both
shipped instantiations).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import InstanceParams
from ..modes.batched import jive_compress_batch_fn


def _level_fn(
    inst: InstanceParams,
    arity: int,
    *,
    backend: str = "jit",
    chunk_b: int | None = None,
):
    """Returns f(digests: (L, N)) -> (L, N//arity): one tree level.

    With chunk_b set, every kernel call uses the same fixed batch shape
    (small levels are zero-padded): one compiled executable serves all
    log_arity(N) levels of any tree.
    """
    assert arity == inst.width, (
        f"{inst.qualified_name} compresses {inst.width} children per node "
        f"(jive compress_k(k={inst.width // inst.digest_size}))"
    )
    k = inst.width // inst.digest_size
    L = inst.field.n_limbs

    if backend == "pallas":
        from ..ff.pallas_backend import jive_pallas

        # The kernel pads any level up to a block multiple internally and
        # grids over the WHOLE level (VMEM holds one block at a time), so a
        # level is exactly one kernel dispatch and the per-instance
        # measured block default applies (mxu wants large blocks; the pad
        # waste on the small top levels is < block nodes per level).  Do
        # NOT wrap tree.root in an outer jax.jit on this backend: that
        # inlines one copy of the (straight-line-unrolled) kernel per level
        # and the program size explodes (observed 3.3 GB at 2^24 leaves).
        kernel = jive_pallas(inst, k, block_b=chunk_b)

        def level(digests):
            n_nodes = digests.shape[-1] // arity
            states = jnp.stack(
                [digests[:, w::arity] for w in range(arity)], axis=0
            )
            return kernel(states.reshape(arity * L, n_nodes))

        return level

    chunk = chunk_b or 2048
    compress = jax.jit(jive_compress_batch_fn(inst, k))

    def run_states(flat):
        n = flat.shape[-1]
        return compress(flat.reshape(arity, L, n))[0]

    # smallest batch granularity (pallas: one grid block; never above chunk)
    min_b = min(chunk, 512)

    def level(digests):
        n = digests.shape[-1]
        n_nodes = n // arity
        states = jnp.stack([digests[:, w::arity] for w in range(arity)], axis=0)
        flat = states.reshape(arity * L, n_nodes)
        if n_nodes % chunk == 0:
            chunks = [flat[:, c * chunk : (c + 1) * chunk] for c in range(n_nodes // chunk)]
        elif n_nodes > chunk:
            pad = chunk - (n_nodes % chunk)
            flat = jnp.pad(flat, ((0, 0), (0, pad)))
            chunks = [
                flat[:, c * chunk : (c + 1) * chunk]
                for c in range((n_nodes + pad) // chunk)
            ]
        else:
            # Small level: pad to the next power-of-two multiple of min_b
            # instead of all the way to `chunk`.  Without this, the tail
            # levels of a 2^20-leaf arity-2 tree cost ~14 x chunk padded
            # nodes (~20% of the whole tree); with it the padded waste is
            # < min_b per level.  The bounded set of shapes (min_b * 2^j,
            # j <= log2(chunk/min_b)) keeps executable count small and
            # cached across trees.
            target = min_b
            while target < n_nodes:
                target *= 2
            chunks = [jnp.pad(flat, ((0, 0), (0, target - n_nodes)))]
        outs = [run_states(c) for c in chunks]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out[:, :n_nodes]

    return level


class MerkleTree:
    """Fixed-shape Merkle tree builder for one Anemoi instantiation.

    arity 2 -> anemoi_2_1 (Jive 2-to-1), arity 4 -> anemoi_4_3 (Jive 4-to-1).
    """

    def __init__(
        self,
        inst: InstanceParams,
        *,
        backend: str = "jit",
        chunk_b: int | None = None,
    ):
        self.inst = inst
        self.arity = inst.width
        self.backend = backend
        self._level = _level_fn(inst, self.arity, backend=backend, chunk_b=chunk_b)

    def num_levels(self, n_leaves: int) -> int:
        lv = 0
        while n_leaves > 1:
            assert n_leaves % self.arity == 0, "leaf count must be a power of arity"
            n_leaves //= self.arity
            lv += 1
        return lv

    def root(self, leaves, *, return_levels: bool = False, checkpoint_dir=None):
        """leaves: int32[L, N] Montgomery digests; returns int32[L, 1] root.

        With return_levels=True also returns every intermediate level
        (the materialization used for proofs).  With checkpoint_dir set,
        each completed level is persisted (np.save) and a restart resumes
        from the deepest completed level -- levels are pure functions of the
        leaves, so recovery is deterministic (SURVEY.md section 5).
        """
        import pathlib

        level = leaves
        levels = [level]
        n_levels = self.num_levels(int(leaves.shape[1]))
        start = 0
        if checkpoint_dir is not None:
            ckpt = pathlib.Path(checkpoint_dir)
            ckpt.mkdir(parents=True, exist_ok=True)
            for lv in range(n_levels, 0, -1):
                f = ckpt / f"level_{lv}.npy"
                if f.exists():
                    level = np.load(f)
                    start = lv
                    break
            if return_levels and start > 0:
                # A resumed run must return the SAME levels list a fresh run
                # would (proofs walk every level): rebuild levels 1..start
                # from the persisted files instead of silently returning a
                # truncated list.
                for lv in range(1, start + 1):
                    f = ckpt / f"level_{lv}.npy"
                    if not f.exists():
                        raise FileNotFoundError(
                            f"checkpoint resume with return_levels=True needs "
                            f"every level file up to the resume point; "
                            f"missing {f}"
                        )
                    levels.append(np.load(f))
        for lv in range(start, n_levels):
            level = self._level(level)
            if return_levels:
                levels.append(level)
            if checkpoint_dir is not None:
                np.save(
                    pathlib.Path(checkpoint_dir) / f"level_{lv + 1}.npy",
                    np.asarray(level),
                )
        return (level, levels) if return_levels else level

    def prove(self, levels: list, index: int) -> list:
        """Merkle authentication path for leaf `index` from materialized
        levels: [(sibling_digests int32[L, arity-1], child_pos int)] per level."""
        path = []
        idx = index
        for level in levels[:-1]:
            base = idx - (idx % self.arity)
            sibs = [
                np.asarray(level[:, base + j])
                for j in range(self.arity)
            ]
            path.append((np.stack(sibs, axis=1), idx % self.arity))
            idx //= self.arity
        return path

    def verify(self, root, leaf, index: int, path: list) -> bool:
        """Recompute the root from a leaf and its authentication path.

        Scalar-rate host verification (one permutation per level) via the
        golden model -- proof checking is not a throughput path.
        """
        from ..ff import golden
        from ..ff.limb_ops import decode_ints, encode_ints

        fp = self.inst.field
        cur = decode_ints(np.asarray(leaf).reshape(-1, 1), fp)[0]
        idx = index
        for sibs, pos in path:
            children = decode_ints(np.asarray(sibs), fp)
            children[pos] = cur
            out = golden.jive_compress_k(
                self.inst, children, self.inst.width // self.inst.digest_size
            )
            cur = out[0]
            idx //= self.arity
        root_int = decode_ints(np.asarray(root).reshape(-1, 1), fp)[0]
        return cur == root_int
