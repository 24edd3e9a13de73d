"""Streaming batched sponge vs the golden sponge (rate-aligned chunked
absorb + tail/sigma finalize)."""

import os

import numpy as np
import pytest

from anemoi_tpu.ff import golden
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.modes import batched as bm
from anemoi_tpu.modes.streaming import BatchedSponge

# (6,[3,3]): multi-chunk absorb, sigma=1 -- the streaming-specific path,
# always on.  (4,[3]) (tail + sigma=0 finalize) and (7,[6]) (same-shape
# tail variant) ride the ANEMOI_FULL_PARITY sweep: the finalize path is
# also pinned by the batched-sponge vector tests, and each case is a
# fresh ~2 min trace+lower of a distinct absorb graph (suite budget,
# VERDICT r3 item 5).
_CASES = [(6, [3, 3])]
if os.environ.get("ANEMOI_FULL_PARITY"):
    _CASES += [(4, [3]), (7, [6])]


@pytest.mark.parametrize("total_len,chunks", _CASES)
def test_streaming_sponge_vesta_4_3(total_len, chunks):
    inst = get_instance("vesta", "anemoi_4_3")
    fp = inst.field
    B = 4
    rng = np.random.default_rng(0)
    msgs = [
        [int(rng.integers(0, 2**62)) for _ in range(total_len)] for _ in range(B)
    ]

    def elems_arr(lo_idx, hi_idx):
        return np.stack(
            [
                bm.lo.encode_ints([m[e] for m in msgs], fp)
                for e in range(lo_idx, hi_idx)
            ]
        )

    sponge = BatchedSponge(inst, batch=B)
    off = 0
    for c in chunks:
        sponge.absorb(elems_arr(off, off + c))
        off += c
    tail = elems_arr(off, total_len) if off < total_len else None
    out = np.asarray(sponge.finalize(tail))
    got = bm.decode_states(inst, out)
    assert got == [golden.hash_field(inst, m) for m in msgs]


def test_streaming_sponge_rate1():
    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    B = 4
    rng = np.random.default_rng(1)
    msgs = [[int(rng.integers(0, 2**62)) for _ in range(5)] for _ in range(B)]
    arr = np.stack(
        [bm.lo.encode_ints([m[e] for m in msgs], fp) for e in range(5)]
    )
    sponge = BatchedSponge(inst, batch=B)
    sponge.absorb(arr)
    out = np.asarray(sponge.finalize())
    assert bm.decode_states(inst, out) == [golden.hash_field(inst, m) for m in msgs]


def test_finalize_sigma0_uses_cached_permutation():
    """Regression: the sigma=0 finalize path used to construct a fresh
    jax.jit(permutation_fn(...)) per call (one recompile per stream
    finalization); it must go through the lru-cached _finalize_perm_fn."""
    from anemoi_tpu.modes.streaming import _finalize_perm_fn

    inst = get_instance("vesta", "anemoi_4_3")
    fp = inst.field
    rng = np.random.default_rng(2)
    before = _finalize_perm_fn.cache_info()
    # B=4 matches the shapes the parametrized cases above already compiled
    for _ in range(2):
        msgs = [[int(rng.integers(0, 2**62)) for _ in range(4)] for _ in range(4)]
        sponge = BatchedSponge(inst, batch=4)
        arr = np.stack(
            [bm.lo.encode_ints([m[e] for m in msgs], fp) for e in range(3)]
        )
        sponge.absorb(arr)
        tail = np.stack([bm.lo.encode_ints([m[3] for m in msgs], fp)])
        out = np.asarray(sponge.finalize(tail))
        assert bm.decode_states(inst, out) == [
            golden.hash_field(inst, m) for m in msgs
        ]
    after = _finalize_perm_fn.cache_info()
    # one distinct (inst, backend, block) key -> at most one new cache entry
    assert after.currsize - before.currsize <= 1
    assert after.hits > before.hits
