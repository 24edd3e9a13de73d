"""Native-packed batched byte hashing vs the golden byte-sponge path."""

import os

import numpy as np
import pytest

from anemoi_tpu.ff import golden
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.modes import batched as bm

pytest.importorskip("anemoi_tpu.ff.native")

from anemoi_tpu.modes.bytes_pipeline import hash_bytes_batch  # noqa: E402


@pytest.mark.parametrize("field,iname", [("vesta", "anemoi_4_3")])
def test_hash_bytes_batch_matches_golden(field, iname):
    inst = get_instance(field, iname)
    rng = np.random.default_rng(0)
    msgs = [bytes(rng.integers(0, 256, size=100, dtype=np.uint8).tolist()) for _ in range(4)]
    out = np.asarray(hash_bytes_batch(inst, msgs))
    got = bm.decode_states(inst, out)
    assert got == [golden.hash_bytes(inst, m) for m in msgs]


def test_hash_bytes_mixed_ragged_lengths():
    """Length-bucketing dispatcher: a ragged corpus in one call, digests in
    input order (VERDICT r2 item 5)."""
    from anemoi_tpu.modes.bytes_pipeline import hash_bytes_mixed

    inst = get_instance("vesta", "anemoi_4_3")
    rng = np.random.default_rng(1)
    # lengths exercise: sub-chunk, multi-element, equal-E-different-bytes,
    # and empty.  Kept to 3 element-count classes (E in {0, 1, 4}): each
    # class is one XLA:CPU sponge compile, the dominant cost of this test;
    # the chunk-aligned/E=2 classes ride the ANEMOI_FULL_PARITY sweep.
    # the E=4 bucket gets 4 messages so its (E, B) shape matches
    # test_hash_bytes_batch's compile exactly
    lens = [5, 97, 100, 97, 100, 0]
    if os.environ.get("ANEMOI_FULL_PARITY"):
        lens += [31, 62]
    msgs = [
        bytes(rng.integers(0, 256, size=n, dtype=np.uint8).tolist())
        for n in lens
    ]
    out = np.asarray(hash_bytes_mixed(inst, msgs))
    assert out.shape[-1] == len(msgs)
    got = bm.decode_states(inst, out)
    assert got == [golden.hash_bytes(inst, m) for m in msgs]
