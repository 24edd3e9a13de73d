"""Streaming async byte-hash pipeline vs the scalar golden sponge."""

import numpy as np

from anemoi_tpu.ff import golden
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.modes.async_pipeline import AsyncByteHasher
from anemoi_tpu.modes.batched import digests_to_bytes


def test_async_pipeline_matches_golden():
    # 2_1: the narrowest instantiation (width 2) -- the pipeline logic under
    # test is instance-agnostic and the 4_3 shape costs ~2x the trace+lower
    # time (suite budget, VERDICT r3 item 5); 4_3 byte hashing is pinned by
    # test_bytes_pipeline
    inst = get_instance("vesta", "anemoi_2_1")
    rng = np.random.default_rng(9)
    batches = [
        [rng.bytes(70) for _ in range(3)],  # 3 elements per message
        [rng.bytes(70) for _ in range(3)],
        [rng.bytes(70) for _ in range(3)],
    ]
    pipe = AsyncByteHasher(inst)
    got = []
    for batch in batches:
        got.extend(pipe.feed(batch))
    got.extend(pipe.drain())
    assert len(got) == len(batches)
    for out, batch in zip(got, batches):
        raw = digests_to_bytes(inst, out)
        for r, msg in zip(raw, batch):
            expect = golden.digest_to_bytes(
                inst, golden.hash_bytes(inst, msg)
            )
            assert r == expect
