"""Streaming async byte-hash pipeline vs the scalar golden sponge."""

import numpy as np

from anemoi_tpu.ff import golden
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.modes.async_pipeline import AsyncByteHasher
from anemoi_tpu.modes.batched import digests_to_bytes


def test_async_pipeline_matches_golden():
    inst = get_instance("vesta", "anemoi_4_3")
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
