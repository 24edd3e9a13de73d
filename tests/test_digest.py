"""Digest wrapper + byte serialization parity.

Ports the reference's `digest_elements` property test
(reference: src/vesta/anemoi_2_1/digest.rs:66-88 -- round-trip through
elements, default digest = zeros, to_bytes of the zero digest) and adds
`to_bytes` checks for both byte widths (32 B for <=255-bit fields, 48 B for
BLS12-377/381, reference digest.rs:42-46) plus the batched device-side
from-Montgomery -> canonical-LE-bytes export path.
"""

import numpy as np
import pytest

import anemoi_tpu as at
from anemoi_tpu.ff import golden
from anemoi_tpu.ff import limb_ops as lo
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.instances import Digest, instance
from anemoi_tpu.modes.batched import digest_export_fn, digests_to_bytes


@pytest.mark.parametrize("field", ["vesta", "bls12_377"])
@pytest.mark.parametrize("iname", ["anemoi_2_1", "anemoi_4_3"])
def test_digest_elements_property(field, iname):
    """reference digest.rs:66-88: 100 random element sets round-trip through
    the Digest wrapper; default digest is all zeros."""
    obj = instance(field, iname)
    p = obj.params.field.p
    rng = np.random.default_rng(7)
    for _ in range(100):
        elems = [int(rng.integers(0, 2**62)) % p for _ in range(obj.DIGEST_SIZE)]
        d = Digest.new(elems, obj)
        assert list(d.as_elements()) == elems
        assert d.to_elements() == elems
        assert list(d) == elems
    d0 = Digest.new([1] * obj.DIGEST_SIZE, obj)
    d1 = Digest.new([2] * obj.DIGEST_SIZE, obj)
    assert Digest.digests_to_elements([d0, d1]) == (
        [1] * obj.DIGEST_SIZE + [2] * obj.DIGEST_SIZE
    )
    default = Digest.default(obj)
    assert default.to_elements() == [0] * obj.DIGEST_SIZE
    nbytes = obj.params.field.digest_bytes
    assert default.to_bytes() == b"\x00" * (nbytes * obj.DIGEST_SIZE)


@pytest.mark.parametrize(
    "field,nbytes", [("vesta", 32), ("jubjub", 32), ("bls12_377", 48), ("bls12_381", 48)]
)
def test_to_bytes_widths(field, nbytes):
    """32-byte vs 48-byte canonical LE serialization (digest.rs:42-46)."""
    obj = instance(field, "anemoi_2_1")
    p = obj.params.field.p
    for v in [0, 1, p - 1, p // 3]:
        d = Digest.new([v] * obj.DIGEST_SIZE, obj)
        raw = d.to_bytes()
        assert len(raw) == nbytes * obj.DIGEST_SIZE
        assert raw[:nbytes] == int(v).to_bytes(nbytes, "little")


@pytest.mark.parametrize("field", ["vesta", "bls12_381"])
def test_batched_digest_export(field):
    """Device-side from-Montgomery + host LE packing matches the scalar
    golden.digest_to_bytes across both byte widths."""
    inst = get_instance(field, "anemoi_4_3")
    fp = inst.field
    rng = np.random.default_rng(11)
    B = 6
    vals = [
        [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p for _ in range(B)]
        for _ in range(inst.digest_size)
    ]
    vals[0][:3] = [0, 1, fp.p - 1]
    mont = np.stack([lo.encode_ints(row, fp, mont=True) for row in vals], axis=0)
    canon = np.asarray(digest_export_fn(inst)(mont))
    got = digests_to_bytes(inst, canon)
    for b in range(B):
        expect = golden.digest_to_bytes(inst, [vals[e][b] for e in range(inst.digest_size)])
        assert got[b] == expect


def test_hash_digest_to_bytes_end_to_end():
    d = at.vesta.anemoi_2_1.hash(b"anemoi digest bytes")
    raw = d.to_bytes()
    assert len(raw) == 32
    assert int.from_bytes(raw, "little") == d.elements[0]
