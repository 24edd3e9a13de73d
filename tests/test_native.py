"""Native C++ host library (data loader + CPU oracle) vs the golden model."""

import numpy as np
import pytest

from anemoi_tpu.ff import golden
from anemoi_tpu.fields.params import (
    get_field,
    get_instance,
    int_from_limbs,
    limbs_from_int,
)

native = pytest.importorskip("anemoi_tpu.ff.native")


@pytest.mark.parametrize("field", ["vesta", "bls12_377"])
def test_pack_bytes_matches_golden(field):
    fp = get_field(field)
    inst = get_instance(field, "anemoi_2_1")
    for data in (b"", b"x", bytes(range(31)), bytes(range(200)), bytes(94)):
        packed = native.pack_bytes(data, fp)
        got = [int_from_limbs(packed[i]) for i in range(packed.shape[0])]
        assert got == golden.bytes_to_elements(inst, data)


@pytest.mark.parametrize(
    "field,iname",
    [
        ("vesta", "anemoi_2_1"),
        ("bls12_381", "anemoi_4_3"),
        ("ed_on_bls12_377", "anemoi_2_1"),
    ],
)
def test_native_oracle_matches_golden(field, iname):
    inst = get_instance(field, iname)
    fp = inst.field
    rng = np.random.default_rng(0)
    B = 6
    states = [
        [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % fp.p
         for _ in range(inst.width)]
        for _ in range(B)
    ]
    arr = np.stack(
        [[limbs_from_int(s[w], fp.n_limbs) for w in range(inst.width)] for s in states]
    )
    out = native.permute_batch_canonical(inst, arr)
    got = [[int_from_limbs(out[b, w]) for w in range(inst.width)] for b in range(B)]
    assert got == [golden.permutation(inst, s) for s in states]

    outj = native.jive_batch_canonical(inst, arr, 2)
    gotj = [
        [int_from_limbs(outj[b, w]) for w in range(outj.shape[1])] for b in range(B)
    ]
    assert gotj == [golden.jive_compress_k(inst, s, 2) for s in states]
