"""Golden model vs the reference's SAGE-generated test vectors.

Covers, for every field x instantiation (14 total):
  * sbox_layer on 10 fixed states      (reference: anemoi_*/mod.rs test_sbox)
  * hash_field on 10 inputs            (hasher.rs test_anemoi_hash)
  * hash over bytes, 4 inputs          (hasher.rs test_anemoi_hash_bytes)
  * jive compress / compress_k(2/4)    (hasher.rs test_anemoi_jive)
plus the alpha/inv-alpha inverse property (sbox.rs test_alpha analogue).
"""

import pytest

from anemoi_tpu.ff import golden
from anemoi_tpu.fields.params import all_instances, get_instance

from .vector_loader import all_vector_keys, load_vectors

KEYS = list(all_vector_keys())


@pytest.mark.parametrize("field,instance", KEYS)
def test_sbox_vectors(field, instance):
    inst = get_instance(field, instance)
    vec = load_vectors(field, instance)
    for state, expected in zip(vec["sbox"]["input"], vec["sbox"]["output"]):
        assert golden.sbox_layer(inst, state) == expected


@pytest.mark.parametrize("field,instance", KEYS)
def test_hash_field_vectors(field, instance):
    inst = get_instance(field, instance)
    vec = load_vectors(field, instance)
    for elems, expected in zip(vec["hash_field"]["input"], vec["hash_field"]["output"]):
        assert golden.hash_field(inst, elems) == expected


@pytest.mark.parametrize("field,instance", KEYS)
def test_hash_bytes_vectors(field, instance):
    inst = get_instance(field, instance)
    vec = load_vectors(field, instance)
    chunk = inst.field.byte_chunk
    # The reference test serializes each input element to its low `chunk`
    # bytes and hashes the concatenated byte string; inputs are chosen to fit.
    for elems, expected in zip(vec["hash_bytes"]["input"], vec["hash_bytes"]["output"]):
        data = b"".join(int(e).to_bytes(chunk, "little") for e in elems)
        assert golden.hash_bytes(inst, data) == expected


@pytest.mark.parametrize("field,instance", KEYS)
def test_jive_vectors(field, instance):
    inst = get_instance(field, instance)
    vec = load_vectors(field, instance)
    ks = [2, 4]
    for pair, k in zip(vec["jive"], ks):
        for elems, expected in zip(pair["input"], pair["output"]):
            assert golden.jive_compress_k(inst, elems, k) == expected
    # 2_1 merge is jive-consistent (reference 2_1/hasher.rs:312-321)
    if inst.rate == 1:
        for elems, expected in zip(vec["jive"][0]["input"], vec["jive"][0]["output"]):
            assert golden.merge(inst, elems[:1], elems[1:]) == expected


@pytest.mark.parametrize("inst", all_instances(), ids=lambda i: i.qualified_name)
def test_alpha_inverse_property(inst):
    fp = inst.field
    x = fp.p - 1
    for _ in range(20):
        y = golden.exp_inv_alpha(fp, x)
        assert pow(y, fp.alpha, fp.p) == x
        x = x * x % fp.p


def test_merge_quirk_documented():
    inst = get_instance("vesta", "anemoi_4_3")
    d0, d1 = [123456789], [987654321]
    # the quirk variant ignores d1 entirely
    assert golden.merge_reference_quirk(inst, d0, d1) == golden.merge_reference_quirk(
        inst, d0, [0]
    )
    assert golden.merge(inst, d0, d1) != golden.merge(inst, d0, [0])
