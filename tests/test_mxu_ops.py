"""MXU-conv Montgomery multiplication (mxu_ops) vs Python-int ground truth.

The constant-conv-as-int8-matmul path must be bit-exact for canonical
products and closed over deep lazy squaring chains (the S-box ladder op),
including relaxed-digit inputs, on both limb widths.
"""

import os

import numpy as np
import pytest

from anemoi_tpu.ff import limb_ops as lo
from anemoi_tpu.ff import mxu_ops as mx
from anemoi_tpu.fields.params import FIELD_NAMES, get_field

_FIELDS = (
    FIELD_NAMES
    if os.environ.get("ANEMOI_FULL_PARITY")
    else ["vesta", "bls12_381"]  # both limb widths; full sweep in CI
)


@pytest.mark.parametrize("field", _FIELDS)
def test_mxu_mont_mul_sqr(field):
    fp = get_field(field)
    fc = lo.field_consts(fp, mul_impl="cios2")
    mc = mx.mxu_consts(fc)
    rng = np.random.default_rng(21)
    a = [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p
         for _ in range(8)]
    b = [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p
         for _ in range(8)]
    a[:3] = [0, 1, fp.p - 1]
    A, B = lo.encode_ints(a, fp), lo.encode_ints(b, fp)
    got = lo.decode_ints(np.asarray(mx.mont_mul_mxu(A, B, mc, fc, lazy=False)), fp)
    assert got == [x * y % fp.p for x, y in zip(a, b)]
    z = mx.mont_mul_mxu(A, B, mc, fc, lazy=True)
    expect = [x * y % fp.p for x, y in zip(a, b)]
    for _ in range(6):
        z = mx.mont_sqr_mxu(z, mc, fc, lazy=True)
        expect = [v * v % fp.p for v in expect]
    got = lo.decode_ints(np.asarray(lo.canonicalize(z, fc)), fp)
    assert got == expect
