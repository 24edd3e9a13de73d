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


@pytest.mark.parametrize("streams", [2, 3])
def test_mxu_multi_stream_fused(streams):
    """Block-diagonal stream-fused constant-conv matmuls (the K>=128
    experiment) are bit-exact per stream and closed under lazy chains."""
    fp = get_field("vesta")
    fc = lo.field_consts(fp, mul_impl="mxu")
    mc = mx.mxu_consts(fc, streams=streams)
    rng = np.random.default_rng(31)
    Bs = 4
    vals = [
        (
            [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p
             for _ in range(Bs)],
            [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p
             for _ in range(Bs)],
        )
        for _ in range(streams)
    ]
    pairs = [(lo.encode_ints(a, fp), lo.encode_ints(b, fp)) for a, b in vals]
    outs = mx.mont_mul_mxu_multi(pairs, mc, fc, lazy=False)
    for (a, b), o in zip(vals, outs):
        got = lo.decode_ints(np.asarray(o), fp)
        assert got == [x * y % fp.p for x, y in zip(a, b)]
    # lazy squaring chain per stream through the fused path
    zs = mx.mont_mul_mxu_multi(pairs, mc, fc, lazy=True)
    expect = [[x * y % fp.p for x, y in zip(a, b)] for a, b in vals]
    for _ in range(4):
        zs = mx.mont_mul_mxu_multi(
            [(z, z) for z in zs], mc, fc, lazy=True, sqr=True
        )
        expect = [[v * v % fp.p for v in e] for e in expect]
    for z, e in zip(zs, expect):
        assert lo.decode_ints(np.asarray(lo.canonicalize(z, fc)), fp) == e


@pytest.mark.skipif(
    not os.environ.get("ANEMOI_FULL_PARITY"),
    reason="chain3 is a measured-and-rejected experimental path; its "
    "~90 s trace rides the CI full-parity job (suite budget)",
)
def test_chain3_ladder_matches_golden():
    """exp_inv_alpha with ladder=chain3 + mul_impl=mxu (fused multi-stream)
    equals pow(x, 1/alpha, p)."""
    fp = get_field("vesta")
    fc = lo.field_consts(fp, mul_impl="mxu", ladder="chain3")
    assert fc.mxu.streams == 3 and fc.mxu.w_pprime_bd is not None
    rng = np.random.default_rng(32)
    xs = [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p
          for _ in range(6)]  # 6 lanes -> 3 streams of 2
    X = lo.encode_ints(xs, fp)
    out = lo.exp_inv_alpha(X, fc)
    got = lo.decode_ints(np.asarray(out), fp)
    assert got == [pow(x, fp.inv_alpha, fp.p) for x in xs]
