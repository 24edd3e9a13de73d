"""int32 limb arithmetic vs Python-int ground truth, across all 7 fields.

These run the jnp ops eagerly on small batches -- cheap, no jit compile --
and pin down every arithmetic primitive the batched kernels are built from.
"""

import numpy as np
import pytest

from anemoi_tpu.ff import limb_ops as lo
from anemoi_tpu.fields.params import FIELD_NAMES, get_field


def _rand_elems(fp, n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        v = 0
        for _ in range(5):
            v = (v << 64) | int(rng.integers(0, 2**63))
        out.append(v % fp.p)
    # corner cases
    out[:4] = [0, 1, fp.p - 1, fp.p // 2]
    return out


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_mont_mul_sqr(field):
    fp = get_field(field)
    fc = lo.field_consts(fp)
    a = _rand_elems(fp, 8, 1)
    b = _rand_elems(fp, 8, 2)
    A, B = lo.encode_ints(a, fp), lo.encode_ints(b, fp)
    got = lo.decode_ints(np.asarray(lo.mont_mul(A, B, fc)), fp)
    assert got == [x * y % fp.p for x, y in zip(a, b)]
    got = lo.decode_ints(np.asarray(lo.mont_sqr(A, fc)), fp)
    assert got == [x * x % fp.p for x in a]


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_add_sub_double(field):
    fp = get_field(field)
    fc = lo.field_consts(fp)
    a = _rand_elems(fp, 8, 3)
    b = _rand_elems(fp, 8, 4)
    A, B = lo.encode_ints(a, fp), lo.encode_ints(b, fp)
    assert lo.decode_ints(np.asarray(lo.add_mod(A, B, fc)), fp) == [
        (x + y) % fp.p for x, y in zip(a, b)
    ]
    assert lo.decode_ints(np.asarray(lo.sub_mod(A, B, fc)), fp) == [
        (x - y) % fp.p for x, y in zip(a, b)
    ]
    assert lo.decode_ints(np.asarray(lo.double_mod(A, fc)), fp) == [
        2 * x % fp.p for x in a
    ]


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_domain_conversion_roundtrip(field):
    fp = get_field(field)
    fc = lo.field_consts(fp)
    a = _rand_elems(fp, 8, 5)
    raw = lo.encode_ints(a, fp, mont=False)
    m = lo.to_mont(raw, fc)
    assert lo.decode_ints(np.asarray(m), fp, mont=True) == a
    back = lo.from_mont(m, fc)
    assert lo.decode_ints(np.asarray(back), fp, mont=False) == a


@pytest.mark.parametrize("field", ["vesta", "bls12_377", "ed_on_bls12_377"])
def test_exp_inv_alpha(field):
    import jax

    fp = get_field(field)
    fc = lo.field_consts(fp)
    a = _rand_elems(fp, 4, 6)
    A = lo.encode_ints(a, fp)
    exp = jax.jit(lambda x: lo.exp_inv_alpha(x, fc))
    got = lo.decode_ints(np.asarray(exp(A)), fp)
    assert got == [pow(x, fp.inv_alpha, fp.p) for x in a]


_CHAIN_FIELDS = (
    FIELD_NAMES
    if __import__("os").environ.get("ANEMOI_FULL_PARITY")
    # vesta only by default: the L=30 chain is a ~1 min trace+lower and
    # the chain ladder is not the shipped 30-limb default (sw4 is); the
    # full field sweep incl. both limb widths runs in the CI parity job
    else ["vesta"]
)


@pytest.mark.parametrize("field", _CHAIN_FIELDS)
def test_exp_inv_alpha_chain(field):
    """The reference's transcribed addition chains (ladder="chain") agree
    with pow(x, 1/alpha) for every field (reference sbox.rs test_alpha
    analogue, plus corner cases 1 and p-1)."""
    fp = get_field(field)
    fc = lo.field_consts(fp, ladder="chain")
    a = _rand_elems(fp, 6, 15)
    a[0] = 1
    A = lo.encode_ints(a, fp)
    got = lo.decode_ints(np.asarray(lo.exp_inv_alpha(A, fc)), fp)
    assert got == [pow(x, fp.inv_alpha, fp.p) for x in a]


@pytest.mark.skipif(
    not __import__("os").environ.get("ANEMOI_FULL_PARITY"),
    reason="the chainseg fori+switch graph is a multi-minute XLA:CPU "
    "compile; rides the CI full-parity job",
)
def test_exp_inv_alpha_chainseg_carry_fallback():
    """The segmented chain's loop-carried-tuple fallback (jit/CPU path --
    the Pallas kernels use the VMEM register file instead) agrees with
    pow(x, 1/alpha); exercises a segment size that splits mid-chain."""
    fp = get_field("vesta")
    fc = lo.field_consts(fp, ladder="chainseg64")
    a = _rand_elems(fp, 4, 21)
    a[0] = fp.p - 1
    A = lo.encode_ints(a, fp)
    got = lo.decode_ints(
        np.asarray(lo.exp_inv_alpha(A, fc)), fp
    )
    assert got == [pow(x, fp.inv_alpha, fp.p) for x in a]


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_cios2_mont_mul(field):
    """Radix-2^26 CIOS (two digits per pass): canonical result and a lazy
    squaring chain."""
    fp = get_field(field)
    fc = lo.field_consts(fp, mul_impl="cios2")
    a = _rand_elems(fp, 8, 10)
    b = _rand_elems(fp, 8, 11)
    A, B = lo.encode_ints(a, fp), lo.encode_ints(b, fp)
    got = lo.decode_ints(np.asarray(lo.mont_mul(A, B, fc)), fp)
    assert got == [x * y % fp.p for x, y in zip(a, b)]
    z = lo.mont_mul(A, B, fc, lazy=True)
    expect = [x * y % fp.p for x, y in zip(a, b)]
    for _ in range(6):
        z = lo.mont_sqr(z, fc, lazy=True)
        expect = [v * v % fp.p for v in expect]
    got = lo.decode_ints(np.asarray(lo.canonicalize(z, fc)), fp)
    assert got == expect


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_cios2s_mont_sqr(field):
    """Radix-2^26 symmetric squaring (mul_impl="cios2s"): canonical result
    and a lazy squaring chain, with the lazy-domain limb invariant checked
    at every step (utils.debug)."""
    from anemoi_tpu.utils.debug import check_limbs

    fp = get_field(field)
    fc = lo.field_consts(fp, mul_impl="cios2s")
    a = _rand_elems(fp, 8, 12)
    b = _rand_elems(fp, 8, 13)
    A, B = lo.encode_ints(a, fp), lo.encode_ints(b, fp)
    got = lo.decode_ints(np.asarray(lo.mont_mul(A, B, fc)), fp)
    assert got == [x * y % fp.p for x, y in zip(a, b)]
    got = lo.decode_ints(np.asarray(lo.mont_sqr(A, fc)), fp)
    assert got == [x * x % fp.p for x in a]
    z = lo.mont_mul(A, B, fc, lazy=True)
    expect = [x * y % fp.p for x, y in zip(a, b)]
    for _ in range(6):
        z = lo.mont_sqr(z, fc, lazy=True)
        expect = [v * v % fp.p for v in expect]
    got = lo.decode_ints(np.asarray(lo.canonicalize(z, fc)), fp)
    assert got == expect


@pytest.mark.parametrize("field", ["vesta", "bls12_381"])
def test_lazy_domain_invariants(field):
    """The lazy [0,2p) CIOS domain invariant, checked via utils.debug: lazy
    products stay below 2p with relaxed digits; canonicalize restores
    canonical digits < p."""
    from anemoi_tpu.utils.debug import check_limbs

    fp = get_field(field)
    fc = lo.field_consts(fp, mul_impl="cios2")
    a = _rand_elems(fp, 8, 14)
    A = lo.encode_ints(a, fp)
    z = lo.mont_sqr(A, fc, lazy=True)
    for _ in range(3):
        z = lo.mont_sqr(z, fc, lazy=True)
    check_limbs(np.asarray(z), fp, lazy=True, relaxed=True, what="lazy chain")
    out = lo.canonicalize(z, fc)
    check_limbs(np.asarray(out), fp, lazy=False, what="canonicalized")


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_parallel_mont_mul(field):
    """Latency-optimized parallel Montgomery (m-vector via constant conv):
    canonical result, and an 8-deep lazy [0,3p) squaring chain."""
    fp = get_field(field)
    fc = lo.field_consts(fp, mul_impl="parallel")
    a = _rand_elems(fp, 8, 8)
    b = _rand_elems(fp, 8, 9)
    A, B = lo.encode_ints(a, fp), lo.encode_ints(b, fp)
    got = lo.decode_ints(np.asarray(lo.mont_mul(A, B, fc)), fp)
    assert got == [x * y % fp.p for x, y in zip(a, b)]
    z = lo.mont_mul(A, B, fc, lazy=True)
    expect = [x * y % fp.p for x, y in zip(a, b)]
    for _ in range(8):
        z = lo.mont_sqr(z, fc, lazy=True)
        expect = [v * v % fp.p for v in expect]
    got = lo.decode_ints(np.asarray(lo.canonicalize(z, fc)), fp)
    assert got == expect


@pytest.mark.parametrize("field", FIELD_NAMES)
def test_const_ops(field):
    fp = get_field(field)
    fc = lo.field_consts(fp)
    a = _rand_elems(fp, 8, 7)
    A = lo.encode_ints(a, fp)
    got = lo.decode_ints(np.asarray(lo.mul_const(A, fc.beta_mont, fc)), fp)
    assert got == [x * fp.beta % fp.p for x in a]
    got = lo.decode_ints(np.asarray(lo.add_const(A, fc.delta_mont, fc)), fp)
    assert got == [(x + fp.delta) % fp.p for x in a]
