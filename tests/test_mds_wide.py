"""Wide-instance MDS paths (reference traits.rs:129-294).

The shipped instantiations only exercise 1/2 columns; the reference also
carries fast paths for 3-6 columns (mds_internal, circulant products) and a
generic matrix fallback.  These tests pin the golden model's versions and
the batched jnp versions against each other on synthetic wide instances.
"""

import dataclasses

import numpy as np
import pytest

from anemoi_tpu.ff import golden
from anemoi_tpu.ff import limb_ops as lo
from anemoi_tpu.fields.params import get_field, get_instance
from anemoi_tpu.modes.batched import decode_states, encode_states
from anemoi_tpu.permutation.batched import _mds_layer


def _wide_instance(cols, mds=None):
    base = get_instance("vesta", "anemoi_2_1")
    return dataclasses.replace(
        base,
        name=f"synthetic_{2 * cols}_{2 * cols - 1}",
        width=2 * cols,
        rate=2 * cols - 1,
        columns=cols,
        mds=mds,
    )


def _rand_state(rng, width, p):
    return [int(rng.integers(0, 1 << 62)) % p for _ in range(width)]


@pytest.mark.parametrize("cols", [3, 4, 5, 6])
def test_wide_mds_golden_vs_batched(cols):
    """Batched limb implementation == golden big-int model, cols 3-6."""
    inst = _wide_instance(cols)
    fp = inst.field
    fc = lo.field_consts(fp)
    rng = np.random.default_rng(1234 + cols)
    states = [_rand_state(rng, inst.width, fp.p) for _ in range(4)]
    want = [golden.mds_layer(inst, s) for s in states]

    # encode as (width, L, B) Montgomery limbs, run the batched layer
    arr = encode_states(inst, states)  # (width, L, B)
    parts = [arr[i] for i in range(inst.width)]
    out_parts = _mds_layer(parts, cols, fc)
    got = decode_states(inst, np.stack(out_parts))
    assert got == want


@pytest.mark.parametrize("cols", [3, 4])
def test_generic_mds_fallback_matches_fast_path(cols):
    """The generic matrix fallback (traits.rs:272-293) agrees with the
    dedicated mds_internal path when given the equivalent matrix."""
    fp = get_field("vesta")
    inst = _wide_instance(cols)
    # extract the matrix of mds_internal by applying it to unit vectors
    mat = np.zeros((cols, cols), dtype=object)
    for j in range(cols):
        unit = [0] * cols
        unit[j] = 1
        col = golden.mds_internal(inst, unit)
        for i in range(cols):
            mat[i, j] = col[i]
    mds = tuple(int(mat[i, j]) for i in range(cols) for j in range(cols))

    # a >6-column instance would hit the fallback; force it by constructing
    # an instance whose columns match but routing through the generic path
    generic = dataclasses.replace(inst, mds=mds)
    rng = np.random.default_rng(99 + cols)
    for _ in range(4):
        s = _rand_state(rng, inst.width, fp.p)
        fast = golden.mds_layer(inst, s)
        # call the fallback directly: temporarily treat columns as "other"
        got = _generic_mds(generic, s)
        assert got == fast


def _generic_mds(inst, state):
    """Golden generic fallback, exercised standalone (mirrors the cols>6
    branch of golden.mds_layer)."""
    p = inst.field.p
    cols = inst.columns
    s = list(state)
    x_in = s[:cols]
    y_in = s[cols + 1 :] + s[cols : cols + 1]
    x = [
        sum(inst.mds[i * cols + j] * x_in[j] for j in range(cols)) % p
        for i in range(cols)
    ]
    y = [
        sum(inst.mds[i * cols + j] * y_in[j] for j in range(cols)) % p
        for i in range(cols)
    ]
    return golden._pht(x + y, cols, p)


def test_generic_mds_requires_matrix():
    inst = _wide_instance(7)
    with pytest.raises(ValueError):
        golden.mds_layer(inst, [1] * 14)
