"""Debug-mode value guards (SURVEY.md section 5: the TPU answer to the
reference's "no unsafe + clippy" static gates is runtime range checking of
the limb representation invariants)."""

from __future__ import annotations

import os

import numpy as np

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from ..ff.limb_ops import decode_ints

DEBUG = bool(os.environ.get("ANEMOI_DEBUG"))


def check_limbs(
    arr,
    fp: FieldParams,
    *,
    lazy: bool = False,
    relaxed: bool = False,
    what: str = "value",
):
    """Assert 13-bit digits (relaxed=True allows the lazy-sweep residue
    <= 2^13 + 2^4, limb_ops._sweep_keep_top) and value < p (lazy=True:
    < 2p).  Host-side; intended for tests and ANEMOI_DEBUG runs."""
    a = np.asarray(arr)
    digit_max = LIMB_MASK + (1 << 5) if relaxed else LIMB_MASK
    assert a.dtype == np.int32, f"{what}: dtype {a.dtype}"
    assert a.min() >= 0 and a.max() <= digit_max, (
        f"{what}: digit out of range [{a.min()}, {a.max()}]"
    )
    bound = 2 * fp.p if lazy else fp.p
    flat = a.reshape(fp.n_limbs, -1)
    vals = decode_ints(flat, fp, mont=False)
    bad = [v for v in vals if v >= bound]
    assert not bad, f"{what}: {len(bad)} values exceed {'2p' if lazy else 'p'}"


def maybe_check(arr, fp: FieldParams, **kw):
    if DEBUG:
        check_limbs(arr, fp, **kw)
