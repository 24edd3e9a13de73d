"""Multi-limb Montgomery field arithmetic on int32 lanes.

This is the TPU-native replacement for the reference's external arkworks
field backend (ark-ff Montgomery Fp256/Fp384, reference Cargo.toml:15-24):
every operation is expressed as elementwise int32 VPU work over a batch axis.

Representation
--------------
A batch of B field elements is an int32 array of shape (L, B): limb-major,
little-endian base-2^13 digits, batch on the minor (lane) axis.  13-bit limbs
are chosen because the TPU VPU has no widening multiply: a product of two
13-bit limbs fits in 26 bits, so a full schoolbook column sum of up to
L <= 30 products stays below 2^31 and never overflows an int32 accumulator.

  field bits | L limbs | R = 2^(13L)
  253..255   | 20      | 2^260
  377        | 29      | 2^377
  381        | 30      | 2^390

Values are kept in Montgomery form (x*R mod p) between operations, exactly
like the reference's arkworks backend; `to_mont`/`from_mont` convert at the
boundary.

All functions are pure jnp on (L, B) arrays so the very same code runs
  * under jax.jit on CPU/TPU (the reference backend used by the test suite),
  * inside Pallas TPU kernels (pallas_backend.py), where the Python-level
    limb loops unroll into straight-line VPU code.

Host-side constants are numpy arrays inside `FieldConsts`; referencing them
during tracing embeds them as literals, which is what both jit and Mosaic
want for small constant tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import (
    LIMB_BITS,
    LIMB_MASK,
    FieldParams,
    InstanceParams,
    limbs_from_int,
)


class FieldConsts(NamedTuple):
    """Host-side (numpy) constants driving the limb kernels for one field."""

    name: str
    n_limbs: int
    n0_inv: int  # -p^-1 mod 2^13
    p_limbs: np.ndarray  # (L,)   int32
    r2_limbs: np.ndarray  # (L,)  R^2 mod p          (to_mont multiplier)
    one_limbs: np.ndarray  # (L,) plain integer 1    (from_mont multiplier)
    one_mont: np.ndarray  # (L,)  R mod p            (Montgomery identity)
    beta_mont: np.ndarray  # (L,) beta in Montgomery form
    delta_mont: np.ndarray  # (L,) delta in Montgomery form
    inv_alpha_digits: np.ndarray  # (n_windows,) base-16 digits, MSB first


def field_consts(fp: FieldParams) -> FieldConsts:
    L = fp.n_limbs
    return FieldConsts(
        name=fp.name,
        n_limbs=L,
        n0_inv=fp.n0_inv,
        p_limbs=fp.p_limbs,
        r2_limbs=limbs_from_int(fp.R2, L),
        one_limbs=limbs_from_int(1, L),
        one_mont=limbs_from_int(fp.R, L),
        beta_mont=limbs_from_int(fp.to_mont(fp.beta), L),
        delta_mont=limbs_from_int(fp.to_mont(fp.delta), L),
        inv_alpha_digits=np.asarray(fp.inv_alpha_windows, dtype=np.int32),
    )


def _col(v):
    """(L,) constant (host numpy or traced row) -> (L, 1) broadcastable."""
    return jnp.asarray(v, dtype=jnp.int32).reshape(-1, 1)


# --------------------------------------------------------------------------
# carry / borrow chains
# --------------------------------------------------------------------------


def _carry_chain(rows: list):
    """Normalize a list of (B,) columns to 13-bit digits; returns (digits, carry).

    Sequential by construction (each carry feeds the next limb) but each step
    is a full-width vector op over the batch.
    """
    out = []
    carry = None
    for r in rows:
        t = r if carry is None else r + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out, carry


def _borrow_sub(z_rows: list, p_rows: list):
    """z - p limbwise; returns (diff mod 2^(13K), final_borrow in {0,1})."""
    out = []
    borrow = None
    for zi, pi in zip(z_rows, p_rows):
        t = zi - pi if borrow is None else zi - pi - borrow
        out.append(t & LIMB_MASK)
        borrow = (t >> 31) & 1  # sign bit: 1 iff t < 0 (t > -2^14 so exact)
    return out, borrow


def _rows(a):
    return [a[i] for i in range(a.shape[0])]


def _stack(rows):
    return jnp.stack(rows, axis=0)


def _cond_sub_p(z_rows: list, carry, fc: FieldConsts):
    """value = carry*2^(13L) + z in [0, 2p) -> value mod p as L limbs."""
    p_rows = [fc.p_limbs[i] for i in range(fc.n_limbs)]
    sub, borrow = _borrow_sub(z_rows, p_rows)
    # If the top carry is set the value certainly exceeds p (and the dropped
    # final borrow cancels the carry); otherwise subtract only when z >= p.
    if carry is None:
        sel = borrow == 0
    else:
        sel = (carry > 0) | (borrow == 0)
    return _stack([jnp.where(sel, s, z) for s, z in zip(sub, z_rows)])


# --------------------------------------------------------------------------
# modular add / sub / double
# --------------------------------------------------------------------------


def add_mod(a, b, fc: FieldConsts):
    """(a + b) mod p for a, b in [0, p)."""
    summed, carry = _carry_chain([a[i] + b[i] for i in range(fc.n_limbs)])
    return _cond_sub_p(summed, carry, fc)


def sub_mod(a, b, fc: FieldConsts):
    """(a - b) mod p for a, b in [0, p)."""
    diff, borrow = _borrow_sub(_rows(a), _rows(b))
    # add p back when the subtraction underflowed
    p_rows = [fc.p_limbs[i] for i in range(fc.n_limbs)]
    fixed, _ = _carry_chain([d + borrow * p for d, p in zip(diff, p_rows)])
    return _stack(fixed)


def double_mod(a, fc: FieldConsts):
    return add_mod(a, a, fc)


# --------------------------------------------------------------------------
# Montgomery multiplication (product-scan, 13-bit digits)
# --------------------------------------------------------------------------


_SWEEP_EVERY = 6  # iterations between partial carry sweeps (bounds in mont_mul/sqr)


def _sweep_keep_top(T):
    """Partial carry sweep of a (K, B) column array, leaving the top row
    unmasked (its overflow bits have nowhere to go; the caller keeps the
    array one row taller than the value needs).  Exact: digit+carry moves,
    nothing is dropped."""
    c = T >> LIMB_BITS
    low = T & LIMB_MASK
    shifted = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    out = low + shifted
    top = out[-1:] + ((T[-1:] >> LIMB_BITS) << LIMB_BITS)
    return jnp.concatenate([out[:-1], top], axis=0)


def _finish(T, fc: FieldConsts, lazy: bool):
    """Normalization of the (L+1, B) CIOS accumulator (value < 2p).

    lazy=True: two vectorized partial sweeps bound every digit by
    2^13 + 2^4 -- no sequential carry chain at all.  Because all rows are
    nonnegative and the value is < 2p < 2^(13L) (the limb budget reserves
    two spare bits), the top row is provably zero afterwards and is
    dropped.  The result is a relaxed-digit representation of a value
    < 2p: valid input for further Montgomery products (4p <= R) and for
    `canonicalize`.

    lazy=False: exact carry chain then conditional subtract -> [0, p),
    canonical digits.
    """
    L = fc.n_limbs
    if lazy:
        T = _sweep_keep_top(_sweep_keep_top(T))
        return T[:L]
    z, _carry = _carry_chain([T[i] for i in range(L + 1)])
    return _cond_sub_p(z[:L], None, fc)


def canonicalize(a, fc: FieldConsts):
    """Fold a lazy-domain value (< 2p, relaxed digits <= 2^13 + 2^4) into
    [0, p) with canonical digits: exact chain + conditional subtract."""
    z, carry = _carry_chain(_rows(a))
    # digits were relaxed, but the value < 2p < 2^(13L): no carry out
    return _cond_sub_p(z, carry, fc)


def mont_mul(a, b, fc: FieldConsts, *, lazy: bool = False):
    """Montgomery product a*b*R^-1 mod p on (L, B) int32 limb arrays.

    CIOS (coarsely-integrated operand scanning) over 13-bit digits: one pass
    per limb of `a`, each pass doing two row-aligned vector multiply-adds
    (a_i * b and m_i * p), then a one-row shift-down (exact carry of column 0
    folded into the new bottom row).  All row operations are aligned or
    static single-row shifts -- no scatter, no dynamic slicing -- which is
    what the Mosaic TPU compiler can lower.

    Inputs may be in the lazy domain (< 2p, canonical digits); the output is
    < 2p with lazy=True, < p otherwise.  Requires 4p <= R = 2^(13L), which
    the limb budget guarantees for every registered field.

    Overflow bound: each pass adds a_i*b + m_i*p < 2^27 per column; a partial
    carry sweep every _SWEEP_EVERY passes keeps columns below
    2^14 + _SWEEP_EVERY*2^27 < 2^30 (int32-safe with margin).
    """
    L = fc.n_limbs
    B = a.shape[1:]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)  # (L, 1)
    T = jnp.zeros((L + 1, *B), dtype=jnp.int32)
    for i in range(L):
        low = T[:L] + a[i] * b
        m = ((low[0] & LIMB_MASK) * n0) & LIMB_MASK  # (B,)
        low = low + m * p_col
        # column 0 is now divisible by 2^13: shift the array down one limb,
        # folding column 0's exact carry into the new bottom row.
        carry0 = low[0:1] >> LIMB_BITS
        T = jnp.concatenate(
            [low[1:2] + carry0, low[2:], T[L : L + 1],
             jnp.zeros((1, *B), dtype=jnp.int32)],
            axis=0,
        )
        if (i + 1) % _SWEEP_EVERY == 0 and i + 1 < L:
            T = _sweep_keep_top(T)
    return _finish(T, fc, lazy)


def mont_sqr(a, fc: FieldConsts, *, lazy: bool = False):
    """Montgomery squaring via symmetric CIOS: pass i multiplies a_i only by
    a[i:], doubling the off-diagonal terms -- ~45% fewer limb products than
    mont_mul(a, a).

    Placement: at pass i (after i shift-downs) the product a_i*a_j belongs
    at relative row j, so the slice lands at rows [i, L) -- a static
    two-piece concatenate, still Mosaic-friendly.

    Overflow: doubled products add < 3*2^26 per column per pass, so the
    _SWEEP_EVERY=4 cadence stays below 2^14 + 12*2^26 < 2^30.5.
    """
    L = fc.n_limbs
    B = a.shape[1:]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)
    T = jnp.zeros((L + 1, *B), dtype=jnp.int32)
    for i in range(L):
        prod = a[i] * a[i:]  # (L-i, B): diagonal + upper terms
        low = T[:L]
        # rows [i, L): + prod, and + prod again for the off-diagonal rows
        head = low[i:] + prod
        if i + 1 < L:
            head = jnp.concatenate([head[:1], head[1:] + prod[1:]], axis=0)
        low = head if i == 0 else jnp.concatenate([low[:i], head], axis=0)
        m = ((low[0] & LIMB_MASK) * n0) & LIMB_MASK
        low = low + m * p_col
        carry0 = low[0:1] >> LIMB_BITS
        T = jnp.concatenate(
            [low[1:2] + carry0, low[2:], T[L : L + 1],
             jnp.zeros((1, *B), dtype=jnp.int32)],
            axis=0,
        )
        if (i + 1) % _SWEEP_EVERY == 0 and i + 1 < L:
            T = _sweep_keep_top(T)
    return _finish(T, fc, lazy)


# --------------------------------------------------------------------------
# domain conversion and constant multiply
# --------------------------------------------------------------------------


def to_mont(a, fc: FieldConsts):
    return mont_mul(a, jnp.broadcast_to(_col(fc.r2_limbs), a.shape), fc)


def from_mont(a, fc: FieldConsts):
    return mont_mul(a, jnp.broadcast_to(_col(fc.one_limbs), a.shape), fc)


def mul_const(a, const_limbs: np.ndarray, fc: FieldConsts):
    """Multiply by a host constant already in Montgomery form."""
    return mont_mul(a, jnp.broadcast_to(_col(const_limbs), a.shape), fc)


def add_const(a, const_limbs: np.ndarray, fc: FieldConsts):
    c = _col(const_limbs)
    summed, carry = _carry_chain([a[i] + c[i] for i in range(fc.n_limbs)])
    return _cond_sub_p(summed, carry, fc)


# --------------------------------------------------------------------------
# fixed-window exponentiation by the static 1/alpha exponent
# --------------------------------------------------------------------------


def exp_inv_alpha(x, fc: FieldConsts, *, unroll: bool = False):
    """x^(1/alpha) via fixed 4-bit windows over the static exponent.

    Builds the table x^0..x^15 (14 Montgomery products), then walks the
    base-16 digits of inv_alpha MSB-first: 4 squarings + one table multiply
    per digit.  The digit string is a compile-time constant; with
    `unroll=False` the walk is a lax.fori_loop gathering the digit and table
    row dynamically (compact XLA graph), with `unroll=True` it is fully
    unrolled straight-line code with static table picks (Pallas kernels).

    Replaces the reference's hand-derived per-field addition chains
    (reference: src/<field>/sbox.rs exp_by_inv_alpha).
    """
    # table[k] = x^k in Montgomery form, k = 0..15; the whole ladder runs in
    # the lazy [0, 2p) domain, canonicalized once at the end.
    one = jnp.broadcast_to(_col(fc.one_mont), x.shape)
    x2 = mont_sqr(x, fc, lazy=True)
    table = [one, x, x2]
    for k in range(3, 16):
        if k % 2 == 0:
            table.append(mont_sqr(table[k // 2], fc, lazy=True))
        else:
            table.append(mont_mul(table[k - 1], x, fc, lazy=True))

    digits = fc.inv_alpha_digits
    if unroll:
        acc = table[int(digits[0])]
        for d in digits[1:].tolist():
            for _ in range(4):
                acc = mont_sqr(acc, fc, lazy=True)
            if d:
                acc = mont_mul(acc, table[d], fc, lazy=True)
        return canonicalize(acc, fc)

    table_arr = jnp.stack(table, axis=0)  # (16, L, B)
    digits_arr = jnp.asarray(digits)

    def body(i, acc):
        for _ in range(4):
            acc = mont_sqr(acc, fc, lazy=True)
        d = digits_arr[i]
        t = jax.lax.dynamic_index_in_dim(table_arr, d, axis=0, keepdims=False)
        return mont_mul(acc, t, fc, lazy=True)

    acc = table_arr[int(digits[0])]
    acc = jax.lax.fori_loop(1, digits.shape[0], body, acc)
    return canonicalize(acc, fc)


# --------------------------------------------------------------------------
# encode / decode helpers (host side)
# --------------------------------------------------------------------------


def encode_ints(values, fp: FieldParams, *, mont: bool = True) -> np.ndarray:
    """Python ints -> (L, B) int32 limbs (optionally Montgomery form)."""
    L = fp.n_limbs
    out = np.zeros((L, len(values)), dtype=np.int32)
    for b, v in enumerate(values):
        v = fp.to_mont(v) if mont else v % fp.p
        out[:, b] = limbs_from_int(v, L)
    return out


def decode_ints(arr: np.ndarray, fp: FieldParams, *, mont: bool = True) -> list:
    """(L, B) int32 limbs -> list of python ints."""
    arr = np.asarray(arr)
    out = []
    for b in range(arr.shape[1]):
        v = 0
        for i in range(arr.shape[0]):
            v += int(arr[i, b]) << (LIMB_BITS * i)
        out.append(fp.from_mont(v) if mont else v % fp.p)
    return out
