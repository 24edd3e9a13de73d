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
  377        | 30      | 2^390
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
    pprime_limbs: np.ndarray  # (L,) digits of -p^-1 mod R
    mul_impl: str = "cios"  # "cios" (serial digit recurrence) | "parallel"
    # (2, S) sliding-window schedule: row 0 = squarings per step, row 1 =
    # odd-table index (window_value - 1) // 2 (see params.py)
    sw_sched: np.ndarray | None = None
    # "fixed4" (base-16 digits) | "sw4" (sliding window) | "chain" (the
    # reference's hand-derived per-field addition chain, as data)
    ladder: str = "fixed4"
    # straight-line addition-chain schedule: tuple of ("sqr", dst, src) /
    # ("mul", dst, a, b) register ops; result in chain_ops[-1][1]
    chain_ops: tuple | None = None
    # MXU constant-conv operands (mxu_ops.MxuConsts) when mul_impl="mxu";
    # host numpy outside kernels, rebound to traced VMEM refs inside
    # (pallas_backend._kernel_fc)
    mxu: object = None
    # (2L+1, B) VMEM scratch ref for in-place bilinear conv accumulation
    # (mul_impl="mxu2", Pallas kernels only; None -> tree-sum fallback)
    sos_scratch: object = None
    # (n_carried_regs * stride, B) VMEM register-file scratch for the
    # segmented chain ladder (ladder="chainseg*", Pallas kernels only;
    # None -> loop-carried tuple fallback for jit/CPU)
    seg_scratch: object = None
    # Host-side (python int) copies of p's digits.  Inside a Pallas kernel
    # p_limbs is rebound to a traced VMEM row (pallas_backend._kernel_fc);
    # the conditional-subtract/borrow fixup paths want per-limb *scalar*
    # constants (scalar immediates under Mosaic) instead of dynamic extracts
    # from that row.  NOTE: rewriting the m*p products as per-row scalar
    # multiplies (skipping the 9 zero digits of the Pallas/Vesta p) was
    # measured 1.7x SLOWER than the dense broadcast m * p_col form -- Mosaic
    # executes full (L, B) tile ops at much higher lane utilization than
    # row-wise (B,) ops, so fewer-but-rowwise multiplies lose.
    p_host: tuple | None = None


_CHAIN_CACHE: dict | None = None


def _load_chain(field: str) -> tuple:
    """Per-field inv-alpha addition chain, transcribed from the reference
    (reference: src/<field>/sbox.rs:28-322) by
    tools/extract_addition_chains.py -- schedule data, like the round
    constants."""
    global _CHAIN_CACHE
    if _CHAIN_CACHE is None:
        import json
        from pathlib import Path

        path = Path(__file__).parent.parent / "fields" / "data" / "inv_alpha_chains.json"
        _CHAIN_CACHE = json.loads(path.read_text())
    chain = _CHAIN_CACHE[field]
    ops = tuple(tuple(op) for op in chain["ops"])
    assert ops[-1][1] == chain["out"]
    return ops


def field_consts(
    fp: FieldParams, mul_impl: str = "cios", ladder: str = "fixed4"
) -> FieldConsts:
    if ladder not in ("fixed4", "sw4", "chain", "chain2", "chain3") and not (
        ladder.startswith("chainseg")
        and (ladder[8:] == "" or ladder[8:].isdigit())
    ):
        raise ValueError(
            f"unknown ladder {ladder!r}; expected "
            "'fixed4' | 'sw4' | 'chain' | 'chain2'/'chain3' "
            "(multi-stream interleave; with mul_impl='mxu*' the streams' "
            "constant convs fuse into block-diagonal MXU matmuls) | "
            "'chainseg[N]' (N-op straight-line segments under a "
            "fori_loop+switch: bounded Mosaic compile time)"
        )
    if mul_impl not in (
        "cios", "cios2", "cios2s", "parallel", "mxu", "mxu2", "mxu3", "mxus"
    ) and not (mul_impl.startswith("cios") and mul_impl[4:].isdigit()):
        raise ValueError(
            f"unknown mul_impl {mul_impl!r}; expected cios | cios2 | cios2s"
            " | cios<k> | parallel | mxu | mxu2 | mxu3 | mxus"
        )
    L = fp.n_limbs
    R = 1 << (LIMB_BITS * L)
    fc = FieldConsts(
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
        pprime_limbs=limbs_from_int((-pow(fp.p, -1, R)) % R, L),
        mul_impl=mul_impl,
        p_host=tuple(int(v) for v in fp.p_limbs),
        sw_sched=np.asarray(
            [[s for s, _ in fp.inv_alpha_sliding_schedule],
             [(v - 1) // 2 for _, v in fp.inv_alpha_sliding_schedule]],
            dtype=np.int32,
        ),
        ladder=ladder,
        chain_ops=(_load_chain(fp.name) if ladder.startswith("chain") else None),
    )
    if mul_impl.startswith("mxu"):
        from .mxu_ops import mxu_consts

        fc = fc._replace(mxu=mxu_consts(fc, streams=chain_streams(ladder)))
    return fc


def chain_streams(ladder: str) -> int:
    """Stream count encoded in the ladder name (chain2 -> 2, chain3 -> 3);
    chainseg* is always single-stream."""
    if ladder.startswith("chainseg"):
        return 1
    return int(ladder[5:]) if ladder.startswith("chain") and ladder[5:] else 1


def chain_seg_size(ladder: str) -> int:
    """Ops per straight-line segment encoded in the ladder name
    (chainseg64 -> 64; bare chainseg -> the measured default)."""
    return int(ladder[8:]) if ladder[8:] else 64


def _col(v):
    """(L,) constant (host numpy or traced row) -> (L, 1) broadcastable."""
    return jnp.asarray(v, dtype=jnp.int32).reshape(-1, 1)


def _p_rows_host(fc: FieldConsts):
    """p's digits as per-limb scalars: host ints when available (scalar
    immediates under Mosaic), else elements of the traced constant row."""
    if fc.p_host is not None:
        return list(fc.p_host)
    return [fc.p_limbs[i] for i in range(fc.n_limbs)]


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
    p_rows = _p_rows_host(fc)
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
    p_rows = _p_rows_host(fc)
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
    """Fold a lazy-domain value (< 3p, relaxed digits <= 2^13 + 2^4) into
    [0, p) with canonical digits: exact chain + two conditional subtracts
    (the CIOS lazy domain is [0, 2p), the parallel one [0, 3p))."""
    z, carry = _carry_chain(_rows(a))
    # digits were relaxed, but the value < 3p < 2^(13L): no carry out
    first = _cond_sub_p(z, carry, fc)
    return _cond_sub_p(_rows(first), None, fc)


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
    if fc.mul_impl == "parallel":
        return mont_mul_parallel(a, b, fc, lazy=lazy)
    if fc.mul_impl.startswith("mxu"):
        from .mxu_ops import mont_mul_mxu

        return mont_mul_mxu(a, b, fc.mxu, fc, lazy=lazy,
                            scratch=fc.sos_scratch)
    if fc.mul_impl in ("cios2", "cios2s"):
        return mont_mul_cios2(a, b, fc, lazy=lazy)
    if fc.mul_impl.startswith("cios") and fc.mul_impl not in ("cios", "cios2"):
        return mont_mul_ciosk(a, b, fc, int(fc.mul_impl[4:]), lazy=lazy)
    L = fc.n_limbs
    B = a.shape[1:]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)  # (L, 1)
    T = jnp.zeros((L + 1, *B), dtype=jnp.int32)
    for i in range(L):
        low = T[:L] + a[i] * b
        # pre-multiply mask elided: int32 wrap is mod 2^32 and 2^13 | 2^32,
        # so the low 13 bits of low[0]*n0 are exact for any column value
        m = (low[0] * n0) & LIMB_MASK  # (B,)
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


def mont_mul_cios2(a, b, fc: FieldConsts, *, lazy: bool = False):
    """Radix-2^26 CIOS: two 13-bit digits of `a` (and two reduction digits
    m0, m1) per pass -- half the serial passes and shift-downs of the
    radix-2^13 loop.  Row placement stays static: a_i*b lands at rows
    [0, L), a_{i+1}*b at rows [1, L+1), via zero-row concatenates.

    The m digits skip the pre-multiply mask: int32 products wrap mod 2^32
    and 2^13 | 2^32, so the low 13 bits of `col * n0` are exact for any
    int32 column value -- only the post-multiply mask is needed.

    Overflow: each pass adds up to 4 products per column (< 2^28.1); a sweep
    every 5 passes (10 digits) keeps columns < 2^14 + 5*2^28.1 < 2^30.5
    (int32-safe with margin).  Requires even L (all registered fields use
    L = 20 or 30).
    """
    L = fc.n_limbs
    assert L % 2 == 0
    B = a.shape[1:]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)
    zero1 = jnp.zeros((1, *B), dtype=jnp.int32)
    T = None
    for i in range(0, L, 2):
        contrib = jnp.concatenate([a[i] * b, zero1], axis=0) + jnp.concatenate(
            [zero1, a[i + 1] * b], axis=0
        )
        T = contrib if T is None else T + contrib
        m0 = (T[0] * n0) & LIMB_MASK
        T = T + jnp.concatenate([m0 * p_col, zero1], axis=0)
        carry0 = T[0:1] >> LIMB_BITS  # column 0 now divisible by 2^13
        m1 = ((T[1] + carry0[0]) * n0) & LIMB_MASK
        T = T + jnp.concatenate([zero1, m1 * p_col], axis=0)
        carry1 = (T[1:2] + carry0) >> LIMB_BITS  # column 1 exact carry
        T = jnp.concatenate([T[2:3] + carry1, T[3:], zero1, zero1], axis=0)
        if (i // 2 + 1) % 5 == 0 and i + 2 < L:
            T = _sweep_keep_top(T)
    return _finish(T, fc, lazy)


def mont_mul_ciosk(a, b, fc: FieldConsts, k: int, *, lazy: bool = False):
    """Radix-2^(13k) CIOS: k multiplier digits and k reduction digits per
    pass.  Serial dependencies per digit drop from ~6 (radix-2^13) to
    ~3 + 3/k; each pass does 2k row-aligned vector multiply-adds placed by
    zero-row concatenates, one k-row shift-down, and one sweep.

    Overflow: a column receives up to 2k products (< 2k * 2^26.01) per pass;
    sweeping every pass keeps columns < 2^14 + 2k*2^26.1 < 2^31 for k <= 10.
    Requires k | L.
    """
    L = fc.n_limbs
    assert L % k == 0
    B = a.shape[1:]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)
    rows = L + k  # spare top row beyond the k-1 staggered offsets
    zerok = jnp.zeros((k, *B), dtype=jnp.int32)
    T = jnp.zeros((rows, *B), dtype=jnp.int32)
    for i in range(0, L, k):
        contrib = _pad_rows(a[i] * b, 0, rows)
        for j in range(1, k):
            contrib = contrib + _pad_rows(a[i + j] * b, j, rows)
        T = T + contrib
        carry = None
        for j in range(k):
            col = T[j] if carry is None else T[j] + carry
            m = (col * n0) & LIMB_MASK  # pre-multiply mask elided (wrap-exact)
            T = T + _pad_rows(m * p_col, j, rows)
            col = T[j] if carry is None else T[j] + carry
            carry = col >> LIMB_BITS  # column j now divisible by 2^13
        T = jnp.concatenate(
            [T[k : k + 1] + carry, T[k + 1 :], zerok], axis=0
        )
        if i + k < L:
            T = _sweep_keep_top(T)
    # value < 2p fits L digits; rows L..L+k-1 are provably zero after the
    # lazy sweeps (all rows nonnegative, value < 2^(13L))
    if lazy:
        T = _sweep_keep_top(_sweep_keep_top(T))
        return T[:L]
    z, _carry = _carry_chain([T[i] for i in range(L + 1)])
    return _cond_sub_p(z[:L], None, fc)


def _pad_rows(x, start, rows):
    """Place x at rows [start, start+len(x)) of a `rows`-tall zero array."""
    B = x.shape[1:]
    pieces = []
    if start:
        pieces.append(jnp.zeros((start, *B), dtype=jnp.int32))
    pieces.append(x)
    rest = rows - start - x.shape[0]
    if rest:
        pieces.append(jnp.zeros((rest, *B), dtype=jnp.int32))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)


def mont_sqr_cios2(a, fc: FieldConsts, *, lazy: bool = False):
    """Radix-2^26 CIOS squaring with product symmetry: pass i contributes
    a_i * a[i:] (rows [i, L)) and a_{i+1} * a[i+1:] (rows [i+2, L+1)), each
    doubled off the diagonal -- ~45% fewer limb products than
    mont_mul_cios2(a, a).

    Overflow: a column receives at most 6 products (< 6*2^26.01) per pass;
    sweeping every 2 passes keeps columns < 2^14 + 12*2^26.1 < 2^30.7.
    """
    L = fc.n_limbs
    assert L % 2 == 0
    B = a.shape[1:]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)
    zero1 = jnp.zeros((1, *B), dtype=jnp.int32)
    T = None
    for i in range(0, L, 2):
        prod0 = a[i] * a[i:]  # columns i+j for j >= i -> rows [i, L)
        contrib = _pad_rows(prod0, i, L + 1)
        if i + 1 < L:
            contrib = contrib + _pad_rows(prod0[1:], i + 1, L + 1)  # double
        prod1 = a[i + 1] * a[i + 1 :]  # rows [i+2, L+1)
        contrib = contrib + _pad_rows(prod1, i + 2, L + 1)
        if i + 2 < L:
            contrib = contrib + _pad_rows(prod1[1:], i + 3, L + 1)
        T = contrib if T is None else T + contrib
        m0 = (T[0] * n0) & LIMB_MASK  # pre-multiply mask elided (wrap-exact)
        T = T + jnp.concatenate([m0 * p_col, zero1], axis=0)
        carry0 = T[0:1] >> LIMB_BITS
        m1 = ((T[1] + carry0[0]) * n0) & LIMB_MASK
        T = T + jnp.concatenate([zero1, m1 * p_col], axis=0)
        carry1 = (T[1:2] + carry0) >> LIMB_BITS
        T = jnp.concatenate([T[2:3] + carry1, T[3:], zero1, zero1], axis=0)
        if (i // 2 + 1) % 2 == 0 and i + 2 < L:
            T = _sweep_keep_top(T)
    return _finish(T, fc, lazy)


# --------------------------------------------------------------------------
# fully-parallel Montgomery multiplication (latency-optimized)
# --------------------------------------------------------------------------
#
# CIOS computes the reduction digits m_i sequentially (m_i depends on the
# running column 0), serializing ~6 vector ops per limb.  But the whole
# m-vector is also m = (T mod R) * (-p^-1 mod R) mod R -- a *constant*
# convolution of the product's low digits.  That makes every phase of the
# multiply data-parallel:
#
#   T = a (*) b                  (bilinear conv, tree-summed partials)
#   M = trunc_L(T_low (*) p')    (constant conv; value == m + jR, j in {0,1})
#   U = M (*) p                  (constant conv)
#   result = (T + U) >> 13L      (low half's value is divisible by R; only
#                                 its carry-out crosses into the high half)
#
# The only serial piece left is the carry-out chain of the low half (2 ops
# per limb) and the partial sweeps.  Because M may exceed m by R, the output
# lands in [0, 3p): the lazy domain here is [0, 3p), which stays closed
# under multiplication since 9p <= R for every registered field
# (n_limbs = ceil((bits+2)/13) gives >= 2.6 spare bits... see check below).
# Digits stay relaxed (<= 2^13 + 2^4) via partial sweeps exactly as in CIOS.
#
# The two constant convolutions are the part that later moves to the MXU as
# int8 Toeplitz matmuls (ROADMAP.md stage 2).


def _shift_down(x, i, rows):
    """Value-domain zero-fill shift: rows [i, i+x.rows) of a `rows`-tall
    array hold x; static concatenate only."""
    B = x.shape[1:]
    pieces = []
    if i:
        pieces.append(jnp.zeros((i, *B), dtype=jnp.int32))
    take = min(x.shape[0], rows - i)
    pieces.append(x[:take])
    if i + take < rows:
        pieces.append(jnp.zeros((rows - i - take, *B), dtype=jnp.int32))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)


def _tree_sum(parts):
    while len(parts) > 1:
        nxt = [
            parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
        parts = nxt
    return parts[0]


def _conv_rows(rows_a, b, out_rows):
    """sum_i shift_down(rows_a[i] * b, i): tree-summed partial products.

    rows_a: list of L (B,) multiplier digits (or scalar constants);
    b: (Lb, B) array.  Output (out_rows, B), columns unnormalized.
    """
    parts = [
        _shift_down(rows_a[i] * b, i, out_rows) for i in range(len(rows_a))
    ]
    return _tree_sum(parts)


def mont_mul_parallel(a, b, fc: FieldConsts, *, lazy: bool = True):
    """Latency-optimized Montgomery product; lazy domain is [0, 3p).

    See block comment above.  Digits of a/b may be relaxed (<= 2^13+2^4);
    output digits are relaxed; output value < 3p when inputs < 3p.
    """
    L = fc.n_limbs
    a_rows = [a[i] for i in range(L)]

    # product conv: 2L+1 columns, col sums <= L * 2^26.01 < 2^31
    T = _conv_rows(a_rows, b, 2 * L + 1)
    T = _sweep_keep_top(_sweep_keep_top(T))

    # m-vector: M = (T_low * p') mod R, truncated constant conv over L cols
    pprime_rows = [fc.pprime_limbs[i] for i in range(L)]
    M = _conv_rows(pprime_rows, T[:L], L + 2)
    M = _sweep_keep_top(_sweep_keep_top(M))[:L]  # value == m + jR, j in {0,1}

    # U = M * p: constant conv, 2L+1 columns
    p_rows = _p_rows_host(fc)
    U = _conv_rows(p_rows, M, 2 * L + 1)

    S = T + U  # low half's value divisible by R
    # carry-out of the low half (the only serial chain: 2 ops per limb)
    carry = None
    for k in range(L):
        t = S[k] if carry is None else S[k] + carry
        carry = t >> LIMB_BITS
    H = jnp.concatenate(
        [(S[L : L + 1] + carry), S[L + 1 :]], axis=0
    )  # (L+1, B)
    H = _sweep_keep_top(_sweep_keep_top(H))
    out = H[:L]
    if lazy:
        return out
    z, c2 = _carry_chain([out[i] for i in range(L)])
    first = _cond_sub_p(z, c2, fc)
    return _cond_sub_p(_rows(first), None, fc)


def mont_sqr(a, fc: FieldConsts, *, lazy: bool = False):
    """Montgomery squaring via symmetric CIOS: pass i multiplies a_i only by
    a[i:], doubling the off-diagonal terms -- ~45% fewer limb products than
    mont_mul(a, a).

    Placement: at pass i (after i shift-downs) the product a_i*a_j belongs
    at relative row j, so the slice lands at rows [i, L) -- a static
    two-piece concatenate, still Mosaic-friendly.

    Overflow: doubled products add < 3*2^26 per column per pass, so the
    sweep cadence bound stays int32-safe (see _SWEEP_EVERY).
    """
    if fc.mul_impl == "parallel":
        return mont_mul_parallel(a, a, fc, lazy=lazy)
    if fc.mul_impl.startswith("mxu"):
        from .mxu_ops import mont_sqr_mxu

        return mont_sqr_mxu(a, fc.mxu, fc, lazy=lazy,
                            scratch=fc.sos_scratch)
    if fc.mul_impl == "cios2s":
        return mont_sqr_cios2(a, fc, lazy=lazy)
    if fc.mul_impl == "cios2":
        # symmetric squaring measured slower than the plain radix-2^26 path
        # on v5e (the pad-concatenates outweigh the saved products); kept
        # selectable as mul_impl="cios2s"
        return mont_mul_cios2(a, a, fc, lazy=lazy)
    if fc.mul_impl.startswith("cios") and fc.mul_impl not in ("cios", "cios2"):
        return mont_mul_ciosk(a, a, fc, int(fc.mul_impl[4:]), lazy=lazy)
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
        m = (low[0] * n0) & LIMB_MASK  # pre-multiply mask elided (wrap-exact)
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
# SOS Montgomery product accumulating in a VMEM scratch ref (Pallas only)
# --------------------------------------------------------------------------


def _p_blocks(fc: FieldConsts) -> list:
    """Contiguous nonzero-digit blocks of p as (offset, length), merging
    blocks separated by <= 2 zero digits (one dense tile op beats two short
    ones).  Vesta/Pallas (p = 2^254 + c): [(0, 10), (19, 1)] -- the m*p
    half of the modmul touches 11 rows instead of 20.  Dense moduli
    degenerate to [(0, L)]."""
    digits = fc.p_host
    assert digits is not None
    nz = [i for i, v in enumerate(digits) if v]
    blocks = []
    start = prev = nz[0]
    for i in nz[1:]:
        if i - prev <= 3:  # gap of <= 2 zeros: keep the tile dense
            prev = i
            continue
        blocks.append((start, prev - start + 1))
        start = prev = i
    blocks.append((start, prev - start + 1))
    return blocks


def mont_mul_sos_ref(a, b, fc: FieldConsts, t_ref, *, lazy: bool = True,
                     sqr: bool = False, sparse_p: bool = False):
    """Separated-operand-scanning Montgomery product accumulated IN PLACE in
    a (2L+1, B) VMEM scratch ref -- the experiment for the ROADMAP's
    suspected per-pass shift-down-concatenate overhead: products and m*p
    terms are added at their natural row offsets via sliced read-modify-
    write, so there is no shift-down, no zero-row assembly, and processed
    low columns are zeroed as their carry is extracted (the final low half
    needs no carry chain at all).

    Overflow: between sweeps a column gains <= 4 products per pass
    (< 2^28.1); sweeping the whole scratch every 2 passes keeps columns
    < 2^14 + 2*2^28.1 < 2^29.2.  Pallas kernels only (needs a mutable ref);
    the interpret path serves CPU tests.
    """
    import jax.experimental.pallas as pl

    L = fc.n_limbs
    assert L % 2 == 0
    B = a.shape[1]
    n0 = jnp.int32(fc.n0_inv)
    p_col = _col(fc.p_limbs)
    blocks = _p_blocks(fc) if sparse_p else [(0, L)]
    block_cols = [(off, blen, _col(fc.p_limbs[off : off + blen]))
                  for off, blen in blocks]

    def add_mp(m, base):
        """t_ref[base + off : ...] += m * p_block for each dense block."""
        for off, blen, bcol in block_cols:
            sl = pl.ds(base + off, blen)
            t_ref[sl, :] = t_ref[sl, :] + m * bcol

    rows = 2 * L + 1
    t_ref[...] = jnp.zeros((rows, B), dtype=jnp.int32)
    carry = None
    for i in range(0, L, 2):
        if sqr:
            prod0 = a[i] * a[i:]  # columns [2i, L+i)
            if i + 1 < L:
                prod0 = jnp.concatenate(
                    [prod0[:1], prod0[1:] + prod0[1:]], axis=0
                )  # double off-diagonal
            sl = pl.ds(2 * i, L - i)
            t_ref[sl, :] = t_ref[sl, :] + prod0
            prod1 = a[i + 1] * a[i + 1 :]  # columns [2i+2, L+i+1)
            if i + 2 < L:
                prod1 = jnp.concatenate(
                    [prod1[:1], prod1[1:] + prod1[1:]], axis=0
                )
            sl = pl.ds(2 * i + 2, L - i - 1)
            t_ref[sl, :] = t_ref[sl, :] + prod1
        else:
            sl = pl.ds(i, L)
            t_ref[sl, :] = t_ref[sl, :] + a[i] * b
            sl = pl.ds(i + 1, L)
            t_ref[sl, :] = t_ref[sl, :] + a[i + 1] * b
        col = t_ref[i] if carry is None else t_ref[i] + carry
        m0 = (col * n0) & LIMB_MASK  # pre-multiply mask elided (wrap-exact)
        add_mp(m0, i)
        col = t_ref[i] if carry is None else t_ref[i] + carry
        carry = col >> LIMB_BITS  # column i divisible by 2^13
        col = t_ref[i + 1] + carry
        m1 = (col * n0) & LIMB_MASK
        add_mp(m1, i + 1)
        carry = (t_ref[i + 1] + carry) >> LIMB_BITS
        t_ref[pl.ds(i, 2), :] = jnp.zeros((2, B), dtype=jnp.int32)
        if (i // 2 + 1) % 2 == 0 and i + 2 < L:
            t_ref[...] = _sweep_keep_top(t_ref[...])
    # result = rows [L, 2L] + carry into row L; low half is all zeros
    H = t_ref[pl.ds(L, L + 1), :]
    H = jnp.concatenate([H[:1] + carry, H[1:]], axis=0)
    H = _sweep_keep_top(_sweep_keep_top(H))
    out = H[:L]
    if lazy:
        return out
    z, c2 = _carry_chain([out[i] for i in range(L)])
    first = _cond_sub_p(z, c2, fc)
    return _cond_sub_p(_rows(first), None, fc)


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


def _odd_power_table(x, fc: FieldConsts):
    """[x^1, x^3, ..., x^15] in the lazy domain (1 squaring + 7 products)."""
    x2 = mont_sqr(x, fc, lazy=True)
    odd = [x]
    for _ in range(7):
        odd.append(mont_mul(odd[-1], x2, fc, lazy=True))
    return odd


def exp_inv_alpha_sw(x, fc: FieldConsts, *, unroll: bool = False):
    """x^(1/alpha) via the static left-to-right sliding-window schedule
    (params.py inv_alpha_sliding_schedule): odd-window table of 8 entries,
    per step a dynamic run of squarings then one table multiply."""
    odd = _odd_power_table(x, fc)
    sq = fc.sw_sched[0]
    idx = fc.sw_sched[1]
    if unroll:
        acc = odd[int(idx[0])]
        for s, d in zip(sq[1:].tolist(), idx[1:].tolist()):
            for _ in range(s):
                acc = mont_sqr(acc, fc, lazy=True)
            acc = mont_mul(acc, odd[d], fc, lazy=True)
        return canonicalize(acc, fc)

    table_arr = jnp.stack(odd, axis=0)  # (8, L, B)
    sq_arr = jnp.asarray(sq)
    idx_arr = jnp.asarray(idx)

    def body(i, acc):
        acc = jax.lax.fori_loop(
            0, sq_arr[i], lambda j, a: mont_sqr(a, fc, lazy=True), acc
        )
        t = jax.lax.dynamic_index_in_dim(
            table_arr, idx_arr[i], axis=0, keepdims=False
        )
        return mont_mul(acc, t, fc, lazy=True)

    acc = table_arr[int(idx[0])]
    acc = jax.lax.fori_loop(1, sq_arr.shape[0], body, acc)
    return canonicalize(acc, fc)


def exp_inv_alpha_chain(x, fc: FieldConsts, *, streams: int = 1):
    """x^(1/alpha) via the reference's hand-derived per-field addition chain
    (reference: src/<field>/sbox.rs:28-322, transcribed as schedule data by
    tools/extract_addition_chains.py): straight-line sqr/mul register ops in
    the lazy domain, ~5-8% fewer Montgomery products than the sliding-window
    ladder (vesta: 293 vs ~315) and no dynamic table indexing at all.

    streams=2/3 splits the batch into equal slices and interleaves the
    independent op chains in program order -- total work is unchanged, but
    the compiler sees multiple dependency chains and can overlap one
    stream's MXU matmuls (mul_impl="mxu") or long-latency ops with another
    stream's VPU work.  With mul_impl="mxu*" the streams' constant convs
    additionally FUSE into one block-diagonal matmul per conv
    (mxu_ops.mont_mul_mxu_multi): contraction K = streams*2L instead of 2L,
    the K>=128 MXU-feeding experiment."""
    B = x.shape[1]
    if streams > 1 and B % streams == 0:
        xs = [x[:, s * (B // streams) : (s + 1) * (B // streams)]
              for s in range(streams)]
    else:
        xs = [x]
    regs = [{0: xp} for xp in xs]
    fused = (
        len(regs) > 1
        and fc.mul_impl.startswith("mxu")
        and fc.mxu is not None
        and getattr(fc.mxu, "w_pprime_bd", None) is not None
        and fc.mxu.streams == len(regs)
    )
    if fused:
        from .mxu_ops import mont_mul_mxu_multi

        for op in fc.chain_ops:
            if op[0] == "sqr":
                vals = mont_mul_mxu_multi(
                    [(r[op[2]], r[op[2]]) for r in regs], fc.mxu, fc, sqr=True
                )
            else:
                vals = mont_mul_mxu_multi(
                    [(r[op[2]], r[op[3]]) for r in regs], fc.mxu, fc
                )
            for r, v in zip(regs, vals):
                r[op[1]] = v
    else:
        for op in fc.chain_ops:
            for r in regs:
                if op[0] == "sqr":
                    r[op[1]] = mont_sqr(r[op[2]], fc, lazy=True)
                else:
                    r[op[1]] = mont_mul(r[op[2]], r[op[3]], fc, lazy=True)
    out_reg = fc.chain_ops[-1][1]
    outs = [r[out_reg] for r in regs]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return canonicalize(out, fc)


def exp_inv_alpha_chain_seg(x, fc: FieldConsts, *, seg_size: int = 64):
    """x^(1/alpha) via the reference addition chain, lowered as K
    straight-line segments selected by lax.switch inside a fori_loop
    (VERDICT r3 item 3: the fori-segmented chain).

    Mosaic's scheduling cost is superlinear in basic-block size: the fully
    unrolled 293-op vesta chain costs 120-203 s to compile at block 3072
    (657 s at 6144) and the 448-op bls12_377 chain is compile-infeasible at
    L=30.  Splitting the chain into ~seg_size-op segments gives the
    scheduler K small blocks instead of one huge one, bounding compile time
    while keeping every segment branch-free straight-line code.

    Registers live across a segment boundary go through fc.seg_scratch, a
    VMEM register file (Pallas kernels): each switch branch reads ONLY the
    registers it consumes and writes ONLY the carried registers it defines,
    all at static row offsets -- the rest of the file is untouched, so a
    boundary costs a handful of VMEM slice ops instead of materializing
    every live register (the loop-carried-tuple form, kept as the
    jit/CPU fallback, was measured 28% slower at block 3072: Mosaic spills
    the 15-array switch carry through HBM at every boundary).  Registers
    both defined and consumed inside one segment never touch the file.
    Total Montgomery-op count is identical to the unrolled chain
    (reference src/<field>/sbox.rs:28-322)."""
    ops = fc.chain_ops
    segs = [ops[i : i + seg_size] for i in range(0, len(ops), seg_size)]

    # registers that cross a segment boundary: used in a segment before
    # being (re)defined there.  Reg 0 is the input x, defined before seg 0.
    carried = {ops[-1][1]}  # the final output must survive the loop
    for seg in segs:
        defined = set()
        for op in seg:
            for src in op[2:]:
                if src not in defined:
                    carried.add(src)
            defined.add(op[1])
    order = sorted(carried)
    pos = {r: i for i, r in enumerate(order)}

    scratch = fc.seg_scratch
    if scratch is not None:
        L = fc.n_limbs
        stride = chain_seg_stride(L)

        def row(r):
            return pos[r] * stride

        scratch[row(0) : row(0) + L, :] = x

        def make_branch(seg):
            def br(_):
                env = {}

                def get(r):
                    if r not in env:
                        env[r] = scratch[row(r) : row(r) + L, :]
                    return env[r]

                defined = set()
                for op in seg:
                    if op[0] == "sqr":
                        v = mont_sqr(get(op[2]), fc, lazy=True)
                    else:
                        v = mont_mul(get(op[2]), get(op[3]), fc, lazy=True)
                    env[op[1]] = v
                    defined.add(op[1])
                for r in defined & carried:
                    scratch[row(r) : row(r) + L, :] = env[r]
                return jnp.int32(0)

            return br

        branches = [make_branch(s) for s in segs]
        jax.lax.fori_loop(
            0, len(segs),
            lambda i, c: jax.lax.switch(i, branches, c),
            jnp.int32(0),
        )
        out_r = ops[-1][1]
        return canonicalize(scratch[row(out_r) : row(out_r) + L, :], fc)

    def make_branch(seg):
        def br(regs):
            env = dict(zip(order, regs))
            for op in seg:
                if op[0] == "sqr":
                    env[op[1]] = mont_sqr(env[op[2]], fc, lazy=True)
                else:
                    env[op[1]] = mont_mul(env[op[2]], env[op[3]], fc, lazy=True)
            return tuple(env[r] for r in order)
        return br

    branches = [make_branch(s) for s in segs]
    init = tuple(x for _ in order)  # undefined slots: shape-matching dummies
    regs = jax.lax.fori_loop(
        0, len(segs), lambda i, r: jax.lax.switch(i, branches, r), init
    )
    return canonicalize(regs[pos[ops[-1][1]]], fc)


def chain_seg_stride(L: int) -> int:
    """Sublane-aligned row stride per register-file slot."""
    return -(-L // 8) * 8


def chain_seg_regs(fp_or_fc, ladder: str) -> int:
    """Number of register-file slots the segmented chain needs (the carried
    set for this field's chain at this ladder's segment size)."""
    ops = fp_or_fc.chain_ops if hasattr(fp_or_fc, "chain_ops") else _load_chain(fp_or_fc.name)
    seg_size = chain_seg_size(ladder)
    segs = [ops[i : i + seg_size] for i in range(0, len(ops), seg_size)]
    carried = {ops[-1][1]}
    for seg in segs:
        defined = set()
        for op in seg:
            for src in op[2:]:
                if src not in defined:
                    carried.add(src)
            defined.add(op[1])
    return len(carried)


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
    if fc.ladder == "sw4":
        return exp_inv_alpha_sw(x, fc, unroll=unroll)
    if fc.ladder.startswith("chainseg"):
        return exp_inv_alpha_chain_seg(x, fc, seg_size=chain_seg_size(fc.ladder))
    if fc.ladder.startswith("chain"):
        return exp_inv_alpha_chain(x, fc, streams=chain_streams(fc.ladder))
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


def exp_alpha(x, fc: FieldConsts, alpha: int):
    """Forward S-box power map x^alpha for the small static alpha (5 or 11)
    via square-and-multiply (traits.rs:94-104)."""
    bits = bin(alpha)[3:]  # skip leading 1
    acc = x
    for b in bits:
        acc = mont_sqr(acc, fc, lazy=True)
        if b == "1":
            acc = mont_mul(acc, x, fc, lazy=True)
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
