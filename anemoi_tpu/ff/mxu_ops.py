"""Montgomery multiplication with the constant convolutions on the MXU.

ROADMAP stage 2/3 follow-up (round-1 VERDICT item 2: build the fused
prototype instead of paper-killing the north star).  Structure: the
fully-parallel Montgomery form (limb_ops.mont_mul_parallel) has three
convolutions per product --

    T = a (*) b        bilinear: stays on the VPU (diagonal for RNS only)
    M = T_low (*) p'   constant: a lower-triangular Toeplitz matmul
    U = M (*) p        constant: a banded Toeplitz matmul

-- and the two constant convs are exactly what the MXU can absorb.  The TPU
has no widening integer multiply on the MXU either, but it DOES have a
native int8 x int8 -> int32 systolic path, so 13-bit digits are split into
a 7-bit low piece and a <=6-bit high piece and each Toeplitz matrix W is
split the same way.  The three piece products

    W_lo*x_lo + 2^7 (W_lo*x_hi + W_hi*x_lo) + 2^14 (W_hi*x_hi)

are packed into ONE block-structured matmul

    [[W_lo,    0],
     [W_hi, W_lo],        (3R, 2L) @ (2L, B) int8 -> int32
     [   0, W_hi]]

whose three R-row output groups are recombined with two shifts -- so each
constant conv costs one MXU matmul with contraction K = 2L (40 for 255-bit
fields) plus 4 VPU recombine ops, instead of ~L full-width VPU
multiply-adds.

Overflow accounting (L <= 30): group sums <= L * 127 * 127 < 2^19, the
2^14-shifted group <= L * 63 * 64 * 2^14 < 2^30.9, total < 2^31.  Column
values of the recombined conv are < L * 2^26.2 < 2^31: the standard lazy
sweep machinery (limb_ops._sweep_keep_top) normalizes them exactly as it
does for the VPU convolutions.

Everything here is pure jnp on (rows, B) int32/int8 arrays: the same code
runs under jit on CPU (tests) and inside Pallas TPU kernels (the Toeplitz
operands are passed in as kernel inputs; see pallas integration).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

from ..fields.params import LIMB_BITS, LIMB_MASK, FieldParams
from . import limb_ops as lo
from .limb_ops import FieldConsts


def _probe_skip(flag: str) -> bool:
    """Timing-probe gates that replace a production step with WRONG math
    (tools/probe_mxu_share.py).  Read at trace time, so a leftover exported
    flag would bake corrupt kernels into the jit cache for the process
    lifetime -- refuse unless ANEMOI_PROBE_OK is also set, and shout either
    way (ADVICE r3, medium)."""
    if not os.environ.get(flag):
        return False
    if not os.environ.get("ANEMOI_PROBE_OK"):
        raise RuntimeError(
            f"{flag} is set but ANEMOI_PROBE_OK is not: this flag disables "
            "part of the Montgomery reduction (WRONG results) and is only "
            "for MXU-share timing probes.  Unset it, or set ANEMOI_PROBE_OK=1 "
            "if you really are probing."
        )
    print(f"[mxu_ops] WARNING: {flag} active -- kernels traced in this "
          "process compute WRONG math (timing probe only)", file=sys.stderr)
    return True

_PIECE_BITS = 7
_PIECE_MASK = (1 << _PIECE_BITS) - 1


class MxuConsts(NamedTuple):
    """Host-side int8 Toeplitz operands for one field (numpy)."""

    w_pprime: np.ndarray  # (3L, 2L) int8: truncated conv with p' digits
    w_p: np.ndarray  # (3*(2L-1), 2L) int8: full conv with p digits
    # Block-diagonal stream-fused variants (ladder="chain2"/"chain3" with
    # mul_impl="mxu*"): S independent streams' constant convs in ONE matmul
    # with contraction K = S*2L (120 for 3 streams of a 255-bit field --
    # the K>=128 experiment, ROADMAP/VERDICT r2 item 2).  None for S=1.
    w_pprime_bd: np.ndarray | None = None  # (S*3(L+2), S*2L) int8
    w_p_bd: np.ndarray | None = None  # (S*3(2L-1), S*2L) int8
    streams: int = 1


def _split_w(w: np.ndarray):
    assert w.max() <= LIMB_MASK
    return (w & _PIECE_MASK).astype(np.int8), (w >> _PIECE_BITS).astype(np.int8)


def _stack3(w: np.ndarray) -> np.ndarray:
    """(R, L) 13-bit Toeplitz -> (3R, 2L) int8 block matrix (see module doc)."""
    w_lo, w_hi = _split_w(w)
    R, L = w.shape
    z = np.zeros((R, L), dtype=np.int8)
    return np.concatenate(
        [
            np.concatenate([w_lo, z], axis=1),
            np.concatenate([w_hi, w_lo], axis=1),
            np.concatenate([z, w_hi], axis=1),
        ],
        axis=0,
    )


def _toeplitz_trunc(v: np.ndarray, L: int, rows: int) -> np.ndarray:
    """W[j, t] = v[j - t] for 0 <= j - t < L: convolution truncated at
    `rows` columns (rows > L keeps spare columns so the keep-top sweeps can
    normalize digit L-1 before the mod-R truncation drops the spares)."""
    w = np.zeros((rows, L), dtype=np.int64)
    for j in range(rows):
        for t in range(max(0, j - L + 1), min(L, j + 1)):
            w[j, t] = v[j - t]
    return w


def _block_diag(w: np.ndarray, s: int) -> np.ndarray:
    """s copies of w on the diagonal: independent streams, one matmul.
    Output rows contract only over their own stream's K-rows, so the int8
    overflow bounds of the single-stream matmul carry over unchanged."""
    R, K = w.shape
    out = np.zeros((s * R, s * K), dtype=w.dtype)
    for i in range(s):
        out[i * R : (i + 1) * R, i * K : (i + 1) * K] = w
    return out


def mxu_consts(fc: FieldConsts, streams: int = 1) -> MxuConsts:
    L = fc.n_limbs
    w_pprime = _stack3(_toeplitz_trunc(np.asarray(fc.pprime_limbs), L, L + 2))
    w_p = _stack3(_toeplitz_trunc(np.asarray(fc.p_limbs), L, 2 * L - 1))
    return MxuConsts(
        w_pprime=w_pprime,
        w_p=w_p,
        w_pprime_bd=_block_diag(w_pprime, streams) if streams > 1 else None,
        w_p_bd=_block_diag(w_p, streams) if streams > 1 else None,
        streams=streams,
    )


def _pieces(x):
    """(K, B) digits <= 2^13 + 2^4 -> (2K, B) int8 pieces [lo7; hi<=64]."""
    return jnp.concatenate([x & _PIECE_MASK, x >> _PIECE_BITS], axis=0).astype(
        jnp.int8
    )


def _conv_matmul(w_stack, x_pieces, rows: int):
    """One MXU matmul -> recombined int32 convolution columns (rows, B)."""
    out = jax.lax.dot_general(
        w_stack,
        x_pieces,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    g1 = out[:rows]
    g2 = out[rows : 2 * rows]
    g3 = out[2 * rows :]
    return g1 + (g2 << _PIECE_BITS) + (g3 << (2 * _PIECE_BITS))


def _conv1_sqr(a, L: int):
    """Symmetric bilinear conv a (*) a on the VPU: (2L+1, B) columns."""
    parts = []
    for i in range(L):
        prod = a[i] * a[i:]  # rows [2i, L+i)
        parts.append(lo._shift_down(prod, 2 * i, 2 * L + 1))
        if i + 1 < L:
            parts.append(lo._shift_down(prod[1:], 2 * i + 1, 2 * L + 1))  # double
    return lo._tree_sum(parts)


def _conv1_sqr_fused_diag(a, L: int):
    """Strict-upper-triangle squaring conv: one part per limb instead of the
    naive two (the doubled off-diagonal slice rides in the same part as the
    diagonal product, fused into the part's single zero-pad concatenate) --
    L parts / L-1 tree adds where the shifted-pair form needs 2L-1 parts /
    2L-2 adds, ~43% fewer full-height conv row ops.

    MEASURED NOT FASTER on v5e (mul_impl="mxus": 192.8k vs 196.5k hashes/s
    at vesta 2_1 chain/3072): the kernel's critical path at production
    block sizes is the int8 MXU dispatch stream, not the VPU tree adds, so
    removing ~40% of the conv's padded adds changes nothing (see ROADMAP
    "MXU-share probe").  Kept selectable for documentation and for chips
    where the VPU/MXU balance differs.

    Overflow: column r sums at most 2*ceil(L/2)+1 <= 31 doubled/diagonal
    products of relaxed digits (<= 2^13 + 2^5, so products < 2^26.01) at
    L = 30: < 31 * 2^26.01 < 2^30.97 -- int32-safe (the caller's two
    sweeps then relax digits back below 2^13 + 2^5)."""
    rows = 2 * L + 1
    B = a.shape[1:]
    d = a * a  # (L, B) diagonal products a_i^2 -> columns 2i
    parts = []
    for i in range(L - 1):
        p = a[i] * a[i + 1 :]  # off-diagonal a_i*a_j, j > i -> columns i+j
        p = p + p  # doubled (symmetry)
        pieces = []
        if i:
            pieces.append(jnp.zeros((2 * i, *B), dtype=jnp.int32))
        pieces.append(d[i : i + 1])
        pieces.append(p)
        tail = rows - 2 * i - 1 - (L - 1 - i)
        if tail:
            pieces.append(jnp.zeros((tail, *B), dtype=jnp.int32))
        parts.append(jnp.concatenate(pieces, axis=0))
    parts.append(lo._shift_down(d[L - 1 : L], 2 * L - 2, rows))
    return lo._tree_sum(parts)


def _conv1_mul(a, b, L: int):
    parts = [lo._shift_down(a[i] * b, i, 2 * L + 1) for i in range(L)]
    return lo._tree_sum(parts)


def _conv1_sos(a, b, L: int, t_ref, sqr: bool):
    """Bilinear conv accumulated in a (2L+1, B) VMEM scratch ref: products
    land at their natural row offsets via sliced read-modify-write -- no
    zero-padded tree-sum (which materializes ~2L full-height intermediate
    arrays).  Pallas kernels only."""
    import jax.experimental.pallas as pl

    B = a.shape[1]
    t_ref[...] = jnp.zeros((2 * L + 1, B), dtype=jnp.int32)
    for i in range(L):
        if sqr:
            prod = a[i] * a[i:]  # rows [2i, L+i)
            if i + 1 < L:
                prod = jnp.concatenate([prod[:1], prod[1:] + prod[1:]], axis=0)
            sl = pl.ds(2 * i, L - i)
        else:
            prod = a[i] * b  # rows [i, i+L)
            sl = pl.ds(i, L)
        t_ref[sl, :] = t_ref[sl, :] + prod
        if (i + 1) % 8 == 0 and i + 1 < L:
            # columns gain <= 2 products (< 2^27.1) per pass; sweep every 8
            # keeps them < 2^14 + 8*2^27.1 < 2^30.2
            t_ref[...] = lo._sweep_keep_top(t_ref[...])
    return t_ref[...]


_SOS_ACCS = 4  # independent scratch accumulators in the mxu3 conv


def sos_multi_rows(L: int) -> int:
    """Scratch rows for the mxu3 multi-accumulator conv: _SOS_ACCS
    sublane-aligned (2L+1)-row accumulators."""
    return _SOS_ACCS * (-(-(2 * L + 1) // 8) * 8)


def _conv1_sos_multi(a, b, L: int, t_ref, sqr: bool):
    """Bilinear conv accumulated across _SOS_ACCS independent VMEM scratch
    accumulators (round-robin over parts, so consecutive program-order adds
    hit different accumulators and expose ILP -- the fix for the single-
    scratch _conv1_sos, whose read-modify-write chain serializes against
    itself).  No zero-padded part materialization and no tree-sum: each
    part is added at its natural height via a sliced read-modify-write.

    Per-accumulator columns gain at most ceil(L/_SOS_ACCS) products, each
    DOUBLED in the sqr branch (off-diagonal p+p), so the worst case is
    8 * 2^27.02 ~ 2^30.01 ~ 1.08e9 at L = 30 -- int32-safe, but note the
    margin is thin: _SOS_ACCS=2 would land at ~2.03e9, within 6% of
    overflow.  No intra-conv sweeps are needed; the combined sum obeys the
    same < 2^31 bound as the tree-sum convs (see _conv1_sqr).
    Pallas kernels only (needs a mutable ref)."""
    import jax.experimental.pallas as pl

    B = a.shape[1]
    stride = sos_multi_rows(L) // _SOS_ACCS
    rows = 2 * L + 1
    t_ref[...] = jnp.zeros((_SOS_ACCS * stride, B), dtype=jnp.int32)
    if sqr:
        d = a * a  # diagonal products -> columns 2i
        for i in range(L - 1):
            g = i % _SOS_ACCS
            p = a[i] * a[i + 1 :]
            p = p + p
            part = jnp.concatenate([d[i : i + 1], p], axis=0)  # columns [2i, L+i)
            sl = pl.ds(g * stride + 2 * i, L - i)
            t_ref[sl, :] = t_ref[sl, :] + part
        g = (L - 1) % _SOS_ACCS
        sl = pl.ds(g * stride + 2 * L - 2, 1)
        t_ref[sl, :] = t_ref[sl, :] + d[L - 1 : L]
    else:
        for i in range(L):
            g = i % _SOS_ACCS
            sl = pl.ds(g * stride + i, L)
            t_ref[sl, :] = t_ref[sl, :] + a[i] * b
    acc = t_ref[pl.ds(0, rows), :]
    for g in range(1, _SOS_ACCS):
        acc = acc + t_ref[pl.ds(g * stride, rows), :]
    return acc


def mont_mul_mxu(a, b, mc: MxuConsts, fc: FieldConsts, *, lazy: bool = True,
                 sqr: bool = False, scratch=None):
    """Montgomery product with constant convs on the MXU; lazy domain [0, 3p).

    Same value flow as limb_ops.mont_mul_parallel (see its derivation);
    digits of a/b may be relaxed (<= 2^13 + 2^4).  With `scratch` (a
    (2L+1, >=B) VMEM ref, Pallas only) the bilinear conv accumulates in
    place instead of tree-summing zero-padded parts.
    """
    L = fc.n_limbs

    # bilinear product conv (VPU): columns <= L * 2^26.3 < 2^31
    # The scratch is only usable when its lane width matches this batch: a
    # narrower `.at[:, 0:B]` sub-ref produces a (2L+1)-row memref slice that
    # violates Mosaic's 8-row tile alignment (observed on 4_3's per-column
    # beta-square muls, which run at block width while the ladder runs at
    # columns*block).  Those few narrow muls fall back to the tree-sum conv.
    if scratch is not None and scratch.shape[1] == a.shape[1]:
        if fc.mul_impl == "mxu3":
            T = _conv1_sos_multi(a, b, L, scratch, sqr)
        else:
            T = _conv1_sos(a, b, L, scratch, sqr)
    elif sqr:
        T = (_conv1_sqr_fused_diag(a, L) if fc.mul_impl == "mxus"
             else _conv1_sqr(a, L))
    else:
        T = _conv1_mul(a, b, L)
    T = lo._sweep_keep_top(lo._sweep_keep_top(T))

    # M = trunc_L(T_low (*) p'): one MXU matmul; value == m + jR, j in {0,1}
    # (computed at L+2 columns so the sweeps normalize digit L-1; the spare
    # rows are then dropped -- the mod-R truncation, as in mont_mul_parallel)
    if _probe_skip("ANEMOI_PROBE_SKIP_PPRIME"):  # timing probe: WRONG math
        M = T[:L]
    else:
        M = _conv_matmul(mc.w_pprime, _pieces(T[:L]), L + 2)
        M = lo._sweep_keep_top(lo._sweep_keep_top(M))[:L]  # digits <= 2^13 + 2^5

    # U = M (*) p: one MXU matmul, 2L-1 columns
    if _probe_skip("ANEMOI_PROBE_SKIP_U"):  # timing probe: WRONG math
        U = jnp.concatenate([M, M[:L - 1]], axis=0)
    else:
        U = _conv_matmul(mc.w_p, _pieces(M), 2 * L - 1)
    return _finish_high(T, U, fc, lazy)


def mont_sqr_mxu(a, mc: MxuConsts, fc: FieldConsts, *, lazy: bool = True,
                 scratch=None):
    return mont_mul_mxu(a, a, mc, fc, lazy=lazy, sqr=True, scratch=scratch)


def _finish_high(T, U, fc: FieldConsts, lazy: bool):
    """Shared tail of the Montgomery product: add U into T, run the low
    half's carry-out chain, normalize the high half."""
    L = fc.n_limbs
    B = T.shape[1:]
    S = T + jnp.concatenate(
        [U, jnp.zeros((2, *B), dtype=jnp.int32)], axis=0
    )
    carry = None
    for k in range(L):
        t = S[k] if carry is None else S[k] + carry
        carry = t >> LIMB_BITS
    H = jnp.concatenate([S[L : L + 1] + carry, S[L + 1 :]], axis=0)
    H = lo._sweep_keep_top(lo._sweep_keep_top(H))
    out = H[:L]
    if lazy:
        return out
    z, c2 = lo._carry_chain([out[i] for i in range(L)])
    first = lo._cond_sub_p(z, c2, fc)
    return lo._cond_sub_p(lo._rows(first), None, fc)


def mont_mul_mxu_multi(pairs, mc: MxuConsts, fc: FieldConsts, *,
                       lazy: bool = True, sqr: bool = False):
    """S independent Montgomery products with BOTH constant convs of all
    streams fused into one block-diagonal int8 MXU matmul each.

    The K>=128 contraction experiment (VERDICT r2 item 2 / ROADMAP): a
    single-stream conv matmul contracts K = 2L = 40 int8 pieces, which the
    128-deep systolic array pads 3x; S=3 streams block-diagonalized contract
    K = 120 in one (S*3R, S*2L) @ (S*2L, B') dispatch -- same useful MACs,
    one third the matmul dispatches, ~2/3 the padded K-tiles on the
    w_pprime conv.

    `pairs`: list of S (a, b) operand pairs, each (L, B') with the SAME B'
    (independent batch slices -- e.g. the chain ladder's stream split).
    Returns the S products, each (L, B'), lazy domain [0, 3p).  The per-
    stream VPU work (bilinear conv, sweeps, carry-out) is untouched: only
    the matmuls fuse across streams.
    """
    S = len(pairs)
    assert S == mc.streams and mc.w_pprime_bd is not None
    L = fc.n_limbs

    Ts = []
    for a, b in pairs:
        T = _conv1_sqr(a, L) if sqr else _conv1_mul(a, b, L)
        Ts.append(lo._sweep_keep_top(lo._sweep_keep_top(T)))

    # fused M = trunc(T_low (*) p') for all streams: one K = S*2L matmul
    rows_m = L + 2
    X = jnp.concatenate([_pieces(T[:L]) for T in Ts], axis=0)  # (S*2L, B')
    m_all = jax.lax.dot_general(
        mc.w_pprime_bd, X,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (S*3*rows_m, B')
    Ms = []
    for s in range(S):
        g = m_all[s * 3 * rows_m : (s + 1) * 3 * rows_m]
        M = (g[:rows_m] + (g[rows_m : 2 * rows_m] << _PIECE_BITS)
             + (g[2 * rows_m :] << (2 * _PIECE_BITS)))
        Ms.append(lo._sweep_keep_top(lo._sweep_keep_top(M))[:L])

    # fused U = M (*) p for all streams
    rows_u = 2 * L - 1
    X2 = jnp.concatenate([_pieces(M) for M in Ms], axis=0)
    u_all = jax.lax.dot_general(
        mc.w_p_bd, X2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (S*3*rows_u, B')
    outs = []
    for s in range(S):
        g = u_all[s * 3 * rows_u : (s + 1) * 3 * rows_u]
        U = (g[:rows_u] + (g[rows_u : 2 * rows_u] << _PIECE_BITS)
             + (g[2 * rows_u :] << (2 * _PIECE_BITS)))
        outs.append(_finish_high(Ts[s], U, fc, lazy))
    return outs
