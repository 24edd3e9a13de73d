"""Fused Pallas TPU kernels for the batched Anemoi permutation and Jive.

One kernel invocation runs the ENTIRE permutation (all rounds, including the
~300-multiply x^(1/alpha) ladder per S-box) for a tile of states resident in
VMEM -- the TPU-native answer to the reference's scalar permutation loop
(reference: src/traits.rs:370-378).  HBM traffic per state is just the
WIDTH*L input limbs and the output limbs; everything else stays on-chip.

Tiling:
  states arrive as int32[WIDTH*L, N] (limb-major, batch on lanes, Montgomery
  form); the grid splits N into tiles of `block_b` lanes.  Within the kernel
  all arithmetic is limb_ops on (L, block_b) register/VMEM values -- 13-bit
  limbs, int32 accumulation, VPU-only.

Control flow inside the kernel:
  * rounds: lax.fori_loop, round constants dynamically sliced from a VMEM
    operand (rounds, 2*cols*L) -- avoids unrolling 21 rounds of ~300 modmuls.
  * exp ladder: the x^1..x^15 table lives in a VMEM scratch; the fixed
    base-16 digit string of 1/alpha is scanned with a fori_loop, each step
    4 squarings + one multiply by a dynamically-sliced table row.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import InstanceParams
from ..ff import limb_ops as lo
from ..ff.limb_ops import FieldConsts, field_consts
from ..permutation.batched import round_constant_limbs

DEFAULT_BLOCK_B = 768  # legacy VPU-path optimum; see default_block_b
DEFAULT_MUL_IMPL = None  # None = per-instance measured default (default_mul_impl)
DEFAULT_LADDER = None  # None = per-instance measured default (default_ladder)


def default_mul_impl(inst: InstanceParams) -> str:
    """Measured-optimal Montgomery mul on v5e (VERDICT r2 items 1+3): the
    MXU constant-conv path ("mxu") beats pure-VPU cios2 at BOTH limb
    widths (vesta 2_1: 196.5k vs 169.5k hashes/s; bls12_377 2_1: 77.5k vs
    59.8k -- the constant convs are L^2 work, so the MXU offload matters
    MORE at L=30).  Verified bit-exact on device
    (tools/verify_tpu.py --mul-impl mxu; bench parity lanes)."""
    return "mxu"


def default_block_b(inst: InstanceParams, mul_impl: str | None = None) -> int:
    """Measured-optimal batch tile on v5e: the sbox ladder runs on a
    (L, columns*block) tile.  Pure-VPU impls optimize at ~768 lanes for
    20-limb fields / ~512 for 30-limb (vesta 2_1 768>512>1024; vesta 4_3
    384>512>768; bls12_377 2_1 640~512>768; 4_3 256>384>512) and DEGRADE
    past that (VPU-issue-bound).  The mxu path instead improves with block
    size (the K=2L int8 matmuls amortize their systolic pad with lane
    count).  r4 sweep under the lifted scoped-VMEM cap (the r3 "4096
    OOM" was Mosaic's 16MB default budget, not hardware): vesta 2_1
    4096 (199.8k/s) > 6144 (199.6k) > 3072 (196.5k) > 2048 (195.5k);
    bls12_377 2_1 2048 (81.8k) > 1536 (81.1k) > 1024 (77.5k)."""
    impl = mul_impl or default_mul_impl(inst)
    if impl.startswith("mxu"):
        target = 4096 if inst.field.n_limbs <= 20 else 2048
    else:
        target = 768 if inst.field.n_limbs <= 20 else 512
    return max(128, target // inst.columns)


def default_ladder(inst: InstanceParams) -> str:
    """Measured-optimal exp schedule on v5e: the reference's transcribed
    addition chains ("chain", ~6-8% fewer Montgomery products than the
    sliding window) win for 20-limb fields (vesta 2_1 169.5k vs 159.1k/s,
    vesta 4_3 124.9k vs 116.7k/s); 30-limb fields keep the sliding window
    unless the chain measurement wins there too (the 448-op straight-line
    unroll inflates Mosaic compile time at L=30)."""
    return "chain" if inst.field.n_limbs <= 20 else "sw4"


def _seg_rows(fc: FieldConsts) -> int:
    """VMEM register-file rows for the segmented chain ladder: one
    sublane-aligned slot per carried register."""
    from .limb_ops import chain_seg_regs, chain_seg_stride

    return chain_seg_regs(fc, fc.ladder) * chain_seg_stride(fc.n_limbs)


def _sos_rows(fc: FieldConsts) -> int:
    """Scratch rows for the conv-in-scratch mul impls: one (2L+1)-row
    accumulator (mxu2) or _SOS_ACCS aligned accumulators (mxu3)."""
    if fc.mul_impl == "mxu3":
        from .mxu_ops import sos_multi_rows

        return sos_multi_rows(fc.n_limbs)
    return 2 * fc.n_limbs + 1


# Mosaic's default scoped-VMEM budget is 16 MB on v5e -- far below the
# physical VMEM -- and it, not the hardware, was what stopped the r3 block
# sweep at 3072 ("4096 VMEM-OOM": the allocator exceeded 16.00M by kilobytes).
# Raising the cap lets bigger batch tiles amortize the int8 matmul dispatches.
VMEM_LIMIT_DEFAULT = 100 * 1024 * 1024


def _compiler_params(interpret: bool):
    if interpret:
        return None
    # env read at kernel-build time, not module import, so a harness that
    # imports early can still set it (ADVICE r3).  The extra knobs are
    # Mosaic-scheduling experiment hooks (VERDICT r3 item 2) -- kernels are
    # lru_cached per config, so flip these only in a fresh process.
    kw = {"vmem_limit_bytes": int(os.environ.get("ANEMOI_VMEM_LIMIT",
                                                 VMEM_LIMIT_DEFAULT))}
    if os.environ.get("ANEMOI_DIMSEM"):
        kw["dimension_semantics"] = tuple(os.environ["ANEMOI_DIMSEM"].split(","))
    if os.environ.get("ANEMOI_INTERNAL_SCRATCH"):
        kw["internal_scratch_in_bytes"] = int(os.environ["ANEMOI_INTERNAL_SCRATCH"])
    if os.environ.get("ANEMOI_NO_BOUNDS_CHECKS"):
        kw["disable_bounds_checks"] = True
    return pltpu.CompilerParams(**kw)


def _table_stride(L: int) -> int:
    """Sublane-aligned row stride for the exp table (dynamic slices must
    start at a multiple of 8 rows for Mosaic)."""
    return -(-L // 8) * 8


def _exp_inv_alpha_sw_kernel(x, fc: FieldConsts, sched_ref, table_ref):
    """x^(1/alpha) via the sliding-window schedule (params.py): 8-entry odd
    power table in VMEM scratch; per step a dynamic-count run of squarings
    (Mosaic supports dynamic fori bounds) and one table multiply."""
    L = fc.n_limbs
    Ls = _table_stride(L)
    x2 = lo.mont_sqr(x, fc, lazy=True)
    cur = x
    table_ref[0:L, :] = cur
    powers = {0: x}
    for j in range(1, 8):
        cur = lo.mont_mul(cur, x2, fc, lazy=True)
        powers[j] = cur
        table_ref[j * Ls : j * Ls + L, :] = cur

    acc0 = powers[int(fc.sw_sched[1][0])]

    def body(i, acc):
        acc = jax.lax.fori_loop(
            0, sched_ref[0, i], lambda j, a: lo.mont_sqr(a, fc, lazy=True), acc
        )
        start = pl.multiple_of(sched_ref[1, i] * Ls, 8)
        t = table_ref[pl.ds(start, L), :]
        return lo.mont_mul(acc, t, fc, lazy=True)

    acc = jax.lax.fori_loop(1, int(fc.sw_sched.shape[1]), body, acc0)
    return lo.canonicalize(acc, fc)


def _exp_inv_alpha_kernel(x, fc: FieldConsts, digits_ref, table_ref):
    """x^(1/alpha) inside a kernel: table in VMEM scratch, digit loop."""
    if fc.ladder.startswith("chainseg"):
        # segmented straight-line schedule: bounded Mosaic compile time
        return lo.exp_inv_alpha_chain_seg(
            x, fc, seg_size=lo.chain_seg_size(fc.ladder)
        )
    if fc.ladder.startswith("chain"):
        # straight-line register schedule; no table, no dynamic slicing
        return lo.exp_inv_alpha_chain(x, fc, streams=lo.chain_streams(fc.ladder))
    if fc.ladder == "sw4":
        return _exp_inv_alpha_sw_kernel(x, fc, digits_ref, table_ref)
    L = fc.n_limbs
    Ls = _table_stride(L)
    B = x.shape[1]

    # Build table rows x^0..x^15 at aligned stride: table_ref[k*Ls : k*Ls+L].
    one = jnp.broadcast_to(
        jnp.asarray(fc.one_mont, dtype=jnp.int32)[:, None], (L, B)
    )
    table_ref[0:L, :] = one
    table_ref[Ls : Ls + L, :] = x
    powers = {1: x}
    cur = x
    for k in range(2, 16):
        if k % 2 == 0:
            cur = lo.mont_sqr(powers[k // 2], fc, lazy=True)
        else:
            cur = lo.mont_mul(powers[k - 1], x, fc, lazy=True)
        powers[k] = cur
        table_ref[k * Ls : k * Ls + L, :] = cur

    digits = fc.inv_alpha_digits
    first = int(digits[0])
    acc0 = powers[first] if first > 0 else one

    def body(i, acc):
        for _ in range(4):
            acc = lo.mont_sqr(acc, fc, lazy=True)
        d = digits_ref[i]
        start = pl.multiple_of(d * Ls, 8)
        t = table_ref[pl.ds(start, L), :]
        return lo.mont_mul(acc, t, fc, lazy=True)

    acc = jax.lax.fori_loop(1, int(digits.shape[0]), body, acc0)
    return lo.canonicalize(acc, fc)


def _sbox_layer_kernel(state, cols, fc: FieldConsts, digits_ref, table_ref):
    """Open Flystel (traits.rs:328-358) with the in-kernel exp ladder.

    All columns are folded into one ladder call along the batch axis: the
    ladder's sequential dependency chain (the dominant latency) runs once
    per round instead of once per column.
    """
    s = list(state)
    B = s[0].shape[1]
    xs = []
    for i in range(cols):
        x = lo.sub_mod(
            s[i], lo.mul_const(lo.mont_sqr(s[cols + i], fc), fc.beta_mont, fc), fc
        )
        xs.append(x)
    xcat = xs[0] if cols == 1 else jnp.concatenate(xs, axis=1)
    ecat = _exp_inv_alpha_kernel(xcat, fc, digits_ref, table_ref)
    for i in range(cols):
        e = ecat if cols == 1 else ecat[:, i * B : (i + 1) * B]
        y = lo.sub_mod(s[cols + i], e, fc)
        x = lo.add_mod(
            xs[i], lo.mul_const(lo.mont_sqr(y, fc), fc.beta_mont, fc), fc
        )
        x = lo.add_const(x, fc.delta_mont, fc)
        s[i], s[cols + i] = x, y
    return s


def _mds_layer_kernel(state, cols, fc: FieldConsts):
    from ..permutation.batched import _mds_layer

    return _mds_layer(state, cols, fc)


def _permutation_body(state_parts, inst, fc, cd_ref, digits_ref, table_ref):
    """Full permutation on a list of WIDTH (L, B) values."""
    cols = inst.columns
    L = fc.n_limbs

    def round_body(r, parts):
        parts = list(parts)
        cd = cd_ref[pl.ds(r, 1), :]  # (1, 2*cols*L)
        for i in range(cols):
            c = cd[0, i * L : (i + 1) * L][:, None]
            d = cd[0, (cols + i) * L : (cols + i + 1) * L][:, None]
            parts[i] = lo.add_mod(
                parts[i], jnp.broadcast_to(c, parts[i].shape), fc
            )
            parts[cols + i] = lo.add_mod(
                parts[cols + i], jnp.broadcast_to(d, parts[cols + i].shape), fc
            )
        parts = _mds_layer_kernel(parts, cols, fc)
        parts = _sbox_layer_kernel(parts, cols, fc, digits_ref, table_ref)
        return tuple(parts)

    parts = jax.lax.fori_loop(
        0, inst.rounds, round_body, tuple(state_parts)
    )
    return _mds_layer_kernel(list(parts), cols, fc)


def _cd_operand(inst: InstanceParams) -> np.ndarray:
    """Round constants packed as (rounds, 2*cols*L) int32 (Montgomery)."""
    C, D = round_constant_limbs(inst)  # (rounds, cols, L) each
    R = inst.rounds
    return np.concatenate([C.reshape(R, -1), D.reshape(R, -1)], axis=1)


def _fconst_operand(fc: FieldConsts) -> np.ndarray:
    """Per-field constant rows consumed inside the kernel: a Pallas kernel
    cannot capture array constants, so limb_ops' FieldConsts arrays are
    rebound to rows of this VMEM operand (see _kernel_fc)."""
    return np.stack(
        [fc.p_limbs, fc.one_mont, fc.beta_mont, fc.delta_mont, fc.pprime_limbs]
    )


_FCONST_ROWS = 5


def _kernel_fc(fc: FieldConsts, fconst_ref, mxu_refs=None) -> FieldConsts:
    fc = fc._replace(
        p_limbs=fconst_ref[0, :],
        one_mont=fconst_ref[1, :],
        beta_mont=fconst_ref[2, :],
        delta_mont=fconst_ref[3, :],
        pprime_limbs=fconst_ref[4, :],
    )
    if mxu_refs is not None:
        from .mxu_ops import MxuConsts

        vals = [r[...] for r in mxu_refs]
        fc = fc._replace(mxu=MxuConsts(
            w_pprime=vals[0], w_p=vals[1],
            w_pprime_bd=vals[2] if len(vals) > 2 else None,
            w_p_bd=vals[3] if len(vals) > 2 else None,
            streams=fc.mxu.streams,
        ))
    return fc


def _mxu_arrays(fc: FieldConsts):
    """Host numpy operands for the MXU constant-conv matmuls (None when the
    mul impl is VPU-only).  Includes the block-diagonal stream-fused
    operands when the ladder declares streams (chain2/chain3)."""
    if not fc.mul_impl.startswith("mxu"):
        return None
    arrs = [np.asarray(fc.mxu.w_pprime), np.asarray(fc.mxu.w_p)]
    if fc.mxu.w_pprime_bd is not None:
        arrs += [np.asarray(fc.mxu.w_pprime_bd), np.asarray(fc.mxu.w_p_bd)]
    return tuple(arrs)


def _digits_operand(fc: FieldConsts) -> np.ndarray:
    """SMEM schedule operand: base-16 digit string (fixed4), the (2, S)
    sliding-window schedule (sw4), or a placeholder (chain: the schedule is
    baked into the straight-line kernel body)."""
    if fc.ladder.startswith("chain"):
        return np.zeros((1,), dtype=np.int32)
    if fc.ladder == "sw4":
        return fc.sw_sched
    return fc.inv_alpha_digits.astype(np.int32)


def _table_entries(fc: FieldConsts) -> int:
    if fc.ladder.startswith("chain"):
        return 1  # minimal (unused) scratch
    return 8 if fc.ladder == "sw4" else 16


@lru_cache(maxsize=64)
def permutation_pallas(
    inst: InstanceParams,
    block_b: int | None = None,
    interpret: bool = False,
    mul_impl: str | None = DEFAULT_MUL_IMPL,
    ladder: str | None = DEFAULT_LADDER,
):
    """Batched permutation: int32[WIDTH*L, N] -> int32[WIDTH*L, N].

    Any N: the batch is zero-padded up to a multiple of block_b (zero limbs
    are the valid field element 0) and the pad lanes sliced off the output.
    """
    mul_impl = mul_impl or default_mul_impl(inst)
    block_b = block_b or default_block_b(inst, mul_impl)
    ladder = ladder or default_ladder(inst)
    fc = field_consts(inst.field, mul_impl, ladder)
    L = fc.n_limbs
    width = inst.width
    cd = _cd_operand(inst)
    digits = _digits_operand(fc)
    fconst = _fconst_operand(fc)

    mxu_ops_arrays = _mxu_arrays(fc)
    n_mxu = len(mxu_ops_arrays) if mxu_ops_arrays else 0
    with_sos = fc.mul_impl in ("mxu2", "mxu3")
    with_seg = fc.ladder.startswith("chainseg")

    def kernel(fconst_ref, cd_ref, digits_ref, *rest):
        rest = list(rest)
        sos_ref = rest.pop() if with_sos else None
        seg_ref = rest.pop() if with_seg else None
        mxu_refs = rest[:n_mxu] if n_mxu else None
        in_ref, out_ref, table_ref = rest[n_mxu:]
        kfc = _kernel_fc(fc, fconst_ref, mxu_refs)
        if sos_ref is not None:
            kfc = kfc._replace(sos_scratch=sos_ref)
        if seg_ref is not None:
            kfc = kfc._replace(seg_scratch=seg_ref)
        parts = [in_ref[w * L : (w + 1) * L, :] for w in range(width)]
        parts = _permutation_body(parts, inst, kfc, cd_ref, digits_ref, table_ref)
        for w in range(width):
            out_ref[w * L : (w + 1) * L, :] = parts[w]

    @jax.jit
    def run(states):
        n = states.shape[1]
        n_pad = -(-n // block_b) * block_b
        if n_pad != n:
            states = jnp.pad(states, ((0, 0), (0, n_pad - n)))
        in_specs = [
            pl.BlockSpec((_FCONST_ROWS, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cd.shape[0], cd.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands = [jnp.asarray(fconst), jnp.asarray(cd), jnp.asarray(digits)]
        if mxu_ops_arrays is not None:
            for w in mxu_ops_arrays:
                in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
                operands.append(jnp.asarray(w))
        in_specs.append(pl.BlockSpec((width * L, block_b), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(states)
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // block_b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((width * L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((width * L, n_pad), jnp.int32),
            scratch_shapes=(
                [pltpu.VMEM((_table_entries(fc) * _table_stride(L), inst.columns * block_b), jnp.int32)]
                + ([pltpu.VMEM((_seg_rows(fc), inst.columns * block_b), jnp.int32)]
                   if with_seg else [])
                + ([pltpu.VMEM((_sos_rows(fc), inst.columns * block_b), jnp.int32)]
                   if with_sos else [])
            ),
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*operands)
        return out if n_pad == n else out[:, :n]

    return run


@lru_cache(maxsize=64)
def sponge_pallas(
    inst: InstanceParams,
    num_elements: int,
    block_b: int | None = None,
    interpret: bool = False,
    mul_impl: str | None = DEFAULT_MUL_IMPL,
    ladder: str | None = DEFAULT_LADDER,
):
    """Fused fixed-length sponge: int32[E*L, N] -> int32[DIGEST*L, N].

    The whole absorb loop runs inside ONE Pallas dispatch (VERDICT r3 item
    7): the sponge state lives in a VMEM scratch that persists across the
    sequential TPU grid, message rate-blocks stream in via the grid's inner
    axis (Pallas double-buffers the next chunk's DMA behind the current
    permutation), and the digest is written once at the final step.  This
    replaces the lax.scan composition in modes/batched.py, which issued one
    kernel dispatch per rate-block (~110 for a 10KB message) and
    round-tripped the full state through HBM between dispatches.

    Semantics: absorb each rate-block into the rate rows then permute; after
    the last full block, absorb the tail elements and the sigma 1, permute
    once more iff the tail is non-empty, digest = state[:DIGEST]
    (reference src/<field>/anemoi_*/hasher.rs:92-128; golden.sponge_hash is
    the oracle).  The tail/sigma absorb is folded into one extra grid step
    guarded by pl.when, so the kernel contains a single permutation body
    regardless of message length.  Requires num_elements >= rate (callers
    fall back to the scan path below that)."""
    mul_impl = mul_impl or default_mul_impl(inst)
    block_b = block_b or default_block_b(inst, mul_impl)
    ladder = ladder or default_ladder(inst)
    fc = field_consts(inst.field, mul_impl, ladder)
    L = fc.n_limbs
    width, rate, ds = inst.width, inst.rate, inst.digest_size
    E = num_elements
    full_blocks = E // rate
    tail = E % rate
    assert full_blocks >= 1, "sponge_pallas needs at least one full rate block"
    n_steps = full_blocks + (1 if tail else 0)
    # Mosaic requires row-block sizes divisible by 8: each rate-block's
    # rate*L rows are padded to an aligned stride host-side (run() below)
    RS = -(-rate * L // 8) * 8
    TS = -(-max(tail, 1) * L // 8) * 8
    OS = -(-ds * L // 8) * 8  # output rows, same alignment rule
    cd = _cd_operand(inst)
    digits = _digits_operand(fc)
    fconst = _fconst_operand(fc)

    mxu_ops_arrays = _mxu_arrays(fc)
    n_mxu = len(mxu_ops_arrays) if mxu_ops_arrays else 0
    with_sos = fc.mul_impl in ("mxu2", "mxu3")
    with_seg = fc.ladder.startswith("chainseg")

    def kernel(fconst_ref, cd_ref, digits_ref, *rest):
        rest = list(rest)
        sos_ref = rest.pop() if with_sos else None
        seg_ref = rest.pop() if with_seg else None
        state_ref = rest.pop()
        table_ref = rest.pop()
        mxu_refs = rest[:n_mxu] if n_mxu else None
        msg_ref, tail_ref, out_ref = rest[n_mxu:]
        kfc = _kernel_fc(fc, fconst_ref, mxu_refs)
        if sos_ref is not None:
            kfc = kfc._replace(sos_scratch=sos_ref)
        if seg_ref is not None:
            kfc = kfc._replace(seg_scratch=seg_ref)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            state_ref[...] = jnp.zeros_like(state_ref)

        @pl.when(j < full_blocks)
        def _absorb():
            for i in range(rate):
                state_ref[i * L : (i + 1) * L, :] = lo.add_mod(
                    state_ref[i * L : (i + 1) * L, :],
                    msg_ref[i * L : (i + 1) * L, :], kfc,
                )

        if tail:
            one = jnp.broadcast_to(
                jnp.asarray(kfc.one_mont, dtype=jnp.int32)[:, None],
                (L, state_ref.shape[1]),
            )

            @pl.when(j == full_blocks)
            def _absorb_tail():
                for i in range(tail):
                    state_ref[i * L : (i + 1) * L, :] = lo.add_mod(
                        state_ref[i * L : (i + 1) * L, :],
                        tail_ref[i * L : (i + 1) * L, :], kfc,
                    )
                state_ref[tail * L : (tail + 1) * L, :] = lo.add_mod(
                    state_ref[tail * L : (tail + 1) * L, :], one, kfc
                )

        parts = [state_ref[w * L : (w + 1) * L, :] for w in range(width)]
        parts = _permutation_body(parts, inst, kfc, cd_ref, digits_ref, table_ref)
        for w in range(width):
            state_ref[w * L : (w + 1) * L, :] = parts[w]

        @pl.when(j == n_steps - 1)
        def _digest():
            # sigma_one (tail == 0): the reference adds sigma to the last
            # capacity element AFTER the final permutation; it never reaches
            # the digest rows, so no state update is needed here.
            out_ref[...] = jnp.zeros_like(out_ref)  # the OS-alignment pad rows
            for i in range(ds):
                out_ref[i * L : (i + 1) * L, :] = parts[i]

    @jax.jit
    def run(elems):
        # elems: (E*L, N) int32, element-major (elems.reshape from (E, L, N))
        n = elems.shape[1]
        n_pad = -(-n // block_b) * block_b
        if n_pad != n:
            elems = jnp.pad(elems, ((0, 0), (0, n_pad - n)))
        main = elems[: full_blocks * rate * L]
        if RS != rate * L:
            main = jnp.pad(
                main.reshape(full_blocks, rate * L, n_pad),
                ((0, 0), (0, RS - rate * L), (0, 0)),
            ).reshape(full_blocks * RS, n_pad)
        if tail:
            tail_rows = elems[full_blocks * rate * L :]
            if TS != tail * L:
                tail_rows = jnp.pad(
                    tail_rows, ((0, TS - tail * L), (0, 0))
                )
        else:
            tail_rows = jnp.zeros((TS, n_pad), jnp.int32)
        in_specs = [
            pl.BlockSpec((_FCONST_ROWS, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cd.shape[0], cd.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands = [jnp.asarray(fconst), jnp.asarray(cd), jnp.asarray(digits)]
        if mxu_ops_arrays is not None:
            for w in mxu_ops_arrays:
                in_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                                             memory_space=pltpu.VMEM))
                operands.append(jnp.asarray(w))
        in_specs.append(pl.BlockSpec(
            (RS, block_b),
            # clamp: the tail/sigma step re-fetches the last full block
            # (harmless; its absorb is pl.when-gated off)
            lambda i, j: (jnp.minimum(j, full_blocks - 1), i),
            memory_space=pltpu.VMEM,
        ))
        operands.append(main)
        in_specs.append(pl.BlockSpec(
            (TS, block_b), lambda i, j: (0, i),
            memory_space=pltpu.VMEM,
        ))
        operands.append(tail_rows)
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // block_b, n_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((OS, block_b), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((OS, n_pad), jnp.int32),
            scratch_shapes=(
                [pltpu.VMEM((_table_entries(fc) * _table_stride(L),
                             inst.columns * block_b), jnp.int32),
                 pltpu.VMEM((width * L, block_b), jnp.int32)]
                + ([pltpu.VMEM((_seg_rows(fc), inst.columns * block_b),
                               jnp.int32)] if with_seg else [])
                + ([pltpu.VMEM((_sos_rows(fc), inst.columns * block_b),
                               jnp.int32)] if with_sos else [])
            ),
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*operands)
        out = out[: ds * L]
        return out if n_pad == n else out[:, :n]

    return run


@lru_cache(maxsize=64)
def jive_pallas(
    inst: InstanceParams,
    k: int = 2,
    block_b: int | None = None,
    interpret: bool = False,
    mul_impl: str | None = DEFAULT_MUL_IMPL,
    ladder: str | None = DEFAULT_LADDER,
):
    """Fused batched Jive-k: int32[WIDTH*L, N] -> int32[(WIDTH//k)*L, N].

    Permutation + feed-forward sum in one kernel -- digests never round-trip
    through HBM as full states (4_3/hasher.rs:161-178).
    """
    mul_impl = mul_impl or default_mul_impl(inst)
    block_b = block_b or default_block_b(inst, mul_impl)
    ladder = ladder or default_ladder(inst)
    assert inst.width % k == 0 and k % 2 == 0
    fc = field_consts(inst.field, mul_impl, ladder)
    L = fc.n_limbs
    width = inst.width
    c = width // k
    cd = _cd_operand(inst)
    digits = _digits_operand(fc)
    fconst = _fconst_operand(fc)

    mxu_ops_arrays = _mxu_arrays(fc)
    n_mxu = len(mxu_ops_arrays) if mxu_ops_arrays else 0
    with_sos = fc.mul_impl in ("mxu2", "mxu3")
    with_seg = fc.ladder.startswith("chainseg")

    def kernel(fconst_ref, cd_ref, digits_ref, *rest):
        rest = list(rest)
        sos_ref = rest.pop() if with_sos else None
        seg_ref = rest.pop() if with_seg else None
        mxu_refs = rest[:n_mxu] if n_mxu else None
        in_ref, out_ref, table_ref = rest[n_mxu:]
        kfc = _kernel_fc(fc, fconst_ref, mxu_refs)
        if sos_ref is not None:
            kfc = kfc._replace(sos_scratch=sos_ref)
        if seg_ref is not None:
            kfc = kfc._replace(seg_scratch=seg_ref)
        parts = [in_ref[w * L : (w + 1) * L, :] for w in range(width)]
        post = _permutation_body(parts, inst, kfc, cd_ref, digits_ref, table_ref)
        for i in range(c):
            acc = lo.add_mod(parts[i], post[i], kfc)
            for j in range(1, k):
                acc = lo.add_mod(acc, parts[i + c * j], kfc)
                acc = lo.add_mod(acc, post[i + c * j], kfc)
            out_ref[i * L : (i + 1) * L, :] = acc

    @jax.jit
    def run(states):
        n = states.shape[1]
        n_pad = -(-n // block_b) * block_b
        if n_pad != n:
            states = jnp.pad(states, ((0, 0), (0, n_pad - n)))
        in_specs = [
            pl.BlockSpec((_FCONST_ROWS, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cd.shape[0], cd.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands = [jnp.asarray(fconst), jnp.asarray(cd), jnp.asarray(digits)]
        if mxu_ops_arrays is not None:
            for w in mxu_ops_arrays:
                in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
                operands.append(jnp.asarray(w))
        in_specs.append(pl.BlockSpec((width * L, block_b), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(states)
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // block_b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((c * L, block_b), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c * L, n_pad), jnp.int32),
            scratch_shapes=(
                [pltpu.VMEM((_table_entries(fc) * _table_stride(L), inst.columns * block_b), jnp.int32)]
                + ([pltpu.VMEM((_seg_rows(fc), inst.columns * block_b), jnp.int32)]
                   if with_seg else [])
                + ([pltpu.VMEM((_sos_rows(fc), inst.columns * block_b), jnp.int32)]
                   if with_sos else [])
            ),
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*operands)
        return out if n_pad == n else out[:, :n]

    return run
