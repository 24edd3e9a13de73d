"""Batched Anemoi permutation over (WIDTH, L, B) limb states.

Generic over the instance registry: one code path serves all 7 fields x 2
instantiations (the reference specializes per field only through constants;
see src/traits.rs:361-378).  The state is a single int32 array of shape
(WIDTH, L, B) in Montgomery form: WIDTH field elements of L limbs over a
batch of B lanes.

Two build modes:
  * loop mode (default): rounds run under lax.fori_loop and the x^(1/alpha)
    ladder under a digit loop -- compact XLA graphs for the jit backend.
  * unrolled mode: everything is straight-line Python-unrolled jnp -- the
    form consumed by the fused Pallas kernel, where Mosaic wants static
    slices and no gather.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import InstanceParams, limbs_from_int
from ..ff import limb_ops as lo
from ..ff.limb_ops import FieldConsts, field_consts


def round_constant_limbs(inst: InstanceParams) -> tuple[np.ndarray, np.ndarray]:
    """C and D as (rounds, columns, L) Montgomery limb arrays."""
    fp = inst.field
    L = fp.n_limbs

    def conv(table):
        out = np.zeros((inst.rounds, inst.columns, L), dtype=np.int32)
        for r in range(inst.rounds):
            for c in range(inst.columns):
                out[r, c] = limbs_from_int(fp.to_mont(table[r * inst.columns + c]), L)
        return out

    return conv(inst.C), conv(inst.D)


def _ark_layer(state, Cr, Dr, cols, fc: FieldConsts):
    """state[i] += C[r][i]; state[cols+i] += D[r][i] (traits.rs:113-125).

    Cr/Dr: (cols, L) -- numpy (unrolled mode) or traced rows (loop mode).
    """
    parts = list(state)
    for i in range(cols):
        c = jnp.asarray(Cr[i], dtype=jnp.int32)[:, None]
        d = jnp.asarray(Dr[i], dtype=jnp.int32)[:, None]
        parts[i] = lo.add_mod(parts[i], jnp.broadcast_to(c, parts[i].shape), fc)
        parts[cols + i] = lo.add_mod(
            parts[cols + i], jnp.broadcast_to(d, parts[cols + i].shape), fc
        )
    return parts


def _mul_g(a, fc: FieldConsts):
    return lo.mul_const(a, fc.beta_mont, fc)


def _mds_internal(s, cols, fc: FieldConsts):
    """Half-state MDS product for the 3/4-column paths (traits.rs:298-323)."""
    s = list(s)
    if cols == 3:
        tmp = lo.add_mod(s[0], _mul_g(s[2], fc), fc)
        s[2] = lo.add_mod(lo.add_mod(s[2], s[1], fc), _mul_g(s[0], fc), fc)
        s[0] = lo.add_mod(tmp, s[2], fc)
        s[1] = lo.add_mod(s[1], tmp, fc)
    elif cols == 4:
        s[0] = lo.add_mod(s[0], s[1], fc)
        s[2] = lo.add_mod(s[2], s[3], fc)
        s[3] = lo.add_mod(s[3], _mul_g(s[0], fc), fc)
        s[1] = _mul_g(lo.add_mod(s[1], s[2], fc), fc)
        s[0] = lo.add_mod(s[0], s[1], fc)
        s[2] = lo.add_mod(s[2], _mul_g(s[3], fc), fc)
        s[1] = lo.add_mod(s[1], s[2], fc)
        s[3] = lo.add_mod(s[3], s[0], fc)
    return s


def _mds_circulant(x, cols, fc: FieldConsts):
    """5/6-column circulant products (traits.rs:188-246) via add/double."""
    total = x[0]
    for v in x[1:]:
        total = lo.add_mod(total, v, fc)
    out = []
    for i in range(cols):
        if cols == 5:
            inner = lo.add_mod(
                lo.add_mod(x[(i + 2) % 5], x[(i + 3) % 5], fc),
                lo.double_mod(x[(i + 4) % 5], fc),
                fc,
            )
            out.append(
                lo.add_mod(lo.add_mod(total, x[(i + 3) % 5], fc), lo.double_mod(inner, fc), fc)
            )
        else:
            inner = lo.add_mod(
                lo.add_mod(x[(i + 2) % 6], x[(i + 3) % 6], fc),
                lo.double_mod(lo.add_mod(x[(i + 4) % 6], x[(i + 5) % 6], fc), fc),
                fc,
            )
            out.append(
                lo.add_mod(
                    lo.add_mod(lo.add_mod(total, x[(i + 3) % 6], fc), x[(i + 5) % 6], fc),
                    lo.double_mod(inner, fc),
                    fc,
                )
            )
    return out


def _pht(s, cols, fc: FieldConsts):
    for i in range(cols):
        s[cols + i] = lo.add_mod(s[cols + i], s[i], fc)
    for i in range(cols):
        s[i] = lo.add_mod(s[i], s[cols + i], fc)
    return s


def _mds_layer(state, cols, fc: FieldConsts):
    """Linear layer + PHT (traits.rs:129-294).  Shipped instances use the
    1/2-column paths; 3-6 columns mirror the reference's wider fast paths."""
    s = list(state)
    if cols == 1:
        s[1] = lo.add_mod(s[1], s[0], fc)
        s[0] = lo.add_mod(s[0], s[1], fc)
        return s
    if cols == 2:
        s[0] = lo.add_mod(s[0], _mul_g(s[1], fc), fc)
        s[1] = lo.add_mod(s[1], _mul_g(s[0], fc), fc)
        s[3] = lo.add_mod(s[3], _mul_g(s[2], fc), fc)
        s[2] = lo.add_mod(s[2], _mul_g(s[3], fc), fc)
        s[2], s[3] = s[3], s[2]
        return _pht(s, 2, fc)
    if cols in (3, 4):
        x = _mds_internal(s[:cols], cols, fc)
        y = _mds_internal(s[cols + 1 :] + s[cols : cols + 1], cols, fc)
        return _pht(x + y, cols, fc)
    if cols in (5, 6):
        x = _mds_circulant(s[:cols], cols, fc)
        y = _mds_circulant(s[cols + 1 :] + s[cols : cols + 1], cols, fc)
        return _pht(x + y, cols, fc)
    raise NotImplementedError(
        "columns > 6 need an explicit MDS matrix (golden.mds_layer handles it)"
    )


def _sbox_layer(state, cols, fc: FieldConsts, *, unroll: bool):
    """Open Flystel (traits.rs:328-358):
    x -= g*y^2 ; y -= x^(1/alpha) ; x += g*y^2 + delta.

    Columns run separately here.  The Pallas kernel folds all columns into
    one ladder along the batch axis (pallas_backend._sbox_layer_kernel) --
    a big latency win under Mosaic, but the same concatenate/slice pattern
    makes XLA:CPU compile time explode (>10x), so the jnp path keeps the
    simple per-column form."""
    s = list(state)
    for i in range(cols):
        x, y = s[i], s[cols + i]
        x = lo.sub_mod(x, _mul_g(lo.mont_sqr(y, fc), fc), fc)
        y = lo.sub_mod(y, lo.exp_inv_alpha(x, fc, unroll=unroll), fc)
        x = lo.add_mod(x, _mul_g(lo.mont_sqr(y, fc), fc), fc)
        x = lo.add_const(x, fc.delta_mont, fc)
        s[i], s[cols + i] = x, y
    return s


def permutation_fn(inst: InstanceParams, *, unroll: bool = False):
    """Returns permute(state: (WIDTH, L, B) int32 Montgomery) -> same shape.

    Full permutation = NUM_ROUNDS x (ark -> mds -> sbox) + final mds
    (traits.rs:370-378).
    """
    fc = field_consts(inst.field)
    cols = inst.columns
    C, D = round_constant_limbs(inst)

    if unroll:

        def permute(state):
            parts = [state[i] for i in range(inst.width)]
            for r in range(inst.rounds):
                parts = _ark_layer(parts, C[r], D[r], cols, fc)
                parts = _mds_layer(parts, cols, fc)
                parts = _sbox_layer(parts, cols, fc, unroll=True)
            parts = _mds_layer(parts, cols, fc)
            return jnp.stack(parts, axis=0)

        return permute

    C_arr = jnp.asarray(C)
    D_arr = jnp.asarray(D)

    def permute(state):
        def body(r, st):
            parts = [st[i] for i in range(inst.width)]
            parts = _ark_layer(parts, C_arr[r], D_arr[r], cols, fc)
            parts = _mds_layer(parts, cols, fc)
            parts = _sbox_layer(parts, cols, fc, unroll=False)
            return jnp.stack(parts, axis=0)

        state = jax.lax.fori_loop(0, inst.rounds, body, state)
        parts = _mds_layer([state[i] for i in range(inst.width)], cols, fc)
        return jnp.stack(parts, axis=0)

    return permute


@lru_cache(maxsize=64)
def jit_permutation(inst: InstanceParams):
    """jit-compiled loop-mode permutation for an instance (cached)."""
    return jax.jit(permutation_fn(inst, unroll=False))
