#!/usr/bin/env python
"""Fused MXU-Montgomery prototype benchmark (round-1 VERDICT item 2).

Measures ns/modmul of a fused Pallas kernel running a serial Montgomery
SQUARING chain (the S-box ladder's dominant op) with:
  * cios2   -- the production radix-2^26 VPU path (baseline)
  * mxu     -- constant convolutions as int8 MXU matmuls (mxu_ops)

Method: two fori_loop trip counts; per-iteration cost = slope, cancelling
the ~30-50 ms tunnel dispatch overhead (ROADMAP.md experiment-log method).
Trip counts must be large enough that per-dispatch compute (n_iter x
~0.5-1.5 us) dwarfs tunnel jitter: with n1/n2 = 2k/6k the slope was
observed to swing 40x between runs; the 50k/150k defaults put ~25-225 ms
of compute per dispatch and stabilize it.

    python tools/mxu_prototype.py --block 512 --field vesta
    python tools/mxu_prototype.py --interpret   # CPU correctness smoke only
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anemoi_tpu.ff import limb_ops as lo
from anemoi_tpu.ff import mxu_ops as mx
from anemoi_tpu.fields.params import get_field


def chain_kernel(fc, impl, n_iter, block, interpret=False):
    """int32[L, block] -> int32[L, block]: n_iter serial lazy squarings."""
    L = fc.n_limbs
    mc = mx.mxu_consts(fc) if impl == "mxu" else None
    fconst = np.stack([fc.p_limbs, fc.one_mont, fc.beta_mont, fc.delta_mont,
                       fc.pprime_limbs])

    if impl in ("sos", "sosp"):
        sparse = impl == "sosp"

        def kernel(fconst_ref, in_ref, out_ref, t_ref):
            kfc = fc._replace(p_limbs=fconst_ref[0, :],
                              pprime_limbs=fconst_ref[4, :])

            def body(i, acc):
                return lo.mont_mul_sos_ref(acc, acc, kfc, t_ref, sqr=True,
                                           sparse_p=sparse)

            out_ref[...] = jax.lax.fori_loop(0, n_iter, body, in_ref[...])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, block), jnp.int32),
                scratch_shapes=[pltpu.VMEM((2 * L + 1, block), jnp.int32)],
                interpret=interpret,
            )(jnp.asarray(fconst), x)

        return run

    if impl == "mxu":
        def kernel(fconst_ref, wpp_ref, wp_ref, in_ref, out_ref):
            kfc = fc._replace(p_limbs=fconst_ref[0, :],
                              pprime_limbs=fconst_ref[4, :])
            kmc = mx.MxuConsts(w_pprime=wpp_ref[...], w_p=wp_ref[...])

            def body(i, acc):
                return mx.mont_sqr_mxu(acc, kmc, kfc, lazy=True)

            out_ref[...] = jax.lax.fori_loop(0, n_iter, body, in_ref[...])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, block), jnp.int32),
                interpret=interpret,
            )(jnp.asarray(fconst), jnp.asarray(mc.w_pprime),
              jnp.asarray(mc.w_p), x)
    else:
        def kernel(fconst_ref, in_ref, out_ref):
            kfc = fc._replace(p_limbs=fconst_ref[0, :],
                              pprime_limbs=fconst_ref[4, :])

            def body(i, acc):
                return lo.mont_sqr(acc, kfc, lazy=True)

            out_ref[...] = jax.lax.fori_loop(0, n_iter, body, in_ref[...])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, block), jnp.int32),
                interpret=interpret,
            )(jnp.asarray(fconst), x)

    return run


def measure(fc, impl, block, n1, n2, reps, interpret=False):
    L = fc.n_limbs
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 12, size=(L, block), dtype=np.int32))

    def timed(n):
        run = chain_kernel(fc, impl, n, block, interpret)
        np.asarray(run(x))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = timed(n1), timed(n2)
    per_iter = (t2 - t1) / (n2 - n1)
    return per_iter


def check_correct(fc, impl, block, interpret):
    """8-deep chain vs Python ints."""
    fp = get_field(fc.name)
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(0, 2**62)) * int(rng.integers(1, 2**62)) % fp.p
            for _ in range(block)]
    x = lo.encode_ints(vals, fp)
    run = chain_kernel(fc, impl, 8, block, interpret)
    out = np.asarray(run(jnp.asarray(x)))
    got = lo.decode_ints(np.asarray(lo.canonicalize(out, fc)), fp)
    expect = vals
    for _ in range(8):
        expect = [v * v % fp.p for v in expect]
    # Montgomery form cancels in squaring count: x*R -> (x*R)^2*R^-1 = x^2*R
    assert got == expect, f"{impl}: chain mismatch"
    print(f"[proto] {impl} 8-deep chain bit-exact over {block} lanes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--field", default="vesta")
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--impls", default="cios2,mxu")
    ap.add_argument("--n1", type=int, default=50000)
    ap.add_argument("--n2", type=int, default=150000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    fp = get_field(args.field)
    results = {}
    for impl in args.impls.split(","):
        mul_impl = "cios2" if impl in ("mxu", "sos", "sosp") else impl
        fc = lo.field_consts(fp, mul_impl=mul_impl)
        if not args.skip_check:
            check_correct(fc, impl, min(args.block, 128), args.interpret)
        if args.interpret:
            continue
        per = measure(fc, impl, args.block, args.n1, args.n2, args.reps)
        results[impl] = per
        print(f"[proto] {args.field} {impl}: {per*1e9:7.1f} ns per lazy sqr "
              f"({per*1e9/args.block*512:6.1f} ns per 512 lanes)")
    if "cios2" in results and "mxu" in results:
        print(f"[proto] mxu speedup vs cios2: "
              f"{results['cios2']/results['mxu']:.2f}x")


if __name__ == "__main__":
    main()
