#!/usr/bin/env python
"""Microbenchmark: cost of row-wise ops at different value layouts.

Hypothesis: a 1D (512,) int32 value inside a Pallas TPU kernel is laid out
lane-only (multiple vregs at 1/8 sublane utilization), so the CIOS kernels'
per-digit scalar work (m/carry rows) costs far more than its element count
suggests; reshaping the batch to (8, 128) tiles would make row ops dense.

Method: fori_loop with a large trip count; per-iteration slope between two
trip counts cancels dispatch overhead (same method as ROADMAP.md's MXU
microbenchmarks).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_counted(body, n_iter):
    def kernel(x_ref, o_ref):
        x = x_ref[...]

        def step(i, acc):
            return body(acc, i)

        acc = jax.lax.fori_loop(0, n_iter, step, x)
        o_ref[...] = acc

    return kernel


def time_body(shape, body, n1=20000, n2=60000, reps=5):
    x = jnp.asarray(np.random.default_rng(0).integers(1, 1000, size=shape, dtype=np.int32))

    def run(n_iter):
        f = pl.pallas_call(
            _kernel_counted(body, n_iter),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )
        g = jax.jit(f)
        g(x).block_until_ready()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            g(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    def mad(acc, i):
        return (acc * acc + i) & 0x1FFF

    # one multiply-add+mask per iteration at each layout
    for shape in [(512,), (1024,), (4, 128), (8, 128), (1, 512), (8, 512), (20, 512), (20, 8, 128)]:
        ns = time_body(shape, mad) * 1e9
        per_elem = ns / np.prod(shape)
        print(f"shape {str(shape):>14}: {ns:8.2f} ns/iter  {per_elem:6.3f} ns/elem")


if __name__ == "__main__":
    main()
