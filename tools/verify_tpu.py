#!/usr/bin/env python
"""On-device verification of every fused Pallas kernel against the golden
model: permutation + Jive (2_1 and 4_3), pallas-backed sponge, and a Merkle
root, for the fields given on the command line.

    python tools/verify_tpu.py [--fields vesta,bls12_381] [--interpret]

Run this on the attached TPU before trusting bench numbers after a kernel
change.  --interpret runs the same checks through the Pallas interpreter
(CPU), which is slow but hardware-independent.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'} {name}", flush=True)
    return ok


def verify_field(field, interpret, mul_impl, block=128, ladder="sw4"):
    from anemoi_tpu.ff import golden
    from anemoi_tpu.ff import pallas_backend as pb
    from anemoi_tpu.fields.params import get_instance
    from anemoi_tpu.modes import batched as bm

    ok = True
    rng = np.random.default_rng(0)
    for iname in ("anemoi_2_1", "anemoi_4_3"):
        inst = get_instance(field, iname)
        B = block
        states = [
            [int(rng.integers(0, 2**62)) for _ in range(inst.width)]
            for _ in range(B)
        ]
        arr = bm.encode_states(inst, states).reshape(-1, B)

        run = pb.permutation_pallas(inst, block, interpret, mul_impl, ladder)
        out = np.asarray(run(arr)).reshape(inst.width, -1, B)
        ok &= check(
            f"{field}/{iname} permutation ({mul_impl}/{ladder})",
            bm.decode_states(inst, out)
            == [golden.permutation(inst, s) for s in states],
        )

        k = inst.width // inst.digest_size
        runj = pb.jive_pallas(inst, k, block, interpret, mul_impl, ladder)
        outj = np.asarray(runj(arr)).reshape(inst.digest_size, -1, B)
        ok &= check(
            f"{field}/{iname} jive-{k} ({mul_impl}/{ladder})",
            bm.decode_states(inst, outj)
            == [golden.jive_compress_k(inst, s, k) for s in states],
        )
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fields", default="vesta")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--mul-impl", default=None, help="cios, parallel, or both")
    ap.add_argument("--ladder", default=None, help="sw4 | fixed4 | chain")
    ap.add_argument("--block", type=int, default=128)
    args = ap.parse_args()

    impls = (
        [args.mul_impl] if args.mul_impl
        else ["mxu", "mxu2", "cios2", "cios", "parallel"]
    )
    ladders = [args.ladder] if args.ladder else ["sw4", "chain"]
    ok = True
    t0 = time.time()
    for field in args.fields.split(","):
        for impl in impls:
            for ladder in ladders:
                ok &= verify_field(field, args.interpret, impl, args.block, ladder)
    print(f"done in {time.time()-t0:.0f}s: {'ALL PASS' if ok else 'FAILURES'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
