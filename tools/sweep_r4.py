#!/usr/bin/env python
"""Round-4 kernel config sweep on the attached TPU.

Focus: the fori-segmented chain ladder (chainseg<N>, VERDICT r3 item 3).
Three questions, answered by measurement:
  1. compile time: does segmenting the 293/448-op straight-line chain into
     N-op lax.switch branches bound Mosaic compile time (target < 60 s)?
  2. throughput: what does segmentation cost at the shipped block (3072)?
  3. unblocked fronts: blocks >= 4096 on vesta (lifted VMEM cap) and the
     chain ladder at L=30 (bls12_377/381), both compile-infeasible with the
     unrolled chain.

    python tools/sweep_r4.py [--set seg_vesta|seg_blocks|seg_bls|...] [--n EXP2]

One JSON line per config: {..., "rate", "secs"} ("secs" includes compile).
"""

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench

# (field, instance, mul_impl, ladder, block)
SEG_VESTA = [
    # segmentation cost/benefit at the shipped config (chain@3072: 196.5k/s,
    # 120-203 s compile)
    ("vesta", "anemoi_2_1", "mxu", "chainseg64", 3072),
    ("vesta", "anemoi_2_1", "mxu", "chainseg96", 3072),
    ("vesta", "anemoi_2_1", "mxu", "chainseg32", 3072),
]

SEG_BLOCKS = [
    # blocks past the old compile/VMEM wall, feasible only if chainseg
    # bounds compile
    ("vesta", "anemoi_2_1", "mxu", "chainseg64", 4096),
    ("vesta", "anemoi_2_1", "mxu", "chainseg64", 6144),
    ("vesta", "anemoi_2_1", "mxu", "chainseg64", 8192),
]

SEG_BLS = [
    # the 448-op L=30 chain, compile-infeasible unrolled (r3: 390 s at
    # block 1024 just for the ladder); sw4@1024 baseline is 77.5k/s
    ("bls12_377", "anemoi_2_1", "mxu", "chainseg64", 1024),
    ("bls12_377", "anemoi_2_1", "mxu", "chainseg64", 1536),
    ("bls12_377", "anemoi_2_1", "mxu", "chainseg64", 2048),
]

BLOCKS_LIFTED = [
    # the two fronts the 16MB scoped-VMEM lift (ANEMOI_VMEM_LIMIT default
    # 100MB, r3) re-opened but nobody re-measured: unrolled-chain blocks
    # past 3072 on vesta (compile is minutes ONCE, then persistently
    # cached), and the bls12_377 sw4 blocks past 1024 that used to OOM.
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 1536),
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 2048),
    ("vesta", "anemoi_2_1", "mxu", "chain", 4096),
    ("vesta", "anemoi_2_1", "mxu", "chain", 6144),
]

BLOCKS_LIFTED2 = [
    # follow-ups: bls sw4 still rising at 2048 (81.8k); mxu3 has never
    # been timed on device (VERDICT r3 weak #4: time it or delete it)
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 3072),
    ("bls12_377", "anemoi_2_1", "mxu3", "sw4", 2048),
    ("vesta", "anemoi_2_1", "mxu3", "chain", 3072),
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 4096),
]

SEG_BLS2 = [
    ("bls12_377", "anemoi_2_1", "mxu", "chainseg32", 1024),
    ("bls12_381", "anemoi_2_1", "mxu", "chainseg64", 1024),
    ("bls12_377", "anemoi_4_3", "mxu", "chainseg64", 512),
]


def run(configs, n, reps):
    results = []
    for field, iname, impl, ladder, block in configs:
        t0 = time.time()
        try:
            rate = bench.bench_jive(
                field, iname, n=n, block=block, reps=reps,
                mul_impl=impl, ladder=ladder,
            )
            rec = {"field": field, "inst": iname, "impl": impl,
                   "ladder": ladder, "block": block, "rate": round(rate, 1),
                   "secs": round(time.time() - t0, 1)}
        except Exception as e:
            rec = {"field": field, "inst": iname, "impl": impl,
                   "ladder": ladder, "block": block, "error": repr(e),
                   "secs": round(time.time() - t0, 1)}
            traceback.print_exc(file=sys.stderr)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="seg_vesta",
                    choices=["seg_vesta", "seg_blocks", "seg_bls", "seg_bls2",
                             "blocks_lifted", "blocks_lifted2", "all"])
    ap.add_argument("--n", type=int, default=20, help="log2 batch size")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    configs = {"seg_vesta": SEG_VESTA, "seg_blocks": SEG_BLOCKS,
               "seg_bls": SEG_BLS, "seg_bls2": SEG_BLS2,
               "blocks_lifted": BLOCKS_LIFTED,
               "blocks_lifted2": BLOCKS_LIFTED2,
               "all": SEG_VESTA + SEG_BLOCKS + SEG_BLS + SEG_BLS2}[args.set]
    run(configs, 1 << args.n, args.reps)


if __name__ == "__main__":
    main()
