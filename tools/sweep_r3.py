#!/usr/bin/env python
"""Round-3 kernel config sweep on the attached TPU.

Measures bench.bench_jive for a list of (field, instance, mul_impl, ladder,
block) configs and prints one JSON line per result -- the measurements that
decide pallas_backend's per-instance defaults (VERDICT r2 items 1-3).

    python tools/sweep_r3.py [--set headline|limbs30|all] [--n EXP2]
"""

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


HEADLINE = [
    # the r2 measured frontier: mxu still rising at 2048; finish the sweep
    # MEASURED r3: 2048 -> 195,482/s; 3072 -> 196,505/s; 4096 -> Mosaic
    # VMEM OOM (scoped 16M limit exceeded by 3.17M).  Plateau at 3072.
    ("vesta", "anemoi_2_1", "mxu", "chain", 2048),
    ("vesta", "anemoi_2_1", "mxu", "chain", 3072),
    ("vesta", "anemoi_2_1", "mxu", "chain", 4096),
]

# tail configs split out after the first run timed out mid-set
HEADLINE2 = [
    ("vesta", "anemoi_2_1", "mxu2", "chain", 2048),
    # 4_3 at the block the mul-impl-aware default resolves to (3072/cols)
    ("vesta", "anemoi_4_3", "mxu", "chain", 1536),
]

STREAMS = [
    # stream-fused block-diagonal matmuls: K = S*2L contraction (the
    # K>=128 experiment).  Blocks must be divisible by the stream count.
    ("vesta", "anemoi_2_1", "mxu", "chain3", 1536),
    ("vesta", "anemoi_2_1", "mxu", "chain3", 3072),
    ("vesta", "anemoi_2_1", "mxu", "chain2", 2048),
    ("vesta", "anemoi_2_1", "mxu", "chain2", 3072),
]

LIMBS30 = [
    # 30-limb fields (VERDICT item 3): mxu never tried at L=30, where
    # K=2L=60 wastes less MXU padding than 40.
    # MEASURED r3: 1024 -> 77,518/s (+30% over cios2's 59.8k);
    # 512 -> 63,644; 2048 -> Mosaic scoped-VMEM OOM at L=30.
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 1024),
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 2048),
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 512),
    ("bls12_381", "anemoi_2_1", "mxu", "sw4", 2048),
]

LIMBS30B = [
    # follow-up: the block frontier between 1024 and the OOM wall, the
    # bls12_381 default, and the chain ladder under mxu at L=30
    ("bls12_377", "anemoi_2_1", "mxu", "sw4", 1536),
    ("bls12_381", "anemoi_2_1", "mxu", "sw4", 1024),
    ("bls12_377", "anemoi_2_1", "mxu", "chain", 1024),
    ("bls12_377", "anemoi_4_3", "mxu", "sw4", 512),
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
    ap.add_argument("--set", default="headline",
                    choices=["headline", "headline2", "streams", "limbs30",
                             "limbs30b", "all"])
    ap.add_argument("--n", type=int, default=20, help="log2 batch size")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    configs = {"headline": HEADLINE, "headline2": HEADLINE2,
               "streams": STREAMS, "limbs30": LIMBS30, "limbs30b": LIMBS30B,
               "all": HEADLINE + HEADLINE2 + STREAMS + LIMBS30}[args.set]
    run(configs, 1 << args.n, args.reps)


if __name__ == "__main__":
    main()
