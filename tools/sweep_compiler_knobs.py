#!/usr/bin/env python
"""Mosaic compiler-knob experiments on the headline config (VERDICT r3
item 2: attack scheduling with CompilerParams instead of guessing).

Each knob runs in its OWN subprocess (kernels are lru_cached per config and
the knob envs are read at build time), benching vesta 2_1 mxu/chain at the
shipped block.  One JSON line per knob setting.

    python tools/sweep_compiler_knobs.py [--block 4096] [--n 20]
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

KNOBS = [
    ("baseline", {}),
    ("dimsem_parallel", {"ANEMOI_DIMSEM": "parallel"}),
    ("dimsem_arbitrary", {"ANEMOI_DIMSEM": "arbitrary"}),
    ("no_bounds_checks", {"ANEMOI_NO_BOUNDS_CHECKS": "1"}),
    ("internal_scratch_4m", {"ANEMOI_INTERNAL_SCRATCH": str(4 << 20)}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    for name, env in KNOBS:
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import bench\n"
            "r = bench.bench_jive(n=1<<%d, block=%d, reps=%d, mul_impl='mxu', ladder='chain')\n"
            "print('RATE', r)\n" % (str(ROOT), args.n, args.block, args.reps)
        )
        res = subprocess.run(
            [sys.executable, "-c", code], env={**os.environ, **env},
            capture_output=True, text=True, timeout=3000,
        )
        rate = None
        for line in res.stdout.splitlines():
            if line.startswith("RATE "):
                rate = round(float(line.split()[1]), 1)
        compile_s = None
        for line in res.stderr.splitlines():
            if "compile+first" in line:
                compile_s = float(line.split()[-1].rstrip("s"))
        print(json.dumps({"knob": name, "env": env, "rate": rate,
                          "compile_s": compile_s,
                          "rc": res.returncode,
                          **({"err": res.stderr[-300:]} if rate is None else {})}),
              flush=True)


if __name__ == "__main__":
    main()
