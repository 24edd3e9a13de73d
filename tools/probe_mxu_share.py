#!/usr/bin/env python
"""Timing probe: decompose the fused kernel's time into MXU vs VPU shares.

Runs the vesta 2_1 Jive kernel with (a) both constant-conv matmuls,
(b) the U matmul skipped, (c) both matmuls skipped -- the skip variants
compute WRONG hashes (env ANEMOI_PROBE_SKIP_*) and exist purely to measure
how much wall time the int8 MXU dispatches account for at production block
sizes.  Results go to stderr + one JSON line on stdout.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_one(env_flags, block, n=1 << 20, reps=3):
    code = f"""
import time, sys, json
from pathlib import Path
sys.path.insert(0, {str(Path(__file__).resolve().parent.parent)!r})
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", str(Path({str(Path(__file__).resolve().parent.parent)!r}) / ".jax_cache"))
from anemoi_tpu.fields.params import get_instance
from anemoi_tpu.ff.pallas_backend import jive_pallas
inst = get_instance("vesta", "anemoi_2_1")
L = inst.field.n_limbs
kern = jive_pallas(inst, 2, block_b={block}, mul_impl="mxu", ladder="chain")
rng = np.random.default_rng(0)
host = rng.integers(0, 1 << 12, size=(inst.width * L, {n}), dtype=np.int32)
flat = jax.device_put(jnp.asarray(host))
run = jax.jit(lambda x: jnp.sum(kern(x)))
np.asarray(run(flat))
times = []
for _ in range({reps}):
    t0 = time.perf_counter(); np.asarray(run(flat)); times.append(time.perf_counter() - t0)
print(json.dumps({{"dt": float(np.median(times))}}))
"""
    env = dict(os.environ)
    for k in ("ANEMOI_PROBE_SKIP_U", "ANEMOI_PROBE_SKIP_PPRIME"):
        env.pop(k, None)
    env.update(env_flags)
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1100)
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-800:])
    return json.loads(res.stdout.strip().splitlines()[-1])["dt"]


def main():
    block = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    n = 1 << 20
    out = {"block": block, "n": n}
    for name, flags in [
        ("full", {}),
        ("skip_u", {"ANEMOI_PROBE_SKIP_U": "1"}),
        ("skip_both", {"ANEMOI_PROBE_SKIP_U": "1",
                       "ANEMOI_PROBE_SKIP_PPRIME": "1"}),
    ]:
        t0 = time.perf_counter()
        dt = run_one(flags, block, n)
        out[name] = round(dt, 4)
        print(f"[probe] {name}: {dt*1e3:.1f} ms ({n/dt:,.0f}/s)  "
              f"[{time.perf_counter()-t0:.0f}s incl compile]", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
