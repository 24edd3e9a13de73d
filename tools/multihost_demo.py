#!/usr/bin/env python
"""Multi-host (multi-process) Merkle forest demo over jax.distributed.

Spawns N processes on this machine (CPU backend, one virtual device each),
brings up the jax.distributed process group (the DCN-equivalent transport),
builds the sharded Merkle forest across the global mesh, and checks every
process computes the same root as a single-process run.

    python tools/multihost_demo.py --procs 2 --leaves 64

This is the same code path a real TPU pod slice runs: per-host leaf shards,
local subtree reduction, one all_gather of shard roots (the only DCN
traffic), replicated top tree.
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def worker(proc_id: int, n_procs: int, n_leaves: int, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, str(REPO))
    import jax

    # env vars alone are not enough: an axon sitecustomize module may have
    # registered a TPU plugin at interpreter start, which would attach every
    # worker to the same physical chip instead of federating CPU devices.
    jax.config.update("jax_platforms", "cpu")
    # gloo TCP collectives make the per-process CPU devices federate into
    # one global 2-device platform (the DCN-equivalent transport on CPU)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # NOTE: deliberately NOT enabling the persistent compilation cache here:
    # cross-process runs loading an XLA:CPU AOT executable cached under
    # mismatched machine-feature detection were observed to hang inside the
    # gloo collective (one worker never reaches the rendezvous).

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    import numpy as np

    from anemoi_tpu.dist.forest import sharded_merkle_root_fn
    from anemoi_tpu.dist.mesh import chip_mesh
    from anemoi_tpu.ff import golden
    from anemoi_tpu.ff.limb_ops import decode_ints, encode_ints
    from anemoi_tpu.fields.params import get_instance

    inst = get_instance("vesta", "anemoi_2_1")
    fp = inst.field
    rng = np.random.default_rng(0)  # same leaves on every process
    leaves_int = [int(rng.integers(0, 2**62)) for _ in range(n_leaves)]
    leaves = encode_ints(leaves_int, fp)

    if jax.device_count() < n_procs:
        # Federation failed: the demo must FAIL, not silently pass -- a
        # green light that verifies nothing is worse than a red one.
        print(
            f"[proc {proc_id}] FAIL: global devices={jax.device_count()} < "
            f"{n_procs} (cross-process CPU federation did not come up)",
            flush=True,
        )
        sys.exit(2)
    mesh = chip_mesh()
    fn = sharded_merkle_root_fn(inst, mesh, n_leaves, chunk_b=16)

    # global array: each process contributes its shard
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, mesh.axis_names[-1]))
    shard = n_leaves // n_procs
    local = leaves[:, proc_id * shard : (proc_id + 1) * shard]
    garr = jax.make_array_from_single_device_arrays(
        (fp.n_limbs, n_leaves),
        sharding,
        [jax.device_put(local, jax.local_devices()[0])],
    )
    root = fn(garr)
    root_int = decode_ints(np.asarray(root), fp)[0]

    # single-process truth via golden chained jive
    level = list(leaves_int)
    while len(level) > 1:
        level = [
            golden.jive_compress(inst, level[i : i + 2])[0]
            for i in range(0, len(level), 2)
        ]
    ok = root_int == level[0]
    print(f"[proc {proc_id}] root match: {ok}", flush=True)
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--leaves", type=int, default=64)
    ap.add_argument("--port", type=int, default=19765)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.procs, args.leaves, args.port)
        return

    procs = []
    for i in range(args.procs):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        log = open(f"/tmp/multihost_worker_{i}.log", "w")
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "--procs", str(args.procs),
                 "--leaves", str(args.leaves), "--port", str(args.port),
                 "--worker", str(i)],
                env=env, stdout=log, stderr=subprocess.STDOUT,
            )
        )
    codes = [p.wait(timeout=900) for p in procs]
    print("multihost demo:", "OK" if not any(codes) else f"FAILED {codes}")
    sys.exit(max(codes))


if __name__ == "__main__":
    main()
