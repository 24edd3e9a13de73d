#!/usr/bin/env python
"""Headline benchmark: Vesta Anemoi-2-1 Jive 2-to-1 compressions/sec/chip.

Runs the fused Pallas kernel on the attached TPU (or the jit path on CPU),
with a forced device sync per repetition (a scalar checksum is fetched, so
async dispatch cannot inflate the rate).

Prints ONE json line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is against the reference's single-core Rust rate for the same
op: 129.48 us per 2-to-1 Vesta compression (BASELINE.md, reference
README.md:78) = 7723 hashes/s.

Extra diagnostics go to stderr; pass --all for a multi-config sweep.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_RATE = 1.0 / 129.48e-6  # reference Vesta 2_1 Jive 2-to-1, 1 CPU core


def _timed(fn, arg, reps):
    """Median wall time with forced synchronization via scalar fetch."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(arg))  # scalar checksum -> forces full execution
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_jive(field="vesta", iname="anemoi_2_1", n=1 << 20, block=None, reps=3, mul_impl=None, ladder=None):
    """block/mul_impl/ladder None = the kernel defaults (per-instance
    measured block, cios2, sw4 -- pallas_backend)."""
    from anemoi_tpu.fields.params import get_instance
    from anemoi_tpu.ff.pallas_backend import DEFAULT_LADDER, DEFAULT_MUL_IMPL

    mul_impl = mul_impl or DEFAULT_MUL_IMPL
    ladder = ladder or DEFAULT_LADDER
    inst = get_instance(field, iname)
    L = inst.field.n_limbs
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        from anemoi_tpu.ff.pallas_backend import jive_pallas

        kern = jive_pallas(inst, 2, block_b=block, mul_impl=mul_impl, ladder=ladder)
    else:
        from anemoi_tpu.modes.batched import jive_compress_batch_fn

        n = min(n, 1 << 14)
        jfn = jive_compress_batch_fn(inst, 2)
        kern = lambda x: jfn(x.reshape(inst.width, L, -1))

    rng = np.random.default_rng(0)
    # random 13-bit limb states are valid Montgomery-domain field elements
    # with overwhelming probability for timing purposes; correctness is
    # pinned by the test suite, not the bench.
    flat = jax.device_put(
        jnp.asarray(
            rng.integers(0, 1 << 12, size=(inst.width * L, n), dtype=np.int32)
        )
    )
    run = jax.jit(lambda x: jnp.sum(kern(x)))
    t0 = time.perf_counter()
    np.asarray(run(flat))
    print(f"[bench] compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    dt = _timed(run, flat, reps)
    return n / dt


def bench_sponge_10kb(field="vesta", iname="anemoi_4_3", n_msgs=4096, block=None, reps=2):
    """10KB-message sponge hashing (reference: 20.307 ms/msg single core)."""
    from anemoi_tpu.fields.params import get_instance
    from anemoi_tpu.modes.batched import sponge_hash_batch_fn

    inst = get_instance(field, iname)
    L = inst.field.n_limbs
    E = -(-10240 // inst.field.byte_chunk)  # elements per 10KB message
    on_tpu = jax.default_backend() != "cpu"
    fn = sponge_hash_batch_fn(
        inst, E, backend="pallas" if on_tpu else "jit", block_b=block
    )
    if not on_tpu:
        n_msgs = min(n_msgs, 64)
    rng = np.random.default_rng(0)
    elems = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 12, size=(E, L, n_msgs), dtype=np.int32))
    )
    run = jax.jit(lambda x: jnp.sum(fn(x)))
    np.asarray(run(elems))
    dt = _timed(run, elems, reps)
    return n_msgs / dt


def bench_merkle(field="vesta", iname="anemoi_2_1", n_leaves=1 << 20, block=None, reps=2):
    """Merkle tree root over n_leaves on one chip (leaves/sec)."""
    from anemoi_tpu.fields.params import get_instance
    from anemoi_tpu.merkle.tree import MerkleTree

    inst = get_instance(field, iname)
    L = inst.field.n_limbs
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        n_leaves = min(n_leaves, 1 << 10)
    tree = MerkleTree(
        inst, backend="pallas" if on_tpu else "jit", chunk_b=1 << 14 if on_tpu else 256
    )
    rng = np.random.default_rng(0)
    leaves = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 12, size=(L, n_leaves), dtype=np.int32))
    )
    run = jax.jit(lambda x: jnp.sum(tree.root(x)))
    np.asarray(run(leaves))
    dt = _timed(run, leaves, reps)
    return n_leaves / dt


def bench_matrix(n=1 << 18, block=None, reps=2, out_path="docs/BENCHMARKS.md"):
    """Jive rates for every registered instantiation (the TPU analogue of
    the reference's 7 criterion bench binaries, reference benches/*.rs);
    writes a markdown table."""
    from anemoi_tpu.fields.params import FIELD_NAMES, INSTANCE_NAMES

    # reference i7-9750H single-core 2-to-1 latencies (reference README.md:77-78)
    ref_us = {("bls12_377", "anemoi_2_1"): 429.61, ("bls12_377", "anemoi_4_3"): 485.99,
              ("vesta", "anemoi_2_1"): 129.48, ("vesta", "anemoi_4_3"): 176.58}
    rows = []
    for field in FIELD_NAMES:
        for iname in INSTANCE_NAMES:
            t0 = time.perf_counter()
            rate = bench_jive(field, iname, n=n, block=block, reps=reps)
            ref = ref_us.get((field, iname))
            vs = f"{rate * ref * 1e-6:.1f}x" if ref else "--"
            rows.append((field, iname, rate, vs))
            print(f"[matrix] {field}/{iname}: {rate:,.0f}/s ({vs} vs ref core; "
                  f"{time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    dev = jax.devices()[0].device_kind
    lines = [
        "# Benchmark matrix (generated by `bench.py --matrix`)",
        "",
        f"Jive 2-to-1 compressions/sec on one {dev} chip "
        f"(batch {n}, block {block or 'per-instance default'}, forced sync per rep).",
        "Reference column: upstream single-core i7-9750H rate where published",
        "(reference README.md:77-78).",
        "",
        "| Field | Instance | hashes/s | vs reference core |",
        "|---|---|---|---|",
    ]
    for field, iname, rate, vs in rows:
        lines.append(f"| {field} | {iname} | {rate:,.0f} | {vs} |")
    Path(out_path).write_text("\n".join(lines) + "\n")
    print(f"[matrix] wrote {out_path}", file=sys.stderr)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--block", type=int, default=None,
                    help="kernel batch tile (default: pallas_backend.DEFAULT_BLOCK_B)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all", action="store_true", help="sweep extra configs to stderr")
    ap.add_argument("--matrix", action="store_true",
                    help="bench every instantiation and write docs/BENCHMARKS.md")
    ap.add_argument("--impl", default=None,
                    help="mul impl: cios | cios2 | cios<k> | parallel")
    ap.add_argument("--ladder", default=None,
                    help="exp ladder: fixed4 | sw4 (sliding window)")
    args = ap.parse_args()

    if args.matrix:
        bench_matrix(block=args.block, reps=args.reps)
        return

    from anemoi_tpu.ff.pallas_backend import DEFAULT_LADDER, DEFAULT_MUL_IMPL

    impl = args.impl or DEFAULT_MUL_IMPL
    ladder = args.ladder or DEFAULT_LADDER
    rate = bench_jive(n=args.n, block=args.block, reps=args.reps, mul_impl=impl, ladder=ladder)

    if args.all:
        for field, iname in [("vesta", "anemoi_4_3"), ("bls12_381", "anemoi_2_1")]:
            try:
                r = bench_jive(field, iname, n=args.n // 4, block=args.block, reps=2)
                print(f"[bench] {field}/{iname} jive: {r:,.0f}/s", file=sys.stderr)
            except Exception as e:  # pragma: no cover
                print(f"[bench] {field}/{iname} failed: {e}", file=sys.stderr)
        try:
            r = bench_sponge_10kb(block=args.block)
            print(
                f"[bench] vesta/anemoi_4_3 10KB sponge: {r:,.1f} msgs/s "
                f"({r * 10240 / 1e6:,.1f} MB/s; reference 1-core: 49.2 msgs/s)",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover
            print(f"[bench] sponge failed: {e}", file=sys.stderr)
        try:
            r = bench_merkle(block=args.block)
            print(f"[bench] vesta/anemoi_2_1 merkle 2^20 leaves: {r:,.0f} leaves/s",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"[bench] merkle failed: {e}", file=sys.stderr)
        try:
            # BASELINE.json config 4 at single-chip scale: arity-4 tree,
            # 2^24 leaves (multi-chip sharding splits this same tree).
            r = bench_merkle("vesta", "anemoi_4_3", n_leaves=1 << 24, reps=2)
            print(f"[bench] vesta/anemoi_4_3 merkle 2^24 leaves (arity 4): "
                  f"{r:,.0f} leaves/s", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"[bench] merkle arity-4 failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "vesta_anemoi_2_1_jive_2to1_hashes_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "hashes/s",
                "vs_baseline": round(rate / REFERENCE_RATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
