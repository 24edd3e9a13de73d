"""Command-line interface.

    python -m anemoi_tpu.cli hash   [--backend auto|pallas|jit|golden] [FILE...]
    python -m anemoi_tpu.cli merkle [--backend auto|pallas|jit] FILE
    python -m anemoi_tpu.cli vectors [--full]
    python -m anemoi_tpu.cli info

`hash` sponge-hashes each FILE (or stdin) and prints one digest hex per
line.  Multiple files of arbitrary (different) lengths are batched through
the length-bucketing device dispatcher (modes.bytes_pipeline) on the
selected backend; --backend golden forces the scalar oracle.
`merkle` chunks FILE into field elements, pads to a power of the arity,
builds the Merkle tree on the selected backend and prints the root.
`vectors` runs the golden model against every extracted SAGE vector.

Backend `auto` (default) uses the fused Pallas kernels when a TPU is
attached and the jit limb backend otherwise.
"""

from __future__ import annotations

import argparse
import sys


def _get_instance(args):
    from .fields.params import get_instance

    return get_instance(args.field, args.instance)


def _resolve_backend(name: str) -> str:
    if name != "auto":
        return name
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "jit"


def cmd_hash(args):
    from .ff import golden

    inst = _get_instance(args)
    if args.file:
        msgs = [open(f, "rb").read() for f in args.file]
    else:
        msgs = [sys.stdin.buffer.read()]
    backend = _resolve_backend(args.backend)
    if backend == "golden":
        for m in msgs:
            print(golden.digest_to_bytes(inst, golden.hash_bytes(inst, m)).hex())
        return
    import jax

    from .modes.batched import digest_export_fn, digests_to_bytes
    from .modes.bytes_pipeline import hash_bytes_mixed

    digests = hash_bytes_mixed(inst, msgs, backend=backend)
    canon = jax.jit(digest_export_fn(inst))(digests)
    for b in digests_to_bytes(inst, canon):
        print(b.hex())


def cmd_merkle(args):
    import numpy as np

    from .ff import golden, native
    from .ff.limb_ops import decode_ints, encode_ints
    from .merkle.tree import MerkleTree

    inst = _get_instance(args)
    fp = inst.field
    data = open(args.file, "rb").read()
    packed = native.pack_bytes(data, fp)  # (E, L) canonical
    elems = [int(v) for v in _rows_to_ints(packed, fp)]
    # pad leaf count to a power of the arity
    n = max(inst.width, 1)
    while n < len(elems):
        n *= inst.width
    elems += [0] * (n - len(elems))
    leaves = encode_ints(elems, fp)  # Montgomery (L, N)
    backend = _resolve_backend(args.backend)
    if backend == "golden":
        backend = "jit"
    tree = MerkleTree(inst, backend=backend, chunk_b=min(1024, n))
    root = tree.root(leaves)
    root_int = decode_ints(np.asarray(root), fp)[0]
    print(golden.digest_to_bytes(inst, [root_int]).hex())


def _rows_to_ints(packed, fp):
    from .fields.params import int_from_limbs

    return [int_from_limbs(packed[i]) % fp.p for i in range(packed.shape[0])]


def cmd_vectors(args):
    import subprocess

    cmd = [sys.executable, "-m", "pytest", "tests/test_golden_vectors.py", "-q"]
    sys.exit(subprocess.call(cmd))


def cmd_info(args):
    import jax

    from .fields.params import all_instances

    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")
    for inst in all_instances():
        fp = inst.field
        print(
            f"{inst.qualified_name}: {fp.bits}-bit field, L={fp.n_limbs} limbs, "
            f"alpha={fp.alpha}, rounds={inst.rounds}, rate={inst.rate}"
        )


def main(argv=None):
    ap = argparse.ArgumentParser(prog="anemoi_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name, fn, needs_file in (
        ("hash", cmd_hash, "?"),
        ("merkle", cmd_merkle, 1),
        ("vectors", cmd_vectors, 0),
        ("info", cmd_info, 0),
    ):
        p = sub.add_parser(name)
        p.set_defaults(fn=fn)
        if name in ("hash", "merkle"):
            p.add_argument("--field", default="vesta")
            p.add_argument("--instance", default="anemoi_2_1")
            p.add_argument(
                "--backend", default="auto",
                choices=["auto", "pallas", "jit", "golden"],
                help="auto = pallas on TPU, jit on CPU",
            )
        if needs_file == "?":
            p.add_argument("file", nargs="*")
        elif needs_file == 1:
            p.add_argument("file")

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
