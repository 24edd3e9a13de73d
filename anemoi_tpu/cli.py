"""Command-line interface.

    python -m anemoi_tpu.cli hash   --field vesta --instance anemoi_2_1 [FILE]
    python -m anemoi_tpu.cli merkle --field vesta --instance anemoi_2_1 FILE
    python -m anemoi_tpu.cli vectors [--full]
    python -m anemoi_tpu.cli info

`hash` sponge-hashes FILE (or stdin) and prints the digest hex.
`merkle` chunks FILE into field elements, pads to a power of the arity,
builds the Merkle tree on the attached backend and prints the root.
`vectors` runs the golden model against every extracted SAGE vector.
"""

from __future__ import annotations

import argparse
import sys


def _get_instance(args):
    from .fields.params import get_instance

    return get_instance(args.field, args.instance)


def cmd_hash(args):
    from .ff import golden

    inst = _get_instance(args)
    data = (
        sys.stdin.buffer.read() if args.file in (None, "-") else open(args.file, "rb").read()
    )
    digest = golden.hash_bytes(inst, data)
    print(golden.digest_to_bytes(inst, digest).hex())


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
    tree = MerkleTree(inst, chunk_b=min(1024, n))
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
        if needs_file == "?":
            p.add_argument("file", nargs="?")
        elif needs_file == 1:
            p.add_argument("file")

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
