#!/usr/bin/env python
"""Extract the opaque numeric parameters of the Anemoi instantiations from the
reference implementation (`/root/reference`, anemoi-hash/anemoi-rust) into JSON.

The Anemoi permutation is fully determined by per-field data: the prime
modulus, the S-box exponents (alpha, 1/alpha), the quadratic non-residue
generator beta, the additive constant delta = beta^-1, and the additive round
constant tables C and D (derived from digits of pi in the Anemoi paper,
eprint 2022/840).  The reference stores all of these as decimal literals
inside `MontFp!("...")` macros:

  - src/<field>/sbox.rs:            ALPHA, INV_ALPHA, BETA, DELTA
  - src/<field>/anemoi_*/round_constants.rs:  C, D tables
  - src/<field>/anemoi_*/mod.rs:    STATE_WIDTH/RATE_WIDTH/NUM_HASH_ROUNDS +
                                    SAGE-generated `test_sbox` vectors
  - src/<field>/anemoi_*/hasher.rs: SAGE-generated hash / jive vectors

This script transcribes that *data* (not code) into:

  anemoi_tpu/fields/data/params.json   -- permutation parameters per field
  tests/vectors/<field>_<inst>.json    -- SAGE test vectors (ground truth)

The field moduli are NOT present in the reference repo (they live in the
external arkworks crates); they are hard-coded below from the public curve
specifications and cross-checked against the extracted data:
  * delta * beta == 1 (mod p)
  * inv_alpha * alpha == 1 (mod p-1)
  * every extracted constant is < p
"""

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/src")
OUT_PARAMS = Path(__file__).resolve().parent.parent / "anemoi_tpu" / "fields" / "data"
OUT_VECTORS = Path(__file__).resolve().parent.parent / "tests" / "vectors"

# Public prime moduli of the base fields used by each reference module
# (from the arkworks curve definitions; see SURVEY.md section 2.3).
MODULI = {
    # ark_bls12_377::Fq  (377-bit base field)
    "bls12_377": 0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001,
    # ark_bls12_381::Fq  (381-bit base field)
    "bls12_381": 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    # ark_bn254::Fq      (254-bit base field)
    "bn_254": 21888242871839275222246405745257275088696311157297823662689037894645226208583,
    # ark_bls12_377::Fr  (253-bit scalar field; twisted-Edwards base field)
    "ed_on_bls12_377": 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001,
    # ark_bls12_381::Fr  (255-bit scalar field; Jubjub base field)
    "jubjub": 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    # ark_pallas::Fq     (255-bit Pallas base field)
    "pallas": 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001,
    # ark_pallas::Fr     (255-bit Vesta base field = Pallas scalar field)
    "vesta": 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001,
}

FIELDS = sorted(MODULI)
INSTANCES = ["anemoi_2_1", "anemoi_4_3"]

ELEM_RE = re.compile(
    r"""Felt::zero\(\)|Felt::one\(\)|MontFp!\(\s*"([0-9]+)"\s*\)""", re.S
)


def parse_elements(text):
    """All field-element literals in `text`, in order, as python ints."""
    out = []
    for m in ELEM_RE.finditer(text):
        if m.group(0).startswith("Felt::zero"):
            out.append(0)
        elif m.group(0).startswith("Felt::one"):
            out.append(1)
        else:
            out.append(int(m.group(1)))
    return out


def balanced_block(text, start):
    """Return (block, end) for the bracketed block starting at text[start] == '['."""
    assert text[start] == "["
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "[":
            depth += 1
        elif text[i] == "]":
            depth -= 1
            if depth == 0:
                return text[start : i + 1], i + 1
    raise ValueError("unbalanced brackets")


def parse_vector_list(block):
    """Parse `[ vec![..], [..], .. ]` into a list of lists of ints.

    Top-level entries may be vec![..] / [..] groups; each group's elements are
    extracted in order.  A top-level bare element becomes a singleton group.
    """
    inner = block[1:-1]
    groups = []
    i = 0
    depth = 0
    cur_start = 0
    # split on top-level commas
    parts = []
    while i < len(inner):
        c = inner[i]
        if c == "[" or c == "(":
            depth += 1
        elif c == "]" or c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(inner[cur_start:i])
            cur_start = i + 1
        i += 1
    parts.append(inner[cur_start:])
    repeat_re = re.compile(r"\[\s*(Felt::(?:zero|one)\(\))\s*;\s*(\d+)\s*\]")
    for p in parts:
        if not p.strip():
            continue
        rep = repeat_re.search(p)
        if rep:  # rust array-repeat syntax, e.g. [Felt::zero(); 4]
            groups.append(parse_elements(rep.group(1)) * int(rep.group(2)))
            continue
        elems = parse_elements(p)
        if elems or "vec![]" in p.replace(" ", ""):
            groups.append(elems)
    return groups


def extract_let_arrays(src, names):
    """Find successive `let <name> = [...];` blocks, return list of parsed lists."""
    results = []
    pos = 0
    pat = re.compile(r"let\s+(?:mut\s+)?(%s)\s*=\s*\[" % "|".join(names))
    while True:
        m = pat.search(src, pos)
        if not m:
            break
        block, end = balanced_block(src, m.end() - 1)
        results.append((m.group(1), parse_vector_list(block)))
        pos = end
    return results


def extract_sbox(field):
    src = (REF / field / "sbox.rs").read_text()
    alpha = int(re.search(r"const ALPHA: u32 = (\d+);", src).group(1))
    beta = int(re.search(r"const BETA: u32 = (\d+);", src).group(1))
    inv_alpha = int(
        re.search(r'INV_ALPHA: Felt =\s*MontFp!\(\s*"(\d+)"\s*\)', src).group(1)
    )
    delta = int(re.search(r'DELTA: Felt =\s*MontFp!\(\s*"(\d+)"\s*\)', src).group(1))
    return dict(alpha=alpha, beta=beta, inv_alpha=inv_alpha, delta=delta)


def extract_round_constants(field, inst):
    src = (REF / field / inst / "round_constants.rs").read_text()
    mc = re.search(r"const C:[^=]*=\s*\[", src)
    block_c, _ = balanced_block(src, mc.end() - 1)
    md = re.search(r"const D:[^=]*=\s*\[", src)
    block_d, _ = balanced_block(src, md.end() - 1)
    return parse_elements(block_c), parse_elements(block_d)


def extract_consts(field, inst):
    src = (REF / field / inst / "mod.rs").read_text()

    def grab(name, env):
        rhs = re.search(r"const %s: usize = (\w+)\s*(?:/\s*(\w+))?;" % name, src)
        val = int(rhs.group(1)) if rhs.group(1).isdigit() else env[rhs.group(1)]
        if rhs.group(2):
            div = int(rhs.group(2)) if rhs.group(2).isdigit() else env[rhs.group(2)]
            val //= div
        return val

    env = {}
    for name in ("STATE_WIDTH", "RATE_WIDTH", "NUM_COLUMNS", "DIGEST_SIZE", "NUM_HASH_ROUNDS"):
        env[name] = grab(name, env)
    return dict(
        width=env["STATE_WIDTH"],
        rate=env["RATE_WIDTH"],
        columns=env["NUM_COLUMNS"],
        digest_size=env["DIGEST_SIZE"],
        rounds=env["NUM_HASH_ROUNDS"],
    )


def extract_sbox_vectors(field, inst):
    src = (REF / field / inst / "mod.rs").read_text()
    test = src[src.index("fn test_sbox") :]
    arrays = extract_let_arrays(test, ["input", "output"])
    assert [a[0] for a in arrays] == ["input", "output"], arrays
    return {"input": arrays[0][1], "output": arrays[1][1]}


def extract_hasher_vectors(field, inst):
    src = (REF / field / inst / "hasher.rs").read_text()
    out = {}
    m = re.search(r"fn test_anemoi_hash\(\)", src)
    m_end = re.search(r"fn test_anemoi_hash_bytes\(\)", src)
    hash_src = src[m.start() : m_end.start()]
    arrays = extract_let_arrays(hash_src, ["input_data", "output_data"])
    out["hash_field"] = {"input": arrays[0][1], "output": arrays[1][1]}

    m_jive = re.search(r"fn test_anemoi_jive\(\)", src)
    bytes_src = src[m_end.start() : m_jive.start()]
    arrays = extract_let_arrays(bytes_src, ["input_data", "output_data"])
    out["hash_bytes"] = {"input": arrays[0][1], "output": arrays[1][1]}

    jive_src = src[m_jive.start() :]
    arrays = extract_let_arrays(jive_src, ["input_data", "output_data"])
    # pairs of (input, output); first pair tests compress & compress_k(2),
    # optional second pair tests compress_k(4)
    pairs = []
    for i in range(0, len(arrays) - 1, 2):
        assert arrays[i][0] == "input_data" and arrays[i + 1][0] == "output_data"
        pairs.append({"input": arrays[i][1], "output": arrays[i + 1][1]})
    out["jive"] = pairs
    return out


def main():
    OUT_PARAMS.mkdir(parents=True, exist_ok=True)
    OUT_VECTORS.mkdir(parents=True, exist_ok=True)
    params = {}
    for field in FIELDS:
        p = MODULI[field]
        sbox = extract_sbox(field)
        # cross-checks: moduli vs extracted constants
        assert (sbox["delta"] * sbox["beta"]) % p == 1, field
        assert (sbox["inv_alpha"] * sbox["alpha"]) % (p - 1) == 1, field
        assert sbox["delta"] < p and sbox["inv_alpha"] < p
        nbits = p.bit_length()
        entry = dict(
            modulus=str(p),
            bits=nbits,
            alpha=sbox["alpha"],
            beta=sbox["beta"],
            inv_alpha=str(sbox["inv_alpha"]),
            delta=str(sbox["delta"]),
            byte_chunk=47 if nbits > 376 else 31,
            digest_bytes=48 if nbits > 376 else 32,
            instances={},
        )
        for inst in INSTANCES:
            consts = extract_consts(field, inst)
            C, D = extract_round_constants(field, inst)
            assert len(C) == consts["rounds"] * consts["columns"], (field, inst)
            assert len(D) == len(C)
            assert all(c < p for c in C) and all(d < p for d in D)
            entry["instances"][inst] = dict(
                **consts, C=[str(c) for c in C], D=[str(d) for d in D]
            )
            vectors = {
                "sbox": extract_sbox_vectors(field, inst),
                **extract_hasher_vectors(field, inst),
            }
            # sanity: shapes of vectors
            for pair in vectors["sbox"]["input"]:
                assert len(pair) == consts["width"]
            vpath = OUT_VECTORS / f"{field}_{inst}.json"
            vpath.write_text(
                json.dumps(
                    {
                        k: _stringify(v)
                        for k, v in vectors.items()
                    },
                    indent=1,
                )
            )
            n_hash = len(vectors["hash_field"]["input"])
            n_jive = sum(len(p["input"]) for p in vectors["jive"])
            print(
                f"{field}/{inst}: rounds={consts['rounds']} cols={consts['columns']} "
                f"sbox_vecs={len(vectors['sbox']['input'])} hash_vecs={n_hash} "
                f"jive_vecs={n_jive}"
            )
        params[field] = entry
    (OUT_PARAMS / "params.json").write_text(json.dumps(params, indent=1))
    print(f"wrote {OUT_PARAMS/'params.json'} and vectors for {len(FIELDS)} fields")


def _stringify(obj):
    if isinstance(obj, int):
        return str(obj)
    if isinstance(obj, list):
        return [_stringify(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _stringify(v) for k, v in obj.items()}
    return obj


if __name__ == "__main__":
    sys.exit(main())
