#!/usr/bin/env python
"""Mechanically transcribe the reference's per-field inv-alpha addition
chains into straight-line schedule data.

The reference hand-derives one addition chain per field
(reference: src/<field>/sbox.rs:28-322, `exp_by_inv_alpha`): a linear
sequence of `square` / `mul` statements over temporaries t0..tN.  Like the
round constants, the chain IS data -- this tool parses the statement list
into op tuples and validates each chain against pow(x, inv_alpha, p) by
symbolic execution before writing
anemoi_tpu/fields/data/inv_alpha_chains.json.

Op encoding (registers: 0 = x, 1+n = tn):
    ["sqr", dst, src]     dst = src^2
    ["mul", dst, a, b]    dst = a * b
plus "out": the register holding the final result.
"""

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/src")
sys.path.insert(0, str(REPO))

FIELDS = [
    "bls12_377", "bls12_381", "bn_254", "ed_on_bls12_377",
    "jubjub", "pallas", "vesta",
]

_RE_LET = re.compile(r"^let (?:mut )?(t\d+) = (.+?);")
_RE_ASSIGN = re.compile(r"^(t\d+) = (.+?);")
_RE_MULEQ = re.compile(r"^(t\d+) \*= (t\d+|x);")
_RE_SQR = re.compile(r"^(t\d+|x)\.square\(\)$")
_RE_MUL = re.compile(r"^(t\d+|x) \* (t\d+|x)$")
_RE_FINAL = re.compile(r"^(t\d+|x) \* (t\d+|x)$")


def _reg(name: str) -> int:
    return 0 if name == "x" else 1 + int(name[1:])


def _parse_expr(dst: str, expr: str):
    m = _RE_SQR.match(expr)
    if m:
        return ["sqr", _reg(dst), _reg(m.group(1))]
    m = _RE_MUL.match(expr)
    if m:
        return ["mul", _reg(dst), _reg(m.group(1)), _reg(m.group(2))]
    raise ValueError(f"unparsed expr: {expr!r}")


def parse_chain(field: str):
    src = (REF / field / "sbox.rs").read_text()
    body = src.split("fn exp_by_inv_alpha", 1)[1]
    body = body.split("#[cfg(test)]", 1)[0]
    ops = []
    out_reg = None
    for raw in body.splitlines():
        line = raw.split("//")[0].strip()
        if not line or line in ("}", "{") or line.startswith(("fn ", "pub", "#")):
            continue
        if line.endswith("{"):
            continue
        m = _RE_LET.match(line) or _RE_ASSIGN.match(line)
        if m:
            ops.append(_parse_expr(m.group(1), m.group(2)))
            continue
        m = _RE_MULEQ.match(line)
        if m:
            ops.append(["mul", _reg(m.group(1)), _reg(m.group(1)), _reg(m.group(2))])
            continue
        m = _RE_FINAL.match(line)
        if m:
            # final return expression: materialize into a fresh register
            dst = max(op[1] for op in ops) + 1
            ops.append(["mul", dst, _reg(m.group(1)), _reg(m.group(2))])
            out_reg = dst
            continue
        raise ValueError(f"{field}: unparsed line {line!r}")
    assert out_reg is not None, f"{field}: no final expression found"
    return {"ops": ops, "out": out_reg}


def validate(field: str, chain) -> None:
    from anemoi_tpu.fields.params import get_field

    fp = get_field(field)
    x = 0xDEADBEEF12345678F00D % fp.p
    regs = {0: x}
    for op in chain["ops"]:
        if op[0] == "sqr":
            regs[op[1]] = regs[op[2]] * regs[op[2]] % fp.p
        else:
            regs[op[1]] = regs[op[2]] * regs[op[3]] % fp.p
    assert regs[chain["out"]] == pow(x, fp.inv_alpha, fp.p), (
        f"{field}: chain does not compute x^(1/alpha)"
    )


def main():
    out = {}
    for field in FIELDS:
        chain = parse_chain(field)
        validate(field, chain)
        n_sqr = sum(1 for op in chain["ops"] if op[0] == "sqr")
        n_mul = len(chain["ops"]) - n_sqr
        n_regs = max(op[1] for op in chain["ops"]) + 1
        print(f"{field}: {len(chain['ops'])} ops ({n_sqr} sqr + {n_mul} mul), "
              f"{n_regs} registers")
        out[field] = chain
    path = REPO / "anemoi_tpu" / "fields" / "data" / "inv_alpha_chains.json"
    path.write_text(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
