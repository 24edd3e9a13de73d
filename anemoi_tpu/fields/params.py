"""Field and instance parameter registry for the Anemoi-TPU framework.

This is the moral equivalent of the reference's per-field modules + cargo
feature matrix (reference: src/<field>/mod.rs, src/<field>/sbox.rs,
src/<field>/anemoi_*/{mod,round_constants}.rs and Cargo.toml:50-56): a single
frozen-dataclass registry holding, per field, the prime modulus and S-box
constants, and per instantiation the round-constant tables.

On top of the raw parameters (loaded from data/params.json, extracted from the
reference by tools/extract_reference_params.py) this module derives everything
the TPU limb kernels need:

  * the limb decomposition (13-bit limbs in int32 lanes -- products of two
    limbs fit in 26 bits so a full schoolbook column sum of <= 30 products
    stays below 2^31; no widening multiply exists on the TPU VPU),
  * Montgomery constants R = 2^(13*L) mod p, R^2 mod p, n0' = -p^-1 mod 2^13,
  * round constants / delta / beta pre-converted to Montgomery limb arrays,
  * the windowed square-and-multiply schedule for the x^(1/alpha) map
    (the exponent is a compile-time constant, so the ladder is straight-line).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import lru_cache
from pathlib import Path

import numpy as np

LIMB_BITS = 13
LIMB_MASK = (1 << LIMB_BITS) - 1

_DATA = Path(__file__).parent / "data" / "params.json"


def limbs_from_int(x: int, n_limbs: int) -> np.ndarray:
    """Little-endian base-2^13 limb decomposition as int32[n_limbs]."""
    out = np.zeros(n_limbs, dtype=np.int32)
    for i in range(n_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in given limb count"
    return out


def int_from_limbs(limbs) -> int:
    x = 0
    for i, l in enumerate(np.asarray(limbs).tolist()):
        x += int(l) << (LIMB_BITS * i)
    return x


@dataclass(frozen=True)
class FieldParams:
    """A prime field with its Anemoi S-box constants (plain-integer domain)."""

    name: str
    p: int  # prime modulus
    bits: int  # bit length of p
    alpha: int  # S-box exponent
    beta: int  # quadratic generator g (multiplier of the S-box)
    delta: int  # beta^-1 mod p
    inv_alpha: int  # alpha^-1 mod (p-1)
    byte_chunk: int  # sponge byte-absorb chunk size (31 or 47)
    digest_bytes: int  # serialized digest size (32 or 48)

    # --- limb/Montgomery derived quantities -------------------------------
    @property
    def n_limbs(self) -> int:
        # Limb budget reserves two spare bits (4p <= R = 2^(13L)) so the
        # kernels can keep intermediate values in a lazy [0, 2p) domain
        # without conditional subtraction (see ff/limb_ops.py).
        # 253..255-bit fields -> 20 limbs; 377/381-bit -> 30 limbs.
        return -(-(self.bits + 2) // LIMB_BITS)

    @property
    def R(self) -> int:
        return pow(2, LIMB_BITS * self.n_limbs, self.p)

    @property
    def R2(self) -> int:
        return pow(2, 2 * LIMB_BITS * self.n_limbs, self.p)

    @property
    def n0_inv(self) -> int:
        """-p^-1 mod 2^13 (Montgomery reduction multiplier)."""
        return (-pow(self.p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @property
    def p_limbs(self) -> np.ndarray:
        return limbs_from_int(self.p, self.n_limbs)

    def to_mont(self, x: int) -> int:
        return (x % self.p) * self.R % self.p

    def from_mont(self, x: int) -> int:
        Rinv = pow(self.R, -1, self.p)
        return x * Rinv % self.p

    @property
    def inv_alpha_windows(self) -> tuple[int, ...]:
        """Base-16 digits of inv_alpha, most-significant first (no leading 0).

        Drives the fixed-window square-and-multiply ladder for x^(1/alpha):
        4 squarings + one table multiply per digit; the digit sequence is a
        static compile-time constant so no data-dependent control flow exists
        on device.  (Replaces the reference's hand-rolled per-field addition
        chains, src/<field>/sbox.rs.)
        """
        e = self.inv_alpha
        digits = []
        while e:
            digits.append(e & 0xF)
            e >>= 4
        return tuple(reversed(digits))

    @property
    def inv_alpha_sliding_schedule(self) -> tuple[tuple[int, int], ...]:
        """Left-to-right sliding-window schedule for x^inv_alpha: a static
        sequence of (n_squarings, odd_window_value) steps over width-<=4
        windows that start and end on a 1-bit.

        Evaluation: acc = x^v0 (step 0 only seeds -- squaring 1 is the
        identity), then per step: n squarings followed by one multiply with
        the precomputed odd power x^v.  vs the fixed 4-bit window ladder
        this saves ~12 window multiplies and shrinks the table build from
        14 products (x^2..x^15) to 8 (x^2 plus seven odd powers) -- the
        same op-count neighborhood as the reference's hand-derived
        addition chains (reference: src/<field>/sbox.rs exp_by_inv_alpha)
        without transcribing them.

        inv_alpha is odd for every registered field (alpha is odd and p-1
        is even), so the schedule never ends in bare squarings.
        """
        bits = bin(self.inv_alpha)[2:]
        n = len(bits)
        steps: list[tuple[int, int]] = []
        i = 0
        pending = 0
        while i < n:
            if bits[i] == "0":
                pending += 1
                i += 1
                continue
            length = min(4, n - i)
            while bits[i + length - 1] == "0":
                length -= 1
            steps.append((pending + length, int(bits[i : i + length], 2)))
            pending = 0
            i += length
        assert pending == 0, "inv_alpha must be odd"
        return tuple(steps)


@dataclass(frozen=True)
class InstanceParams:
    """One Anemoi instantiation (field x state shape) with round constants."""

    field: FieldParams
    name: str  # e.g. "anemoi_2_1"
    width: int  # state width (2 or 4)
    rate: int
    columns: int  # width // 2
    digest_size: int
    rounds: int
    C: tuple[int, ...]  # round constants, round-major, len = rounds*columns
    D: tuple[int, ...]
    # Optional explicit MDS matrix (row-major, columns x columns) for widths
    # with no dedicated fast path (traits.rs:272-293 generic fallback).  All
    # shipped instances (1/2 columns) leave it None, like the reference's
    # `MDS: Option<..> = None` default (traits.rs:54).
    mds: tuple[int, ...] | None = None

    @property
    def qualified_name(self) -> str:
        return f"{self.field.name}/{self.name}"


class _Registry:
    def __init__(self):
        raw = json.loads(_DATA.read_text())
        self.fields: dict[str, FieldParams] = {}
        self.instances: dict[tuple[str, str], InstanceParams] = {}
        for fname, fdata in raw.items():
            fp = FieldParams(
                name=fname,
                p=int(fdata["modulus"]),
                bits=fdata["bits"],
                alpha=fdata["alpha"],
                beta=fdata["beta"],
                delta=int(fdata["delta"]),
                inv_alpha=int(fdata["inv_alpha"]),
                byte_chunk=fdata["byte_chunk"],
                digest_bytes=fdata["digest_bytes"],
            )
            self.fields[fname] = fp
            for iname, idata in fdata["instances"].items():
                self.instances[(fname, iname)] = InstanceParams(
                    field=fp,
                    name=iname,
                    width=idata["width"],
                    rate=idata["rate"],
                    columns=idata["columns"],
                    digest_size=idata["digest_size"],
                    rounds=idata["rounds"],
                    C=tuple(int(c) for c in idata["C"]),
                    D=tuple(int(d) for d in idata["D"]),
                )


@lru_cache(maxsize=1)
def registry() -> _Registry:
    return _Registry()


def get_field(name: str) -> FieldParams:
    try:
        return registry().fields[name]
    except KeyError:
        raise ValueError(
            f"unknown field {name!r}; known fields: {', '.join(FIELD_NAMES)}"
        ) from None


def get_instance(field: str, instance: str) -> InstanceParams:
    try:
        return registry().instances[(field, instance)]
    except KeyError:
        raise ValueError(
            f"unknown instance {field!r}/{instance!r}; known: "
            f"fields {', '.join(FIELD_NAMES)} x instances "
            f"{', '.join(INSTANCE_NAMES)}"
        ) from None


def all_instances() -> list[InstanceParams]:
    return list(registry().instances.values())


FIELD_NAMES = (
    "bls12_377",
    "bls12_381",
    "bn_254",
    "ed_on_bls12_377",
    "jubjub",
    "pallas",
    "vesta",
)
INSTANCE_NAMES = ("anemoi_2_1", "anemoi_4_3")
