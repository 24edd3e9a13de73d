"""User-facing Anemoi instances.

Mirrors the reference's public API surface (src/lib.rs:21-64: per-field
modules each exporting the two instantiations with Sponge/Jive/digest
operations) as Python objects:

    import anemoi_tpu as at
    d = at.vesta.anemoi_2_1.hash(b"some bytes")        # sponge over bytes
    d = at.vesta.anemoi_2_1.hash_field([1, 2, 3])      # sponge over elements
    c = at.vesta.anemoi_4_3.compress_k([a, b, c, d], 4)  # Jive
    m = at.vesta.anemoi_2_1.merge(d0, d1)              # Merkle 2-to-1

Scalar calls are served by the golden model (exact, microsecond-scale);
the `.batch` namespace exposes the jit-compiled TPU paths operating on
limb tensors (see modes/batched.py for the layout).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property, lru_cache
from types import SimpleNamespace

import jax
import numpy as np

from .fields.params import (
    FIELD_NAMES,
    INSTANCE_NAMES,
    InstanceParams,
    get_instance,
)
from .ff import golden
from .ff import limb_ops as lo
from .modes import batched as bm


@dataclass(frozen=True)
class Digest:
    """Fixed-size hash digest (reference: anemoi_*/digest.rs:11-47:
    new/as_elements/to_elements/digests_to_elements/to_bytes)."""

    elements: tuple
    instance: "AnemoiInstance"

    @classmethod
    def new(cls, elements, instance: "AnemoiInstance") -> "Digest":
        assert len(elements) == instance.DIGEST_SIZE
        return cls(tuple(int(e) % instance.params.field.p for e in elements), instance)

    @classmethod
    def default(cls, instance: "AnemoiInstance") -> "Digest":
        """All-zero digest (reference digest.rs derives Default)."""
        return cls((0,) * instance.DIGEST_SIZE, instance)

    def as_elements(self) -> tuple:
        return self.elements

    def to_elements(self) -> list:
        return list(self.elements)

    @staticmethod
    def digests_to_elements(digests: list) -> list:
        """Flatten digests for absorption (reference digest.rs:32-39)."""
        return [e for d in digests for e in d.elements]

    def to_bytes(self) -> bytes:
        return golden.digest_to_bytes(self.instance.params, list(self.elements))

    def __iter__(self):
        return iter(self.elements)


class AnemoiInstance:
    """One Anemoi instantiation: scalar API + jit-compiled batched API."""

    def __init__(self, params: InstanceParams):
        self.params = params
        self.STATE_WIDTH = params.width
        self.RATE_WIDTH = params.rate
        self.NUM_COLUMNS = params.columns
        self.DIGEST_SIZE = params.digest_size
        self.NUM_HASH_ROUNDS = params.rounds

    # ----- scalar API (golden-model backed) ------------------------------

    def permutation(self, state: list) -> list:
        return golden.permutation(self.params, state)

    def round(self, state: list, round_ctr: int) -> list:
        return golden.round_fn(self.params, state, round_ctr)

    def ark_layer(self, state: list, round_ctr: int) -> list:
        return golden.ark_layer(self.params, state, round_ctr)

    def mds_layer(self, state: list) -> list:
        return golden.mds_layer(self.params, state)

    def sbox_layer(self, state: list) -> list:
        return golden.sbox_layer(self.params, state)

    def hash(self, data: bytes) -> Digest:
        return Digest(tuple(golden.hash_bytes(self.params, data)), self)

    def hash_field(self, elems: list) -> Digest:
        return Digest(tuple(golden.hash_field(self.params, elems)), self)

    def compress(self, elems: list) -> list:
        return golden.jive_compress(self.params, elems)

    def compress_k(self, elems: list, k: int) -> list:
        return golden.jive_compress_k(self.params, elems, k)

    def merge(self, d0: Digest, d1: Digest) -> Digest:
        out = golden.merge(self.params, list(d0), list(d1))
        return Digest(tuple(out), self)

    def merge_reference_quirk(self, d0: Digest, d1: Digest) -> Digest:
        """Bit-compatible with the reference's 4_3 merge, which absorbs
        digests[0] twice (apparent upstream bug, untested there; reference
        vesta/anemoi_4_3/hasher.rs:136-137 -- see SURVEY.md 2.2-9)."""
        out = golden.merge_reference_quirk(self.params, list(d0), list(d1))
        return Digest(tuple(out), self)

    # ----- batched API (jit limb kernels) --------------------------------

    @cached_property
    def batch(self) -> SimpleNamespace:
        params = self.params

        @lru_cache(maxsize=8)
        def _compress(k):
            return jax.jit(bm.jive_compress_batch_fn(params, k))

        @lru_cache(maxsize=None)
        def _sponge(num_elements):
            return jax.jit(bm.sponge_hash_batch_fn(params, num_elements))

        # jitted once, not per call: a fresh jax.jit(closure) per merge call
        # would miss the jit cache and retrace/recompile on every invocation
        _merge = jax.jit(bm.merge_batch_fn(params))

        from .permutation.batched import jit_permutation

        def _hash_bytes(messages, backend: str = "jit"):
            """Batch of ARBITRARY-length byte messages -> Montgomery digests
            in input order (length-bucketed device dispatch)."""
            from .modes.bytes_pipeline import hash_bytes_mixed

            return hash_bytes_mixed(params, messages, backend=backend)

        return SimpleNamespace(
            permutation=lambda states: jit_permutation(params)(states),
            compress=lambda states: _compress(2)(states),
            compress_k=lambda states, k: _compress(k)(states),
            merge=_merge,
            hash_field=lambda elems: _sponge(int(elems.shape[0]))(elems),
            hash_bytes=_hash_bytes,
            encode_states=lambda states, mont=True: bm.encode_states(
                params, states, mont=mont
            ),
            decode_states=lambda arr, mont=True: bm.decode_states(params, arr, mont=mont),
        )


def _build_registry():
    fields = {}
    for fname in FIELD_NAMES:
        insts = {
            iname: AnemoiInstance(get_instance(fname, iname))
            for iname in INSTANCE_NAMES
        }
        fields[fname] = SimpleNamespace(**insts)
    return fields


_FIELDS = _build_registry()

bls12_377 = _FIELDS["bls12_377"]
bls12_381 = _FIELDS["bls12_381"]
bn_254 = _FIELDS["bn_254"]
ed_on_bls12_377 = _FIELDS["ed_on_bls12_377"]
jubjub = _FIELDS["jubjub"]
pallas_field = _FIELDS["pallas"]  # "pallas" the curve, not jax pallas
vesta = _FIELDS["vesta"]


def instance(field: str, name: str) -> AnemoiInstance:
    return getattr(_FIELDS[field], name)


def all_instance_objects():
    return [
        getattr(_FIELDS[f], i) for f in FIELD_NAMES for i in INSTANCE_NAMES
    ]
