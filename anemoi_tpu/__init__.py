"""anemoi_tpu: a TPU-native Anemoi hash framework.

A from-scratch JAX/Pallas implementation of the Anemoi permutation
(Bouvier et al., eprint 2022/840) with Sponge and Jive modes over the base
fields of 7 ZK-friendly curves, feature-matched to the reference Rust
implementation (anemoi-hash/anemoi-rust) and bit-exact against its
SAGE-generated test vectors.

Layering (see SURVEY.md section 7):
  fields/       parameter registry (moduli, S-box constants, round constants)
  ff/           field arithmetic: golden oracle, int32 limb ops, Pallas kernels
  permutation/  batched Anemoi permutation, generic over instances
  modes/        sponge hash, Jive compression, digests, merge
  merkle/       batched Merkle tree / forest construction
  dist/         device-mesh sharding (pjit/shard_map over ICI/DCN)
"""

from .fields.params import get_field, get_instance
from .instances import (
    Digest,
    bls12_377,
    bls12_381,
    bn_254,
    ed_on_bls12_377,
    instance,
    jubjub,
    pallas_field,
    vesta,
)

__version__ = "0.1.0"
