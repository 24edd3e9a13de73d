"""End-to-end batched byte hashing: native packing -> device sponge.

The host hot path (chunking, padding, 13-bit limb packing) runs in the C++
data loader (native/anemoi_host.cpp); the device converts to Montgomery form
and runs the batched sponge.  Messages in one batch must share a byte
length (group by length at the call site -- the compiled sponge is
specialized on element count, exactly as the reference specializes its
absorb loop on the input).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import InstanceParams
from ..ff import limb_ops as lo
from ..ff.limb_ops import field_consts
from .batched import sponge_hash_batch_fn


@lru_cache(maxsize=64)
def _to_mont_fn(inst: InstanceParams):
    fc = field_consts(inst.field)
    return jax.jit(lambda x: lo.to_mont(x, fc))


@lru_cache(maxsize=256)
def _sponge_fn(inst: InstanceParams, num_elements: int, backend: str):
    return jax.jit(sponge_hash_batch_fn(inst, num_elements, backend=backend))


def pack_messages(inst: InstanceParams, messages: list) -> np.ndarray:
    """Equal-length byte messages -> canonical int32[E, L, B] limbs."""
    from ..ff import native

    fp = inst.field
    lens = {len(m) for m in messages}
    assert len(lens) == 1, "batch messages must share a byte length"
    packed = np.stack([native.pack_bytes(m, fp) for m in messages])  # (B, E, L)
    return np.ascontiguousarray(packed.transpose(1, 2, 0))  # (E, L, B)


def hash_bytes_batch(
    inst: InstanceParams, messages: list, *, backend: str = "jit"
):
    """Hash a batch of equal-length byte messages.

    Returns int32[DIGEST, L, B] Montgomery-form digests (decode with
    modes.batched.decode_states, or chain directly into a Merkle forest).
    """
    elems = pack_messages(inst, messages)  # canonical (E, L, B)
    E, L, B = elems.shape
    # fold E into the batch axis for one domain-conversion call
    folded = jnp.asarray(elems).transpose(1, 0, 2).reshape(L, E * B)
    mont = _to_mont_fn(inst)(folded).reshape(L, E, B).transpose(1, 0, 2)
    return _sponge_fn(inst, E, backend)(mont)
