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
    return _hash_packed(inst, elems, backend)


def _hash_packed(inst: InstanceParams, elems: np.ndarray, backend: str):
    E, L, B = elems.shape
    # fold E into the batch axis for one domain-conversion call
    folded = jnp.asarray(elems).transpose(1, 0, 2).reshape(L, E * B)
    mont = _to_mont_fn(inst)(folded).reshape(L, E, B).transpose(1, 0, 2)
    return _sponge_fn(inst, E, backend)(mont)


def hash_bytes_mixed(
    inst: InstanceParams, messages: list, *, backend: str = "jit"
):
    """Hash a batch of ARBITRARY-length byte messages on the device.

    The compiled sponge is specialized only on the element count E, so the
    host dispatcher buckets messages by E (= ceil(len/byte_chunk), the
    reference's chunking -- src/vesta/anemoi_4_3/hasher.rs:18-58), packs
    each bucket with the native loader, dispatches one device call per
    bucket through the lru-cached per-E sponges, and scatters the digests
    back into input order.

    Returns int32[DIGEST, L, len(messages)] Montgomery-form digests in the
    original message order.
    """
    from ..ff import native

    fp = inst.field
    L = fp.n_limbs
    packed = [native.pack_bytes(m, fp) for m in messages]  # (E_i, L) each
    buckets: dict[int, list[int]] = {}
    for idx, p in enumerate(packed):
        buckets.setdefault(p.shape[0], []).append(idx)

    out = np.zeros((inst.digest_size, L, len(messages)), dtype=np.int32)
    # all-device dispatch first (per bucket), fetch after: the buckets'
    # sponge calls overlap on the device via async dispatch
    pending = []
    for E, idxs in sorted(buckets.items()):
        if E == 0:  # empty messages: zero elements absorbed
            elems = np.zeros((0, L, len(idxs)), dtype=np.int32)
        else:
            elems = np.ascontiguousarray(
                np.stack([packed[i] for i in idxs]).transpose(1, 2, 0)
            )  # (E, L, B)
        pending.append((idxs, _hash_packed(inst, elems, backend)))
    for idxs, dev in pending:
        out[:, :, idxs] = np.asarray(dev)
    return out
