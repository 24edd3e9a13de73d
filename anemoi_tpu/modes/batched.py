"""Batched sponge / Jive modes over limb-state tensors.

Layout convention (the framework's internal batched form):
  a batch of B states is int32[WIDTH, L, B] in Montgomery form;
  a batch of B messages of E elements is int32[E, L, B].

The sponge absorb loop is inherently sequential in message position
(cryptographic chaining, see SURVEY.md section 5), so "long message" scaling
happens across the batch axis: the absorb loop is a lax.scan over rate-blocks
with the permutation applied to the whole batch each step.

Spec: reference src/<field>/anemoi_*/hasher.rs (see golden.py for the
scalar oracle with the same structure).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import InstanceParams
from ..ff import limb_ops as lo
from ..ff.limb_ops import field_consts
from ..permutation.batched import permutation_fn


def _zeros_state(inst, B):
    return jnp.zeros((inst.width, inst.field.n_limbs, B), dtype=jnp.int32)


def _one_mont_col(inst):
    fc = field_consts(inst.field)
    return jnp.asarray(fc.one_mont, dtype=jnp.int32)[:, None]


def jive_compress_batch_fn(inst: InstanceParams, k: int = 2, *, unroll: bool = False):
    """Returns f(states: (WIDTH, L, B)) -> (WIDTH//k, L, B) Montgomery limbs.

    Jive-k: out[i] = sum_j (x[i+c*j] + P(x)[i+c*j]), c = WIDTH//k
    (reference 4_3/hasher.rs:161-178).
    """
    assert inst.width % k == 0 and k % 2 == 0
    fc = field_consts(inst.field)
    permute = permutation_fn(inst, unroll=unroll)
    c = inst.width // k

    def compress(states):
        post = permute(states)
        outs = []
        for i in range(c):
            acc = lo.add_mod(states[i], post[i], fc)
            for j in range(1, k):
                acc = lo.add_mod(acc, states[i + c * j], fc)
                acc = lo.add_mod(acc, post[i + c * j], fc)
            outs.append(acc)
        return jnp.stack(outs, axis=0)

    return compress


def merge_batch_fn(inst: InstanceParams, *, unroll: bool = False):
    """Returns f(d0, d1: (DIGEST, L, B)) -> (DIGEST, L, B): Merkle 2-to-1.

    2_1 delegates to Jive compress (2_1/hasher.rs:86-91); 4_3 absorbs both
    digests into the rate and permutes once (4_3/hasher.rs:130-143, with the
    digests[0]-twice quirk corrected; see golden.merge).
    """
    if inst.rate == 1:
        compress = jive_compress_batch_fn(inst, 2, unroll=unroll)

        def merge(d0, d1):
            return compress(jnp.concatenate([d0, d1], axis=0))

        return merge

    permute = permutation_fn(inst, unroll=unroll)
    ds = inst.digest_size

    def merge(d0, d1):
        B = d0.shape[-1]
        state = _zeros_state(inst, B)
        state = state.at[:ds].set(d0)
        state = state.at[ds : 2 * ds].set(d1)
        return permute(state)[:ds]

    return merge


def sponge_hash_batch_fn(
    inst: InstanceParams,
    num_elements: int,
    *,
    backend: str = "jit",
    block_b: int | None = None,
):
    """Returns f(elems: (E, L, B)) -> (DIGEST, L, B) for fixed message length E.

    Absorb adds each element into the rate and permutes per filled rate
    block; sigma/padding finalization per the reference (hasher.rs:92-128).
    The rate-block loop runs under lax.scan so long messages keep a compact
    compiled graph.  backend="pallas" swaps in the fused TPU permutation
    kernel (block_b None = per-instance measured default; any B, padded
    internally).
    """
    fc = field_consts(inst.field)
    L = inst.field.n_limbs
    if backend == "pallas" and num_elements >= inst.rate:
        # fused kernel: the whole absorb loop in one dispatch, state resident
        # in VMEM across rate-blocks (pallas_backend.sponge_pallas)
        from ..ff.pallas_backend import sponge_pallas

        kern = sponge_pallas(inst, num_elements, block_b=block_b)
        ds = inst.digest_size

        def hash_fused(elems):  # (E, L, B)
            B = elems.shape[-1]
            return kern(elems.reshape(-1, B)).reshape(ds, L, B)

        return hash_fused
    if backend == "pallas":
        from ..ff.pallas_backend import permutation_pallas

        kern = permutation_pallas(inst, block_b=block_b)

        def permute(state):  # (W, L, B)
            B = state.shape[-1]
            return kern(state.reshape(-1, B)).reshape(inst.width, L, B)

    else:
        permute = permutation_fn(inst, unroll=False)
    rate = inst.rate
    E = num_elements

    full_blocks = E // rate
    tail = E % rate
    sigma_one = tail == 0

    def hash_batch(elems):
        B = elems.shape[-1]
        state = _zeros_state(inst, B)

        if full_blocks:
            blocks = elems[: full_blocks * rate].reshape(
                full_blocks, rate, inst.field.n_limbs, B
            )

            def step(state, block):
                for i in range(rate):
                    state = state.at[i].set(lo.add_mod(state[i], block[i], fc))
                return permute(state), None

            state, _ = jax.lax.scan(step, state, blocks)

        for i in range(tail):
            state = state.at[i].set(
                lo.add_mod(state[i], elems[full_blocks * rate + i], fc)
            )

        one = jnp.broadcast_to(_one_mont_col(inst), state[0].shape)
        if sigma_one:
            state = state.at[-1].set(lo.add_mod(state[-1], one, fc))
        else:
            state = state.at[tail].set(lo.add_mod(state[tail], one, fc))
            state = permute(state)
        return state[: inst.digest_size]

    return hash_batch


# --------------------------------------------------------------------------
# host-side encode/decode for batched states
# --------------------------------------------------------------------------


def encode_states(inst: InstanceParams, states: list, *, mont: bool = True) -> np.ndarray:
    """list of B states (each WIDTH ints) -> int32[WIDTH, L, B]."""
    fp = inst.field
    width = len(states[0])
    return np.stack(
        [lo.encode_ints([s[w] for s in states], fp, mont=mont) for w in range(width)],
        axis=0,
    )


def decode_states(inst: InstanceParams, arr, *, mont: bool = True) -> list:
    """int32[K, L, B] -> list of B lists of K ints."""
    arr = np.asarray(arr)
    fp = inst.field
    per_w = [lo.decode_ints(arr[w], fp, mont=mont) for w in range(arr.shape[0])]
    return [[per_w[w][b] for w in range(arr.shape[0])] for b in range(arr.shape[-1])]


# --------------------------------------------------------------------------
# batched digest serialization (reference: anemoi_*/digest.rs:42-46)
# --------------------------------------------------------------------------


def digest_export_fn(inst: InstanceParams):
    """Returns f(d: (DIGEST, L, B) Montgomery) -> (DIGEST, L, B) canonical
    plain-integer limbs: the device half of digest byte serialization
    (exit the Montgomery domain on-device, batched).  Pair with
    `digests_to_bytes` for the host half."""
    fc = field_consts(inst.field)

    def export(d):
        return jnp.stack(
            [lo.from_mont(d[i], fc) for i in range(d.shape[0])], axis=0
        )

    return export


def digests_to_bytes(inst: InstanceParams, canon) -> list[bytes]:
    """(DIGEST, L, B) canonical plain limbs -> B little-endian byte strings
    (digest_bytes per element; 32 B for <=255-bit fields, 48 B for
    BLS12-377/381 -- reference digest.rs `to_bytes` via ark_serialize).

    Vectorized over the batch: limbs -> 13-bit little-endian bitstream ->
    packed bytes, no per-element Python bignum loop.
    """
    arr = np.asarray(canon)
    ds, L, B = arr.shape
    nbytes = inst.field.digest_bytes
    # (ds, L, B) int32 digits -> per-limb 16-bit LE bytes -> bit matrix
    lo16 = arr.astype(np.uint16)
    by = np.stack([lo16 & 0xFF, lo16 >> 8], axis=-1).astype(np.uint8)  # (ds,L,B,2)
    bits = np.unpackbits(by, axis=-1, bitorder="little")  # (ds, L, B, 16)
    bits = bits[..., :13]  # each limb contributes exactly 13 bits
    # assemble the value bitstream per (digest elem, batch): (ds, B, 13L)
    stream = bits.transpose(0, 2, 1, 3).reshape(ds, B, 13 * L)
    want = 8 * nbytes
    if stream.shape[-1] < want:
        pad = np.zeros((ds, B, want - stream.shape[-1]), dtype=np.uint8)
        stream = np.concatenate([stream, pad], axis=-1)
    else:
        stream = stream[..., :want]
    packed = np.packbits(stream, axis=-1, bitorder="little")  # (ds, B, nbytes)
    return [
        b"".join(packed[e, b].tobytes() for e in range(ds)) for b in range(B)
    ]
