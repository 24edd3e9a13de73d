"""Streaming batched sponge: absorb arbitrarily long (equal-length) message
streams in rate-aligned chunks without recompiling per total length.

The reference's absorb loop is inherently sequential in message position
(SURVEY.md section 5) -- streaming preserves that chaining while letting the
host feed chunks incrementally (e.g. from the native byte packer) and keeping
one compiled absorb step for any stream length.

    sponge = BatchedSponge(inst, batch=4096)
    for chunk in chunks:          # int32[E_i, L, B], E_i % rate == 0
        sponge.absorb(chunk)
    digest = sponge.finalize(tail)  # tail: int32[T, L, B], T < rate
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..fields.params import InstanceParams
from ..ff import limb_ops as lo
from ..ff.limb_ops import field_consts
from ..permutation.batched import permutation_fn


@lru_cache(maxsize=64)
def _finalize_perm_fn(inst: InstanceParams, backend: str, block_b: int):
    """One compiled bare permutation for the sigma=0 finalize path.

    Cached like _absorb_block_fn: constructing jax.jit(permutation_fn(...))
    inside finalize would retrace/recompile on every stream finalization
    (the retrace-per-call bug class fixed for merge in instances.py)."""
    if backend == "pallas":
        return jax.jit(_pallas_perm(inst, block_b))
    return jax.jit(permutation_fn(inst))


@lru_cache(maxsize=64)
def _absorb_block_fn(inst: InstanceParams, backend: str, block_b: int):
    """One compiled step: add a rate-block into the state and permute."""
    fc = field_consts(inst.field)
    if backend == "pallas":
        from ..ff.pallas_backend import permutation_pallas

        kern = permutation_pallas(inst, block_b=block_b)
        L = inst.field.n_limbs

        def permute(state):
            B = state.shape[-1]
            return kern(state.reshape(-1, B)).reshape(inst.width, L, B)

    else:
        permute = permutation_fn(inst)

    def step(state, block):  # block: (rate, L, B)
        for i in range(inst.rate):
            state = state.at[i].set(lo.add_mod(state[i], block[i], fc))
        return permute(state)

    def absorb_chunk(state, chunk):  # chunk: (n_blocks, rate, L, B)
        return jax.lax.scan(lambda s, b: (step(s, b), None), state, chunk)[0]

    return jax.jit(absorb_chunk)


class BatchedSponge:
    """Incremental sponge over a batch of B equal-length element streams."""

    def __init__(
        self,
        inst: InstanceParams,
        batch: int,
        *,
        backend: str = "jit",
        block_b: int | None = None,
    ):
        self.inst = inst
        self.fc = field_consts(inst.field)
        self.backend = backend
        self.block_b = block_b
        self.batch = batch
        L = inst.field.n_limbs
        self.state = jnp.zeros((inst.width, L, batch), dtype=jnp.int32)
        self.count = 0  # absorbed elements per stream

    def absorb(self, elems):
        """elems: int32[E, L, B] Montgomery, E a multiple of the rate."""
        E = elems.shape[0]
        rate = self.inst.rate
        assert E % rate == 0, "stream chunks must be rate-aligned"
        chunk = elems.reshape(E // rate, rate, *elems.shape[1:])
        fn = _absorb_block_fn(self.inst, self.backend, self.block_b)
        self.state = fn(self.state, chunk)
        self.count += E

    def finalize(self, tail=None):
        """tail: int32[T, L, B] with T < rate (or None); returns the digest
        int32[DIGEST, L, B] with the reference's sigma/padding semantics."""
        inst = self.inst
        fc = self.fc
        state = self.state
        T = 0 if tail is None else tail.shape[0]
        total = self.count + T
        sigma_one = inst.rate == 1 or total % inst.rate == 0
        one = jnp.broadcast_to(
            jnp.asarray(fc.one_mont, dtype=jnp.int32)[:, None], state[0].shape
        )
        if inst.rate == 1:
            assert T == 0
            state = state.at[-1].set(lo.add_mod(state[-1], one, fc))
            return state[: inst.digest_size]

        for i in range(T):
            state = state.at[i].set(lo.add_mod(state[i], tail[i], fc))
        if sigma_one:
            state = state.at[-1].set(lo.add_mod(state[-1], one, fc))
        else:
            state = state.at[T].set(lo.add_mod(state[T], one, fc))
            # one final permutation via a single zero block would add into
            # the rate; permute directly instead (cached compiled fn)
            state = _finalize_perm_fn(inst, self.backend, self.block_b)(state)
        return state[: inst.digest_size]


def _pallas_perm(inst, block_b):
    from ..ff.pallas_backend import permutation_pallas

    kern = permutation_pallas(inst, block_b=block_b)
    L = inst.field.n_limbs

    def permute(state):
        B = state.shape[-1]
        return kern(state.reshape(-1, B)).reshape(inst.width, L, B)

    return permute
