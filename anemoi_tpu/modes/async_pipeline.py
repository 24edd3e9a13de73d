"""Asynchronous streaming byte-hashing pipeline (host/device overlap).

The TPU-native answer to a native async data loader (SURVEY.md section 2.4;
ROADMAP "async host pipeline"): JAX dispatch is asynchronous, so the driver
overlaps three stages per batch without any threads --

    stage 1 (host, C++):   chunk/pad/13-bit-pack the next batch of byte
                           messages (native/anemoi_host.cpp via ctypes)
    stage 2 (transfer):    device_put of batch k+1 while batch k computes
    stage 3 (device):      to-Montgomery + fused batched sponge

Results are fetched one batch behind the dispatch front, so the host pack
of batch k+1 and the upload of batch k+1 run while the device hashes
batch k.  The pipeline never blocks on a result it has not already
overlapped.

Usage:
    pipe = AsyncByteHasher(inst, backend="pallas")
    for batch in batches:                 # lists of equal-length bytes
        for digest_rows in pipe.feed(batch):
            ...                           # (DIGEST, L, B) canonical limbs
    for digest_rows in pipe.drain():
        ...
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import InstanceParams
from .batched import digest_export_fn
from .bytes_pipeline import _sponge_fn, _to_mont_fn, pack_messages


class AsyncByteHasher:
    """Double-buffered streaming hasher over equal-length message batches.

    Each `feed(batch)` packs and dispatches immediately and yields the
    RESULTS of previously dispatched batches that have been overtaken
    (depth-1 pipelining); `drain()` yields the remaining in-flight results.
    Digests come back as canonical (non-Montgomery) (DIGEST, L, B) limb
    arrays, ready for `modes.batched.digests_to_bytes`.
    """

    def __init__(self, inst: InstanceParams, *, backend: str = "jit",
                 export: bool = True):
        self.inst = inst
        self.backend = backend
        self._export = jax.jit(digest_export_fn(inst)) if export else None
        self._inflight: list = []

    def _dispatch(self, messages: list):
        inst = self.inst
        elems = pack_messages(inst, messages)  # host C++: (E, L, B) canonical
        E, L, B = elems.shape
        dev = jax.device_put(jnp.asarray(elems))  # async upload
        folded = dev.transpose(1, 0, 2).reshape(L, E * B)
        mont = _to_mont_fn(inst)(folded).reshape(L, E, B).transpose(1, 0, 2)
        out = _sponge_fn(inst, E, self.backend)(mont)
        if self._export is not None:
            out = self._export(out)
        return out  # un-fetched device array: computation is in flight

    def feed(self, messages: list):
        """Dispatch one batch; yield any completed earlier batches."""
        self._inflight.append(self._dispatch(messages))
        while len(self._inflight) > 1:
            yield np.asarray(self._inflight.pop(0))

    def drain(self):
        """Yield the remaining in-flight results (blocks on the device)."""
        while self._inflight:
            yield np.asarray(self._inflight.pop(0))
