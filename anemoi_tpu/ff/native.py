"""ctypes bindings for the native C++ host library (native/anemoi_host.cpp).

Roles:
  * `pack_bytes` -- the sponge data loader: message bytes -> 13-bit limb
    rows, chunked/padded exactly like the reference byte absorb path.
  * `permute_batch` / `jive_batch` -- a 64-bit-limb Montgomery CPU oracle of
    the full permutation, used to cross-verify device batches at rates the
    pure-Python golden model cannot reach.

The shared library is compiled on demand with g++ (no pybind11; plain C ABI).
"""

from __future__ import annotations

import ctypes as ct
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

from ..fields.params import FieldParams, InstanceParams

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "anemoi_host.cpp"
_SO = _NATIVE_DIR / "libanemoi_host.so"

MAX_LIMBS = 6


class _FieldCtx(ct.Structure):
    _fields_ = [
        ("n64", ct.c_int32),
        ("p", ct.c_uint64 * MAX_LIMBS),
        ("n0inv", ct.c_uint64),
        ("r2", ct.c_uint64 * MAX_LIMBS),
        ("one_mont", ct.c_uint64 * MAX_LIMBS),
    ]


class _InstanceCtx(ct.Structure):
    _fields_ = [
        ("width", ct.c_int32),
        ("columns", ct.c_int32),
        ("rounds", ct.c_int32),
        ("inv_alpha_bits", ct.c_int32),
        ("inv_alpha", ct.POINTER(ct.c_uint8)),
        ("C", ct.POINTER(ct.c_uint64)),
        ("D", ct.POINTER(ct.c_uint64)),
        ("beta_mont", ct.POINTER(ct.c_uint64)),
        ("delta_mont", ct.POINTER(ct.c_uint64)),
    ]


@lru_cache(maxsize=1)
def _lib():
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True,
        )
    lib = ct.CDLL(str(_SO))
    lib.anemoi_num_elements.restype = ct.c_size_t
    lib.anemoi_num_elements.argtypes = [ct.c_size_t, ct.c_int]
    return lib


def _u64_limbs(x: int, n64: int) -> np.ndarray:
    out = np.zeros(n64, dtype=np.uint64)
    for i in range(n64):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64
    assert x == 0
    return out


def _n64(fp: FieldParams) -> int:
    return -(-fp.bits // 64)


@lru_cache(maxsize=16)
def _field_ctx(fp: FieldParams) -> _FieldCtx:
    n64 = _n64(fp)
    ctx = _FieldCtx()
    ctx.n64 = n64
    R64 = pow(2, 64 * n64, fp.p)
    for name, val in (
        ("p", fp.p),
        ("r2", R64 * R64 % fp.p),
        ("one_mont", R64),
    ):
        arr = _u64_limbs(val, n64)
        getattr(ctx, name)[:n64] = [int(v) for v in arr]
    ctx.n0inv = (-pow(fp.p, -1, 1 << 64)) % (1 << 64)
    return ctx


class _InstanceHandle:
    """Keeps the numpy buffers referenced by the InstanceCtx alive."""

    def __init__(self, inst: InstanceParams):
        fp = inst.field
        n64 = _n64(fp)
        R64 = pow(2, 64 * n64, fp.p)

        def mont64(x):
            return _u64_limbs(x * R64 % fp.p, n64)

        self.C = np.concatenate([mont64(c) for c in inst.C])
        self.D = np.concatenate([mont64(d) for d in inst.D])
        self.beta = mont64(fp.beta)
        self.delta = mont64(fp.delta)
        bits = bin(fp.inv_alpha)[2:]
        self.bits = np.frombuffer(bits.encode(), dtype=np.uint8) - ord("0")
        self.bits = np.ascontiguousarray(self.bits)

        ctx = _InstanceCtx()
        ctx.width = inst.width
        ctx.columns = inst.columns
        ctx.rounds = inst.rounds
        ctx.inv_alpha_bits = len(bits)
        ctx.inv_alpha = self.bits.ctypes.data_as(ct.POINTER(ct.c_uint8))
        ctx.C = self.C.ctypes.data_as(ct.POINTER(ct.c_uint64))
        ctx.D = self.D.ctypes.data_as(ct.POINTER(ct.c_uint64))
        ctx.beta_mont = self.beta.ctypes.data_as(ct.POINTER(ct.c_uint64))
        ctx.delta_mont = self.delta.ctypes.data_as(ct.POINTER(ct.c_uint64))
        self.ctx = ctx


@lru_cache(maxsize=32)
def _instance_handle(inst: InstanceParams) -> _InstanceHandle:
    return _InstanceHandle(inst)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def pack_bytes(data: bytes, fp: FieldParams) -> np.ndarray:
    """Message bytes -> int32[E, L] canonical (non-Montgomery) 13-bit limbs,
    chunked and padded per the reference sponge byte path."""
    lib = _lib()
    chunk = fp.byte_chunk
    n = int(lib.anemoi_num_elements(len(data), chunk))
    out = np.zeros((n, fp.n_limbs), dtype=np.int32)
    if n:
        buf = np.frombuffer(data, dtype=np.uint8)
        lib.anemoi_pack_bytes(
            buf.ctypes.data_as(ct.POINTER(ct.c_uint8)),
            len(data),
            chunk,
            fp.n_limbs,
            out.ctypes.data_as(ct.POINTER(ct.c_int32)),
        )
    return out


def _to64(arr13: np.ndarray, fp: FieldParams) -> np.ndarray:
    """int32[..., L13] -> uint64[..., n64] via the native repacker."""
    lib = _lib()
    arr13 = np.ascontiguousarray(arr13, dtype=np.int32)
    lead = arr13.shape[:-1]
    n64 = _n64(fp)
    out = np.zeros((*lead, n64), dtype=np.uint64)
    flat13 = arr13.reshape(-1, fp.n_limbs)
    flat64 = out.reshape(-1, n64)
    for i in range(flat13.shape[0]):
        lib.anemoi_limbs13_to_64(
            flat13[i].ctypes.data_as(ct.POINTER(ct.c_int32)),
            fp.n_limbs,
            flat64[i].ctypes.data_as(ct.POINTER(ct.c_uint64)),
            n64,
        )
    return out


def _to13(arr64: np.ndarray, fp: FieldParams) -> np.ndarray:
    lib = _lib()
    arr64 = np.ascontiguousarray(arr64, dtype=np.uint64)
    lead = arr64.shape[:-1]
    n64 = _n64(fp)
    out = np.zeros((*lead, fp.n_limbs), dtype=np.int32)
    flat64 = arr64.reshape(-1, n64)
    flat13 = out.reshape(-1, fp.n_limbs)
    for i in range(flat64.shape[0]):
        lib.anemoi_limbs64_to_13(
            flat64[i].ctypes.data_as(ct.POINTER(ct.c_uint64)),
            n64,
            flat13[i].ctypes.data_as(ct.POINTER(ct.c_int32)),
            fp.n_limbs,
        )
    return out


def permute_batch_canonical(inst: InstanceParams, states13: np.ndarray) -> np.ndarray:
    """Batched permutation on canonical int32[B, WIDTH, L] 13-bit limbs."""
    lib = _lib()
    fp = inst.field
    fctx = _field_ctx(fp)
    handle = _instance_handle(inst)
    st64 = _to64(states13, fp)  # (B, WIDTH, n64), canonical
    flat = np.ascontiguousarray(st64.reshape(-1, _n64(fp)))
    lib.anemoi_to_mont(ct.byref(fctx), flat.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                       flat.shape[0])
    st = flat.reshape(st64.shape)
    lib.anemoi_permute_batch(
        ct.byref(fctx),
        ct.byref(handle.ctx),
        st.ctypes.data_as(ct.POINTER(ct.c_uint64)),
        st64.shape[0],
    )
    flat = st.reshape(-1, _n64(fp))
    lib.anemoi_from_mont(ct.byref(fctx), flat.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                         flat.shape[0])
    return _to13(flat.reshape(st64.shape), fp)


def jive_batch_canonical(
    inst: InstanceParams, states13: np.ndarray, k: int = 2
) -> np.ndarray:
    """Batched Jive-k on canonical int32[B, WIDTH, L] limbs -> [B, W//k, L]."""
    lib = _lib()
    fp = inst.field
    fctx = _field_ctx(fp)
    handle = _instance_handle(inst)
    n64 = _n64(fp)
    st64 = _to64(states13, fp)
    flat = np.ascontiguousarray(st64.reshape(-1, n64))
    lib.anemoi_to_mont(ct.byref(fctx), flat.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                       flat.shape[0])
    B = st64.shape[0]
    c = inst.width // k
    out = np.zeros((B, c, n64), dtype=np.uint64)
    lib.anemoi_jive_batch(
        ct.byref(fctx),
        ct.byref(handle.ctx),
        flat.ctypes.data_as(ct.POINTER(ct.c_uint64)),
        out.ctypes.data_as(ct.POINTER(ct.c_uint64)),
        B,
        k,
    )
    oflat = out.reshape(-1, n64)
    lib.anemoi_from_mont(ct.byref(fctx), oflat.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                         oflat.shape[0])
    return _to13(out, fp)
