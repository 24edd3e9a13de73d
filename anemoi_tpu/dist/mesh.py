"""Device-mesh setup for multi-chip / multi-host execution.

TPU-native communication stack (SURVEY.md section 2.5): XLA collectives over
ICI within a slice and DCN across hosts, driven by `jax.sharding` +
`shard_map`.  The reference has no distributed execution at all; this module
is the moral equivalent of a NCCL/Gloo backend in the CUDA world.

Mesh convention: a 1-D mesh over all local (or all global) devices with axis
name "chips" serves batch hashing and Merkle forests; multi-host runs add a
leading "hosts" axis via `jax.distributed.initialize` (process-spanning
meshes use the same code path -- jax.make_mesh orders devices host-major).
"""

from __future__ import annotations

import jax
import numpy as np

CHIPS_AXIS = "chips"


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group bring-up (jax.distributed over DCN).

    No-op when running single-process; arguments forward to
    jax.distributed.initialize (coordinator_address, num_processes,
    process_id) for explicit bring-up on pod slices.
    """
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def chip_mesh(n_devices: int | None = None) -> jax.sharding.Mesh:
    """1-D mesh over devices; collectives ride ICI within a slice."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (CHIPS_AXIS,))


def batch_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Sharding for (..., N) limb tensors: split the trailing batch axis."""
    spec = jax.sharding.PartitionSpec(
        *([None] * 1), mesh.axis_names[-1]
    )
    return jax.sharding.NamedSharding(mesh, spec)


def shard_batch(arr, mesh: jax.sharding.Mesh):
    """Place an int32[..., N] tensor with its batch axis split over chips."""
    ndim = arr.ndim
    spec = jax.sharding.PartitionSpec(
        *([None] * (ndim - 1)), mesh.axis_names[-1]
    )
    return jax.device_put(arr, jax.sharding.NamedSharding(mesh, spec))


_DTYPE_BYTES = {"s32": 4, "u32": 4, "f32": 4, "s8": 1, "u8": 1, "s16": 2,
                "u16": 2, "bf16": 2, "f16": 2, "s64": 8, "u64": 8, "f64": 8,
                "pred": 1}

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_traffic(jitted_fn, *args) -> dict:
    """Bytes moved per collective in a compiled sharded program (SURVEY.md
    section 5 "bytes moved per collective").

    Compiles `jitted_fn(*args)` and scans the optimized HLO for collective
    ops, summing each op's output-shape bytes (per participating device).
    Measured from the program XLA actually runs, not from an analytic model:
    if partitioning inserts an unexpected collective, it shows up here.

    Returns {"ops": [{op, shape, bytes_per_device}...],
             "total_bytes_per_device": N, "counts": {op_kind: n}}.
    """
    import re

    txt = jitted_fn.lower(*args).compile().as_text()
    ops = []
    counts: dict = {}
    # e.g.:  %ag = s32[20,8]{1,0} all-gather(%x), replica_groups=...
    pat = re.compile(
        r"=\s+(?:\()?(\w+)\[([\d,]*)\][^)\s]*\s+(" + "|".join(_COLLECTIVES) + r")"
    )
    for m in pat.finditer(txt):
        dtype, dims, kind = m.groups()
        nbytes = _DTYPE_BYTES.get(dtype, 4)
        for d in dims.split(","):
            if d:
                nbytes *= int(d)
        ops.append({"op": kind, "shape": f"{dtype}[{dims}]",
                    "bytes_per_device": nbytes})
        counts[kind] = counts.get(kind, 0) + 1
    return {
        "ops": ops,
        "total_bytes_per_device": sum(o["bytes_per_device"] for o in ops),
        "counts": counts,
    }
