"""Device mesh + sharding utilities — the distributed story of the framework.

The reference has NO distributed code at all (SURVEY §2.8: no DDP/NCCL/MPI,
single `.to(device)`). The TPU-native distributed design, per BASELINE.json
config 5, is data parallelism over a `jax.sharding.Mesh`:

- the batch is sharded over the 'data' axis (leading dim of every batch
  array), parameters are replicated;
- the train step is jitted with those shardings; XLA inserts the gradient
  all-reduce over ICI — the TPU-native equivalent of an NCCL backend;
- a 'model' axis is kept in the mesh signature for future tensor-parallel
  layouts (the scanned [L, ...] parameter stacks shard naturally), though
  Conformer-scale models don't need it.

Ternary weights ship cheaply across the mesh as packed int8 (4 weights per
byte, see ops/quant.py pack_ternary) — replication costs 1/4 of an f32
parameter buffer per chip pair.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axes: Tuple[str, ...] = ("data",),
    devices: Optional[list] = None,
) -> Mesh:
    """Build a Mesh over all (or given) devices. Default: 1-D 'data' axis
    spanning every device."""
    devs = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(f"mesh shape {shape} != #devices {len(devs)}")
    dev_array = np.asarray(devs).reshape(shape)
    return Mesh(dev_array, axes)


def make_multislice_mesh(
    num_slices: Optional[int] = None,
    axes: Tuple[str, str] = ("dcn", "data"),
    devices: Optional[list] = None,
) -> Mesh:
    """Multi-slice data-parallel mesh: leading 'dcn' axis spans pod slices
    (collectives cross the data-center network), trailing 'data' axis spans
    ICI within a slice.

    On real multi-slice TPU topologies the grouping comes from each
    device's `slice_index` and the device order from
    `mesh_utils.create_hybrid_device_mesh`, so XLA's hierarchical
    all-reduce keeps the fat leg on ICI and crosses DCN once per slice
    pair. Off-pod (CPU fake devices, single slice) `num_slices` simulates
    the grouping for layout-level tests — collectives are identical
    semantically, only the physical transport differs.

    Batch arrays shard over BOTH axes (see shard_batch with
    axis=('dcn', 'data')); params replicate; the jitted train step is
    unchanged — XLA lowers the gradient psum hierarchically.
    """
    devs = devices if devices is not None else jax.devices()
    slice_ids = sorted({getattr(d, "slice_index", None) for d in devs})
    if len(slice_ids) > 1 and slice_ids[0] is not None:
        from jax.experimental import mesh_utils

        n = len(slice_ids)
        per = len(devs) // n
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per),
            dcn_mesh_shape=(n, 1),
            devices=devs,
        ).reshape(n, per)
        return Mesh(dev_array, axes)
    if num_slices is None or num_slices <= 1:
        raise ValueError(
            "single-slice topology: pass num_slices>1 to simulate DCN "
            "grouping (tests), or use make_mesh for a flat data axis"
        )
    if len(devs) % num_slices:
        raise ValueError(f"{len(devs)} devices not divisible by {num_slices}")
    dev_array = np.asarray(devs).reshape(num_slices, len(devs) // num_slices)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis="data") -> NamedSharding:
    """Sharding for batch arrays: leading dim split over `axis` (a mesh
    axis name, or a tuple of names to split over several — e.g.
    ('dcn', 'data') on a multi-slice mesh)."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis="data"):
    """Device-put every batch array with its leading dim over `axis`
    (name or tuple of names, e.g. ('dcn', 'data'))."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def constrain(x, *spec):
    """Annotate an activation's sharding if a mesh context is active.

    `spec` is a PartitionSpec-like tuple of axis names (or None) per array
    dimension; trailing dims may be omitted (= replicated). Axis names that
    are not in the active mesh — or whose mesh axis is Manual (inside
    `shard_map`, where the partitioner must not see constraints) — are
    dropped to None, and without any active mesh (single device, plain jit)
    the call is a no-op. This lets model code carry layout hints (e.g. the
    decoder's batch-over-'data' anchors that stop the 2-D mesh partitioner
    from thrashing cross-attention layouts — MULTICHIP_r02 findings)
    without ever depending on how, or whether, the caller parallelizes.

    Callers opt in by wrapping jit/step invocations in
    `jax.sharding.set_mesh(mesh)` (see __graft_entry__.dryrun_multichip,
    cli/train.py).
    """
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - very old jax
        return x
    if am is None or not am.axis_names:
        return x
    auto = {
        n
        for n, t in zip(am.axis_names, am.axis_types)
        if str(t).endswith("Auto")
    }

    def keep(s):
        if s is None:
            return None
        if isinstance(s, (tuple, list)):
            ss = tuple(n for n in s if n in auto)
            return ss if ss else None
        return s if s in auto else None

    cleaned = tuple(keep(s) for s in spec)
    if all(s is None for s in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, P(*cleaned))
