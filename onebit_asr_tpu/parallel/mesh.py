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


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch arrays: leading dim split over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Device-put every batch array with its leading dim over `axis`."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
