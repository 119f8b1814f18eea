"""FSDP / ZeRO-style parameter + optimizer-state sharding (GSPMD).

The data-parallel default replicates params and AdamW moments on every
device — at Conformer-L that is ~1.5 GB of f32 master state per chip that
the 'data' axis could be splitting instead. FSDP via GSPMD is purely a
LAYOUT: shard every large leaf of the TrainState over the existing 'data'
axis (one dim per leaf, chosen below), keep the train step exactly
`make_train_step`, and let XLA's partitioner insert the all-gathers where
a full weight is consumed and keep gradients/updates sharded elementwise.
No step-function changes, identical math to the replicated layout — the
TPU-native equivalent of torch FSDP/ZeRO-3 (the reference is single-GPU,
SURVEY §2.8; this is additive scale-out capability).

Dim choice: the LARGEST dim divisible by the axis size — for the scanned
block stacks [L, K, N] that is a matmul dim, not the layer dim, so it
composes with pipeline ('stage' takes the layer axis) and differs from
tensor parallelism only in that FSDP gathers weights rather than
activations. Leaves smaller than `min_elems` (biases, alphas, norm
scales, scalars) replicate — sharding them buys nothing and costs
collective launches.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, n_shards: int, axis: str, min_elems: int) -> P:
    shape = getattr(leaf, "shape", ())
    size = int(np.prod(shape)) if shape else 0
    if size < min_elems or not shape:
        return P()
    # largest dim divisible by the axis size; ties → later (matmul) dim
    best = None
    for d, extent in enumerate(shape):
        if extent % n_shards == 0 and (
            best is None or extent >= shape[best]
        ):
            best = d
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_state_shardings(
    state: Any, mesh: Mesh, axis: str = "data", min_elems: int = 4096
):
    """NamedShardings for a whole TrainState under the FSDP layout: every
    large leaf (params AND AdamW moments — the moments are 2x the param
    bytes and are the main ZeRO win) shards one dim over `axis`."""
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def rule(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, n, axis, min_elems))

    return jax.tree.map(rule, state)


def shard_state_fsdp(
    state: Any, mesh: Mesh, axis: str = "data", min_elems: int = 4096
):
    """device_put a TrainState into the FSDP layout."""
    return jax.device_put(
        state, fsdp_state_shardings(state, mesh, axis, min_elems)
    )
