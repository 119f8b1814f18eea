"""Parameter sharding rules: the tensor-parallel door (SURVEY §2.8).

The reference has no parallelism at all; our primary story is data
parallelism (mesh.py). These rules open the 'model' axis: QuantDense weight
stacks [L, K, N] shard their hidden dimension across the mesh —

- up-projections (ff w1, attention q/k/v/pos) shard the OUTPUT dim N
  (column parallel: each device computes a slice of the features);
- down-projections (ff w2, attention out_proj) shard the INPUT dim K
  (row parallel: partial sums all-reduced by XLA);

which is the standard Megatron layout — pairs of column→row parallel
matmuls need exactly one collective per pair, inserted automatically by
XLA's SPMD partitioner from these annotations. Everything else (norms,
biases, alpha scalars, conv, decoder) replicates.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# QuantDense module names → which matmul dim to shard
_COLUMN_PARALLEL = {"w1", "q_proj", "k_proj", "v_proj", "pos_proj"}
_ROW_PARALLEL = {"w2", "out_proj"}


def _spec_for(path: Tuple[str, ...], leaf, model_axis: str) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    if names and names[-1] == "kernel" and len(names) >= 2:
        owner = names[-2]
        nd = leaf.ndim  # 2 for plain, 3 for scanned [L, K, N]
        if owner in _COLUMN_PARALLEL:
            return P(*([None] * (nd - 1)), model_axis)
        if owner in _ROW_PARALLEL:
            return P(*([None] * (nd - 2)), model_axis, None)
    return P()  # replicate


def tp_param_shardings(params: Any, mesh: Mesh, model_axis: str = "model"):
    """Pytree of NamedShardings implementing the Megatron-style layout."""
    if model_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {model_axis!r}: {mesh.axis_names}")

    def rule(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, model_axis))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params_tp(params: Any, mesh: Mesh, model_axis: str = "model"):
    """device_put the params with tensor-parallel shardings."""
    return jax.device_put(params, tp_param_shardings(params, mesh, model_axis))


def tp_state_shardings(state: Any, mesh: Mesh, model_axis: str = "model"):
    """NamedShardings for a whole TrainState under the TP layout.

    The AdamW moments (mu/nu inside opt_state) mirror the param tree, so the
    same path rule applies: any leaf whose path ends in (<matmul owner>,
    kernel) shards with its parameter, everything else (step, rng, scalars,
    norms, schedule counters) replicates. Sharding the moments matters: they
    are 2x the param memory, and a TP layout that replicates them wastes the
    axis's whole memory win."""
    if model_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {model_axis!r}: {mesh.axis_names}")

    def rule(path, leaf):
        return NamedSharding(mesh, _spec_for(path, leaf, model_axis))

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_state_tp(state: Any, mesh: Mesh, model_axis: str = "model"):
    """device_put a TrainState with params AND optimizer moments sharded."""
    return jax.device_put(state, tp_state_shardings(state, mesh, model_axis))
