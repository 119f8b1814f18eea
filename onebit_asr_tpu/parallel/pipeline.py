"""Pipeline parallelism (GPipe) for the 3-branch QAT train step.

The reference has no model parallelism of any kind (SURVEY §2.8 — a single
`.to(device)`); this module opens the pipeline axis the TPU-native way: the
encoder's stacked [L, ...] block params shard over a mesh axis 'stage'
(each device holds L/S consecutive layers + their AdamW moments), and the
encoder applies them as a microbatch pipeline rotated with `lax.ppermute`
(model/conformer.py `_pipelined_blocks`). Composes with the 'data' axis on
a 2-D mesh. Differentiation through ppermute/psum gives the exact reverse
pipeline — no hand-written backward schedule.

Math (why this equals the single-device step):
- The pipelined forward is bit-equivalent to the plain scanned stack when
  the conv norm is per-sample (group/layer norm; BatchNorm over microbatches
  is the GPipe-BN problem and is rejected at trace time).
- Everything outside the block stack (subsampler, decoder, CTC head,
  losses) is computed redundantly on every stage replica of a data shard.
  The per-device loss is scaled by 1/S so that the psum-broadcast transpose
  delivers exactly the true cotangent into the pipeline (S replicas × 1/S),
  and a psum over 'stage' of the NON-block gradients recovers their true
  values (stage-0-only subsampler grads sum with zeros; post-encoder grads
  sum S × 1/S copies). Block gradients arrive complete and stage-local.
- Global-norm clipping must see the TRUE norm: block grads are stage-local,
  so ||g||² = psum_stage(Σ_block g²) + Σ_nonblock g² (the non-block copies
  are identical across stages and counted once). The clip is applied here,
  before optimizer.update — the optimizer's internal clip then sees a local
  norm ≤ the clipped global norm and passes through untouched.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onebit_asr_tpu.train.state import TrainState
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens


def _is_block_path(path: Tuple[Any, ...]) -> bool:
    """True for leaves under the encoder's stacked block params (leading
    axis = layer), in params and in the mirrored AdamW moment trees."""
    return any(str(getattr(k, "key", k)) == "blocks" for k in path)


def pipeline_spec_tree(tree: Any, stage_axis: str = "stage"):
    """PartitionSpec pytree: block-stack leaves shard their layer axis over
    `stage_axis`, everything else replicates. Works for params, TrainState,
    or gradient trees (AdamW moments mirror the param paths)."""

    def rule(path, leaf):
        if _is_block_path(path) and getattr(leaf, "ndim", 0) >= 1:
            return P(stage_axis)
        return P()

    return jax.tree_util.tree_map_with_path(rule, tree)


def shard_state_pipeline(state: Any, mesh: Mesh, stage_axis: str = "stage"):
    """device_put a TrainState with block params + moments sharded over the
    pipeline stage axis (layer axis 0), the rest replicated."""
    specs = pipeline_spec_tree(state, stage_axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(state, shardings)


def make_pipeline_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig,
    specials: SpecialTokens,
    num_enc_layers: int,
    mesh: Mesh,
    microbatches: int = 2,
    data_axis: str = "data",
    stage_axis: str = "stage",
    grad_clip_norm: float = OptimConfig().grad_clip_norm,
):
    """Build the pipelined 3-branch QAT train step over a
    (data × stage) mesh via jax.shard_map.

    `grad_clip_norm` MUST equal the optimizer's internal clip threshold
    (OptimConfig.grad_clip_norm): the true global norm is computed here
    across the stage axis and applied before optimizer.update.

    The state must be sharded with `shard_state_pipeline` (block params /
    moments split over `stage_axis`); batches shard over `data_axis`.
    """
    from onebit_asr_tpu.train.step import make_batch_loss, sample_sp_mask

    stages = dict(zip(mesh.axis_names, mesh.devices.shape))[stage_axis]
    if num_enc_layers % stages:
        raise ValueError(
            f"enc_layers {num_enc_layers} not divisible by {stages} stages"
        )
    if getattr(model, "conv_norm", None) == "batch_norm":
        raise ValueError(
            "pipeline parallelism requires conv_norm in {group_norm, "
            "layer_norm}: BatchNorm statistics cannot sync across ticks"
        )
    model = model.clone(
        pipeline_axis=stage_axis,
        pipeline_stages=stages,
        pipeline_microbatches=microbatches,
    )
    batch_loss = make_batch_loss(
        model, loss_cfg, specials, num_enc_layers, axis_name=data_axis
    )

    def scaled_loss(params, b, sp_mask, branch_rngs):
        total, aux = batch_loss(params, b, sp_mask, branch_rngs)
        # 1/S: S stage replicas compute this same loss; the psum-broadcast
        # transpose inside the encoder sums their cotangents
        return total / stages, aux

    def local_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        # same 5-way split as make_train_step → identical sp_mask stream
        next_rng, sp_key, r_t, r_1, r_s = jax.random.split(state.rng, 5)
        sp_mask = sample_sp_mask(
            sp_key, num_enc_layers, loss_cfg.sp_low_p, loss_cfg.sp_high_p
        )
        # fold ONLY the data index: stage replicas of a data shard must
        # compute bit-identical redundant (non-block) work for the stage
        # psum of their gradients to be exact
        idx = jax.lax.axis_index(data_axis)
        branch_rngs = jnp.stack(
            [jax.random.fold_in(r, idx) for r in (r_t, r_1, r_s)]
        )
        (_, aux), grads = jax.value_and_grad(scaled_loss, has_aux=True)(
            state.params, batch, sp_mask, branch_rngs
        )
        # global batch: batch_loss psums numerator AND denominator over
        # 'data'; the TRANSPOSE of those psums already multiplies each
        # device's raw gradient by N_data (replicated cotangent), so the
        # exact global gradient is the pmean: (1/N)·Σ(N·local) = global
        # (see make_sharded_train_step's docstring for the derivation)
        grads = jax.lax.pmean(grads, data_axis)
        # stage reduction: non-block grads are 1/S replicas (+ the stage-0-
        # only subsampler contribution) — psum recovers the true values;
        # block grads are already complete and stage-local
        grads = jax.tree_util.tree_map_with_path(
            lambda p, g: g if _is_block_path(p) else jax.lax.psum(
                g, stage_axis
            ),
            grads,
        )
        # true global gradient norm: stage-local block leaves + one copy of
        # the replicated leaves
        sq = jax.tree_util.tree_map_with_path(
            lambda p, g: (
                jax.lax.psum(jnp.sum(jnp.square(g)), stage_axis)
                if _is_block_path(p)
                else jnp.sum(jnp.square(g))
            ),
            grads,
        )
        gn = jnp.sqrt(
            jax.tree.reduce(jnp.add, sq, jnp.zeros((), jnp.float32))
        )
        # optax.clip_by_global_norm semantics: scale = clip / max(gn, clip).
        # After this, every local tree's norm ≤ clip, so the optimizer's
        # internal clip (which would compute the WRONG, local norm) is a
        # provable no-op.
        scale = grad_clip_norm / jnp.maximum(gn, grad_clip_norm)
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = gn  # pre-clip, matching make_train_step
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=next_rng,
        )
        return new_state, aux

    def step(state, batch):
        specs = pipeline_spec_tree(state, stage_axis)
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(specs, P(data_axis)),
            out_specs=(specs, P()),
            check_vma=False,  # replicated outputs are consistent by
            # construction (identical psum'd grads on every device)
        )
        return sharded(state, batch)

    return jax.jit(step)
