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
import jax.numpy as jnp
import numpy as np
import optax
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


def fsdp_state_specs(
    state: Any, n_shards: int, axis: str = "data", min_elems: int = 4096
):
    """Bare-PartitionSpec tree for a whole TrainState under the FSDP layout
    (the spec-level twin of fsdp_state_shardings, for shard_map in/out
    specs)."""
    return jax.tree.map(
        lambda leaf: _leaf_spec(leaf, n_shards, axis, min_elems), state
    )


def _leaf_shard_dim(leaf, n_shards: int, axis: str, min_elems: int) -> int:
    spec = _leaf_spec(leaf, n_shards, axis, min_elems)
    return spec.index(axis) if axis in spec else -1


def make_fsdp_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg,
    specials,
    num_enc_layers: int,
    mesh: Mesh,
    state: Any,
    axis: str = "data",
    min_elems: int = 4096,
    grad_accum: int = 1,
    # COUPLING INVARIANT: must equal the optimizer chain's own
    # clip_by_global_norm threshold (OptimConfig.grad_clip_norm — both
    # default 5.0). The distributed pre-scale below only neutralizes the
    # chain's internal clip when this is ≤ its threshold; a LARGER value
    # here lets the internal clip engage on per-device LOCAL norms, which
    # differ across shards and silently diverge replicated leaves
    # (ADVICE r4). Pass `optim_cfg` to derive it instead of trusting it.
    grad_clip_norm: float | None = None,
    optim_cfg=None,
):
    """ZeRO-2 train step with EXPLICIT collectives (shard_map).

    The GSPMD layout above gets the memory win (sharded params + moments)
    but not ZeRO's bandwidth economics: the partitioner resolves the
    data-axis gradient sum as all-reduce (full gradient bytes to every
    chip) + slice — MULTICHIP_r03 measured fsdp at 34 all-reduces /
    0 reduce-scatters, and pinning the gradient sharding cannot fix it on
    backends whose HLO pipeline lacks the all-reduce+dynamic-slice →
    reduce-scatter rewrite. This step makes the economics explicit, the
    shard_map way (same design as train/step.py make_sharded_train_step):

      1. each device holds only its SHARD of params + AdamW moments
         (fsdp_state_specs layout — 1/N state bytes per chip);
      2. weights are `all_gather`ed (tiled) once per step at use;
      3. per-device gradients combine with `lax.psum_scatter` — each chip
         receives only ITS shard of the summed gradient (1/N the bytes of
         an all-reduce on the wire and in HBM), ZeRO-2's defining move;
      4. the global-norm clip is distributed: sharded leaves' sum-of-
         squares psum over the axis (shards are disjoint), replicated
         leaves added once; grads are pre-scaled by
         clip/max(norm, clip) — optax's exact formula — after which the
         optimizer chain's own local clip is a provable no-op (every
         local norm ≤ the clipped global norm);
      5. optimizer update runs on shards only; params/moments stay
         sharded across steps.

    `grad_accum > 1` accumulates SCATTERED gradient shards across
    micro-batches (the full gradient never materializes). Loss math is
    identical to the GSPMD step: make_batch_loss(axis_name) psums loss
    numerators/denominators, so per-device raw grads are N x their shard's
    contribution and psum_scatter/N == the global gradient (see
    make_sharded_train_step's derivation). ZeRO reference: SURVEY §2.8
    (additive scale-out; the torch reference is single-GPU)."""
    from onebit_asr_tpu.train.state import TrainState
    from onebit_asr_tpu.train.step import make_batch_loss, sample_sp_mask
    from onebit_asr_tpu.utils.config import OptimConfig

    # resolve the clip threshold from the optimizer config when given —
    # the safe path: the distributed pre-scale and the chain's internal
    # clip are then provably the same threshold (see signature note)
    if optim_cfg is not None:
        if (
            grad_clip_norm is not None
            and grad_clip_norm != optim_cfg.grad_clip_norm
        ):
            raise ValueError(
                f"grad_clip_norm={grad_clip_norm} contradicts "
                f"optim_cfg.grad_clip_norm={optim_cfg.grad_clip_norm}; the "
                "distributed clip must match the optimizer chain's own "
                "threshold (pass only optim_cfg)"
            )
        grad_clip_norm = optim_cfg.grad_clip_norm
    elif grad_clip_norm is None:
        grad_clip_norm = OptimConfig().grad_clip_norm

    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    if getattr(model, "norm_axis", None) != axis and hasattr(model, "clone"):
        model = model.clone(norm_axis=axis)  # sync-BN inside shard_map
    batch_loss = make_batch_loss(
        model, loss_cfg, specials, num_enc_layers, axis_name=axis
    )
    param_dims = jax.tree.map(
        lambda l: _leaf_shard_dim(l, n, axis, min_elems), state.params
    )
    state_specs = fsdp_state_specs(state, n, axis, min_elems)

    def gather_full(shard, d):
        return shard if d < 0 else jax.lax.all_gather(
            shard, axis, axis=d, tiled=True
        )

    def scatter_grad(g, d):
        if d < 0:
            return jax.lax.pmean(g, axis)
        return jax.lax.psum_scatter(
            g, axis, scatter_dimension=d, tiled=True
        ) / n

    def local_step(state: TrainState, batch):
        # same 5-way RNG split as make_train_step → identical sp_mask
        # stream; dropout keys fold in the shard index (distinct masks per
        # example, as single-device semantics require)
        next_rng, sp_key, r_t, r_1, r_s = jax.random.split(state.rng, 5)
        sp_mask = sample_sp_mask(
            sp_key, num_enc_layers, loss_cfg.sp_low_p, loss_cfg.sp_high_p
        )
        idx = jax.lax.axis_index(axis)
        branch_rngs = jnp.stack(
            [jax.random.fold_in(r, idx) for r in (r_t, r_1, r_s)]
        )
        full_params = jax.tree.map(gather_full, state.params, param_dims)

        if grad_accum == 1:
            (_, aux), g = jax.value_and_grad(batch_loss, has_aux=True)(
                full_params, batch, sp_mask, branch_rngs
            )
            grads = jax.tree.map(scatter_grad, g, param_dims)
        else:
            B = batch["feats"].shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"local batch {B} not divisible by grad_accum {grad_accum}"
                )
            micro = jax.tree.map(
                lambda v: v.reshape(grad_accum, B // grad_accum, *v.shape[1:]),
                dict(batch),
            )

            def one_micro(i, mb):
                rngs_i = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                    branch_rngs, i
                )
                (_, aux_i), g_i = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(full_params, mb, sp_mask, rngs_i)
                # scatter per micro-batch: the accumulator holds shards
                return aux_i, jax.tree.map(scatter_grad, g_i, param_dims)

            aux0, g0 = one_micro(0, jax.tree.map(lambda v: v[0], micro))

            def body(acc, inp):
                i, mb = inp
                aux_i, g_i = one_micro(i, mb)
                acc_g, acc_aux = acc
                return (
                    jax.tree.map(jnp.add, acc_g, g_i),
                    jax.tree.map(jnp.add, acc_aux, aux_i),
                ), None

            (grads, aux), _ = jax.lax.scan(
                body,
                (g0, aux0),
                (jnp.arange(1, grad_accum),
                 jax.tree.map(lambda v: v[1:], micro)),
            )
            grads = jax.tree.map(lambda g_: g_ / grad_accum, grads)
            aux = jax.tree.map(lambda a: a / grad_accum, aux)

        # distributed global-norm clip (step 4 of the docstring)
        sq = jax.tree.map(
            lambda g_, d: jnp.sum(jnp.square(g_.astype(jnp.float32))),
            grads, param_dims,
        )
        shard_sq = sum(
            s for s, d in zip(jax.tree.leaves(sq), jax.tree.leaves(param_dims))
            if d >= 0
        )
        rep_sq = sum(
            s for s, d in zip(jax.tree.leaves(sq), jax.tree.leaves(param_dims))
            if d < 0
        )
        gnorm = jnp.sqrt(jax.lax.psum(shard_sq, axis) + rep_sq)
        scale = grad_clip_norm / jnp.maximum(gnorm, grad_clip_norm)
        grads = jax.tree.map(lambda g_: g_ * scale, grads)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        aux["grad_norm"] = gnorm
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=next_rng,
        )
        return new_state, aux

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_specs, P(axis)),
        out_specs=(state_specs, P()),
        check_vma=False,  # replicated outputs are consistent by
        # construction (identical psum'd grads/aux on every shard)
    )
    # donate the input TrainState like every other train-step path: without
    # it old and new sharded params+moments coexist each step, transiently
    # doubling exactly the memory the ZeRO layout exists to save
    return jax.jit(sharded, donate_argnums=(0,))
