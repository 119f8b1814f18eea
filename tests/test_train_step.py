"""End-to-end train-step tests on the synthetic fake backend.

The v0 milestone from SURVEY §7: one jitted 3-branch QAT step on synthetic
batches — loss finite and decreasing, zero NaN — plus the fake-8-device
data-parallel variant (conftest forces XLA_FLAGS device_count=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.parallel import make_mesh, replicate, shard_batch
from onebit_asr_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    sample_sp_mask,
)
from onebit_asr_tpu.train.optim import warmup_cosine_schedule
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens

ENC_LAYERS = 2


def _tiny_setup(batch_size=4):
    model = ConformerASR(
        vocab_size=16,
        enc_d_model=32,
        enc_layers=ENC_LAYERS,
        enc_heads=2,
        enc_d_ff=64,
        enc_conv_kernel=7,
        dec_layers=1,
        dec_heads=2,
        dec_d_ff=64,
        deterministic=False,
        compute_dtype=jnp.float32,
        remat=True,
    )
    dm = DummyDataModule(
        batch_size=batch_size, max_frames=32, max_tokens=6, vocab_size=16,
        num_train=batch_size * 16,
    )
    optimizer = make_optimizer(
        OptimConfig(lr=3e-3, warmup_steps=4, grad_clip_norm=5.0), total_steps=64
    )
    batch = next(dm.train_batches())
    state = create_train_state(
        model, optimizer, jax.random.PRNGKey(0), batch, ENC_LAYERS
    )
    step = make_train_step(
        model, optimizer, LossConfig(), SpecialTokens(), ENC_LAYERS
    )
    return model, dm, state, step


def test_train_step_loss_decreases_no_nan():
    model, dm, state, step = _tiny_setup()
    step = jax.jit(step)
    losses = []
    for i, batch in enumerate(dm.train_batches()):
        state, aux = step(state, batch)
        loss = float(aux["loss"])
        assert np.isfinite(loss), f"NaN/inf loss at step {i}"
        assert np.isfinite(float(aux["grad_norm"]))
        losses.append(loss)
        if i >= 11:
            break
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_train_step_updates_alpha_scales():
    """The learnable quantizer scales must receive gradients (Eq. 3 path)."""
    model, dm, state, step = _tiny_setup()
    step = jax.jit(step)
    alphas_before = jax.tree.leaves(
        jax.tree_util.tree_map_with_path(
            lambda p, x: x if any("alpha" in str(k) for k in p) else None,
            state.params,
        )
    )
    # take several steps: warmup LR is exactly 0 at step 0
    state2 = state
    for batch in list(dm.train_batches())[:3]:
        state2, _ = step(state2, batch)
    moved = []
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(state2.params)[0],
    ):
        if any("alpha" in str(k) for k in pa):
            moved.append(not np.allclose(np.asarray(a), np.asarray(b)))
    assert moved and any(moved), "no alpha parameter moved after one step"


def test_sp_mask_distribution():
    key = jax.random.PRNGKey(0)
    n = 512
    masks = jax.vmap(lambda k: sample_sp_mask(k, 12))(jax.random.split(key, n))
    rates = np.asarray(jnp.mean(masks.astype(jnp.float32), axis=0))
    assert 0.1 < rates[0] < 0.35  # p=0.2 at first layer
    assert 0.8 < rates[-1] < 0.99  # p=0.9 at last layer
    assert (np.diff(rates) > -0.12).all()  # roughly increasing


def test_warmup_cosine_matches_reference_shape():
    sched = warmup_cosine_schedule(1.0, 10, 110, 0.1)
    assert abs(float(sched(0))) < 1e-6
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(110)) - 0.1) < 1e-6
    mid = float(sched(60))
    assert 0.5 < mid < 0.56  # cosine midpoint = 0.55 with floor 0.1


def test_data_parallel_train_step_8_devices():
    """Full DP train step over the fake 8-device CPU mesh: params replicated,
    batch sharded over 'data', gradients all-reduced by XLA."""
    assert len(jax.devices()) == 8, "conftest must fake 8 devices"
    model, dm, state, step = _tiny_setup(batch_size=8)
    mesh = make_mesh()
    state = jax.device_put(state, replicate(mesh))
    step = jax.jit(step)
    batch = shard_batch(next(dm.train_batches()), mesh)
    state2, aux = step(state, batch)
    assert np.isfinite(float(aux["loss"]))
    # a second step reusing the compiled fn
    batch2 = shard_batch(next(dm.valid_batches()), mesh)
    state3, aux2 = step(state2, batch2)
    assert np.isfinite(float(aux2["loss"]))


def test_multislice_dcn_mesh_matches_flat_mesh():
    """Multi-slice data parallelism (BASELINE config 5 over pods): a
    ('dcn', 'data') = (2, 4) hybrid mesh with the batch sharded over BOTH
    axes must produce the same loss as the flat 8-device 'data' mesh —
    XLA lowers the gradient all-reduce hierarchically (ICI within slice,
    DCN across) but the math is identical. Real-DCN transport needs a pod;
    this pins the layout/API level on the fake 8-device mesh."""
    from onebit_asr_tpu.parallel import make_multislice_mesh

    assert len(jax.devices()) == 8, "conftest must fake 8 devices"
    model, dm, state, step = _tiny_setup(batch_size=8)
    step = jax.jit(step)
    batch = next(dm.train_batches())

    flat = make_mesh()
    s_flat, _ = step(
        jax.device_put(state, replicate(flat)), shard_batch(batch, flat)
    )
    mesh = make_multislice_mesh(num_slices=2)
    assert mesh.axis_names == ("dcn", "data") and mesh.devices.shape == (2, 4)
    state_ms = jax.device_put(state, replicate(mesh))
    batch_ms = shard_batch(batch, mesh, axis=("dcn", "data"))
    s_ms, aux_ms = step(state_ms, batch_ms)
    assert np.isfinite(float(aux_ms["loss"]))
    flat_params = jax.tree.leaves(s_flat.params)
    ms_params = jax.tree.leaves(s_ms.params)
    for a, b in zip(flat_params, ms_params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_batch_64_no_nan():
    """SURVEY §4: NaN-freedom regression at batch >= 64 — the reference's
    documented failure regime (README.md:16-18) must train cleanly."""
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=False, compute_dtype=jnp.bfloat16, remat=True,
    )
    dm = DummyDataModule(
        batch_size=64, max_frames=32, max_tokens=6, vocab_size=16,
        num_train=128,
    )
    optimizer = make_optimizer(OptimConfig(warmup_steps=2), total_steps=8)
    batch = next(dm.train_batches())
    state = create_train_state(
        model, optimizer, jax.random.PRNGKey(0), batch, ENC_LAYERS
    )
    step = jax.jit(
        make_train_step(model, optimizer, LossConfig(), SpecialTokens(), ENC_LAYERS)
    )
    for i, b in enumerate(dm.train_batches()):
        state, aux = step(state, b)
        assert np.isfinite(float(aux["loss"])), f"NaN at batch-64 step {i}"
        if i >= 1:
            break


@pytest.mark.parametrize("policy", ["masks", "attn", "fused"])
def test_remat_policy_saves_are_loss_identical(policy):
    """remat_policy 'masks'/'attn'/'fused' only change WHAT the backward
    reloads vs recomputes (saved dropout bytes / prob tensors / fused
    kernel outputs) — the training trajectory must be bit-comparable to
    'full'. (On this CPU path 'fused' degenerates to 'masks' — no attn_out
    name exists without the kernel — but it must still compile and match.)"""
    losses = {}
    for pol in ("full", policy):
        model = ConformerASR(
            vocab_size=16, enc_d_model=32, enc_layers=ENC_LAYERS, enc_heads=2,
            enc_d_ff=64, enc_conv_kernel=7, dec_layers=1, dec_heads=2,
            dec_d_ff=64, deterministic=False, compute_dtype=jnp.float32,
            remat=True, remat_policy=pol,
        )
        dm = DummyDataModule(
            batch_size=4, max_frames=32, max_tokens=6, vocab_size=16,
            num_train=64,
        )
        optimizer = make_optimizer(
            OptimConfig(lr=3e-3, warmup_steps=4, grad_clip_norm=5.0),
            total_steps=64,
        )
        batch = next(dm.train_batches())
        state = create_train_state(
            model, optimizer, jax.random.PRNGKey(0), batch, ENC_LAYERS
        )
        step = jax.jit(
            make_train_step(model, optimizer, LossConfig(), SpecialTokens(),
                            ENC_LAYERS)
        )
        ls = []
        for _ in range(3):
            state, aux = step(state, batch)
            ls.append(float(aux["loss"]))
        losses[pol] = ls
    np.testing.assert_allclose(losses["full"], losses[policy], rtol=1e-5)
