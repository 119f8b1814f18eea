"""Pipeline parallelism (GPipe over the encoder block stack).

The reference has no model parallelism (SURVEY §2.8); this is the additive
pipeline axis: stacked block params shard over a 'stage' mesh axis, and the
encoder applies them as a ppermute-rotated microbatch pipeline
(model/conformer.py _pipelined_blocks + parallel/pipeline.py). These tests
pin the pipelined step to the plain single-program jit step on the fake
8-device CPU mesh: with a per-sample conv norm and deterministic=True the
two are the same math, so losses, gradients (via grad_norm), and updated
parameters must agree to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.parallel import (
    make_mesh,
    make_pipeline_train_step,
    pipeline_spec_tree,
    shard_batch,
    shard_state_pipeline,
)
from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens

L = 4  # encoder layers; stages must divide this


def _model(**over):
    kw = dict(
        vocab_size=16, enc_d_model=32, enc_layers=L, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=True, compute_dtype=jnp.float32, remat=True,
        conv_norm="layer_norm",
    )
    kw.update(over)
    return ConformerASR(**kw)


def _setup(batch_size=8):
    model = _model()
    dm = DummyDataModule(
        batch_size=batch_size, max_frames=32, max_tokens=6, vocab_size=16
    )
    batch = next(dm.train_batches())
    opt = make_optimizer(OptimConfig(warmup_steps=1), total_steps=8)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, L)
    return model, dm, batch, opt, state


def _flat(params):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree.leaves(params)]
    )


@pytest.mark.parametrize("mesh_shape,microbatches", [((2, 4), 2), ((4, 2), 2)])
def test_pipeline_step_matches_jit_step(mesh_shape, microbatches):
    """One pipelined train step == one plain jit step: loss, grad_norm and
    every updated parameter agree (deterministic, per-sample conv norm)."""
    model, _, batch, opt, state = _setup()
    mesh = make_mesh(mesh_shape, ("data", "stage"))

    ref_step = jax.jit(make_train_step(model, opt, LossConfig(), SpecialTokens(), L))
    ref_state, ref_aux = ref_step(state, batch)

    pipe_step = make_pipeline_train_step(
        model, opt, LossConfig(), SpecialTokens(), L, mesh,
        microbatches=microbatches,
    )
    state_p = shard_state_pipeline(state, mesh)
    batch_p = shard_batch(batch, mesh)
    new_p, aux_p = pipe_step(state_p, batch_p)

    np.testing.assert_allclose(
        float(aux_p["loss"]), float(ref_aux["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(aux_p["grad_norm"]), float(ref_aux["grad_norm"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        _flat(new_p.params), _flat(ref_state.params), rtol=5e-4, atol=5e-5
    )
    assert int(new_p.step) == 1


def test_pipeline_state_sharding_layout():
    """Block params/moments shard their layer axis over 'stage'; everything
    else replicates; the local layer count is L/stages."""
    _, _, _, _, state = _setup()
    mesh = make_mesh((2, 4), ("data", "stage"))
    state_p = shard_state_pipeline(state, mesh)
    blocks = state_p.params["encoder"]["blocks"]
    leaf = jax.tree.leaves(blocks)[0]
    # global shape unchanged; each device holds L/4 layers
    assert leaf.shape[0] == L
    shard_shapes = {s.data.shape[0] for s in leaf.addressable_shards}
    assert shard_shapes == {L // 4}
    # a replicated leaf: every device holds the full array
    dec_leaf = jax.tree.leaves(state_p.params["decoder"])[0]
    assert {s.data.shape for s in dec_leaf.addressable_shards} == {
        dec_leaf.shape
    }


def test_pipeline_spec_tree_covers_moments():
    """AdamW moments mirror the param paths, so block moments shard too."""
    _, _, _, _, state = _setup()
    specs = pipeline_spec_tree(state, "stage")
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    block_specs = [
        s for path, s in flat
        if any(str(getattr(k, "key", k)) == "blocks" for k in path)
    ]
    # params + mu + nu for every block leaf
    assert len(block_specs) >= 3
    from jax.sharding import PartitionSpec as P

    assert all(s == P("stage") for s in block_specs)


def test_pipeline_rejects_batch_norm():
    """BatchNorm statistics cannot sync across pipeline ticks (GPipe-BN):
    the builder must reject it loudly rather than silently train on
    microbatch statistics."""
    model = _model(conv_norm="batch_norm")
    mesh = make_mesh((2, 4), ("data", "stage"))
    opt = make_optimizer(OptimConfig(), total_steps=8)
    with pytest.raises(ValueError, match="conv_norm"):
        make_pipeline_train_step(
            model, opt, LossConfig(), SpecialTokens(), L, mesh
        )


def test_pipeline_composes_with_pallas_ctc():
    """Pipeline runs inside shard_map, so the Pallas CTC recursions
    (interpret mode on CPU) compose with it — same loss as the XLA scan
    CTC under the same pipelined step."""
    import os

    from onebit_asr_tpu.losses import ctc as ctc_mod

    model, _, batch, opt, state = _setup()
    mesh = make_mesh((4, 2), ("data", "stage"))
    step = make_pipeline_train_step(
        model, opt, LossConfig(), SpecialTokens(), L, mesh, microbatches=2
    )
    s = shard_state_pipeline(state, mesh)
    b = shard_batch(batch, mesh)
    base = float(step(s, b)[1]["loss"])

    os.environ["ONEBIT_CTC_PALLAS_FORCE_INTERPRET"] = "1"
    try:
        if not ctc_mod.pallas_available_on_backend():
            pytest.skip("no interpretable pallas path on this backend")
        step_pallas = make_pipeline_train_step(
            model, opt, LossConfig(), SpecialTokens(), L, mesh,
            microbatches=2,
        )
        loss_pallas = float(step_pallas(s, b)[1]["loss"])
        np.testing.assert_allclose(loss_pallas, base, rtol=1e-5)
    finally:
        os.environ.pop("ONEBIT_CTC_PALLAS_FORCE_INTERPRET", None)


def test_pipeline_trains_multiple_steps():
    """Three consecutive pipelined steps: loss finite, step counter
    advances, parameters keep moving after warmup."""
    model, dm, batch, opt, state = _setup()
    mesh = make_mesh((2, 4), ("data", "stage"))
    step = make_pipeline_train_step(
        model, opt, LossConfig(), SpecialTokens(), L, mesh, microbatches=2
    )
    s = shard_state_pipeline(state, mesh)
    b = shard_batch(batch, mesh)
    losses = []
    for _ in range(3):
        s, aux = step(s, b)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(losses))
    assert int(s.step) == 3
    before = _flat(state.params["encoder"]["blocks"])
    after = _flat(jax.device_get(s.params["encoder"]["blocks"]))
    assert not np.allclose(before, after)
