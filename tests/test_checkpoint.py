"""Orbax checkpoint round-trip: full train-state save → restore → bit-equal."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
from onebit_asr_tpu.utils.checkpoint import (
    CheckpointManager,
    abstract_like,
    load_config,
    save_config,
)
from onebit_asr_tpu.utils.config import (
    LossConfig,
    OptimConfig,
    SpecialTokens,
    TrainConfig,
)


def test_train_state_roundtrip(tmp_path):
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=False, compute_dtype=jnp.float32, remat=False,
    )
    dm = DummyDataModule(batch_size=2, max_frames=32, max_tokens=6, vocab_size=16)
    optimizer = make_optimizer(OptimConfig(warmup_steps=2), total_steps=8)
    batch = next(dm.train_batches())
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch, 2)
    step = jax.jit(
        make_train_step(model, optimizer, LossConfig(), SpecialTokens(), 2)
    )
    state, _ = step(state, batch)  # non-trivial opt state + rng

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state)
    assert mgr.latest_step() == 1
    restored = mgr.restore(abstract_like(state))
    mgr.close()

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state continues training identically
    s1, aux1 = step(state, batch)
    s2, aux2 = step(restored, batch)
    np.testing.assert_allclose(
        float(aux1["loss"]), float(aux2["loss"]), rtol=1e-6
    )


def test_pipeline_sharded_state_resume_bit_exact(tmp_path):
    """Preemption-resume under pipeline parallelism: save a stage-sharded
    TrainState mid-training, restore on a 'fresh process' (abstract
    skeleton), re-shard, continue — identical params to the uninterrupted
    run. Orbax must round-trip the GLOBAL values of sharded arrays."""
    from onebit_asr_tpu.parallel import (
        make_mesh,
        make_pipeline_train_step,
        shard_batch,
        shard_state_pipeline,
    )

    L = 2
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=L, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=True, compute_dtype=jnp.float32, remat=False,
        conv_norm="layer_norm",
    )
    dm = DummyDataModule(batch_size=8, max_frames=32, max_tokens=6, vocab_size=16)
    optimizer = make_optimizer(OptimConfig(warmup_steps=1), total_steps=8)
    batch = next(dm.train_batches())
    state0 = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch, L)
    mesh = make_mesh((4, 2), ("data", "stage"))
    step = make_pipeline_train_step(
        model, optimizer, LossConfig(), SpecialTokens(), L, mesh,
        microbatches=2,
    )
    b = shard_batch(batch, mesh)

    # uninterrupted: 2 steps
    s = shard_state_pipeline(state0, mesh)
    s, _ = step(s, b)
    s_straight, _ = step(s, b)

    # interrupted: 1 step -> save (sharded) -> restore fresh -> re-shard -> 1 step
    s = shard_state_pipeline(state0, mesh)
    s, _ = step(s, b)
    mgr = CheckpointManager(str(tmp_path / "ckpt_pp"))
    mgr.save(s)
    restored = mgr.restore(abstract_like(state0))
    mgr.close()
    s_resumed, _ = step(shard_state_pipeline(restored, mesh), b)

    for a, c in zip(
        jax.tree.leaves(s_straight.params), jax.tree.leaves(s_resumed.params)
    ):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(c))
        )
    assert int(s_resumed.step) == 2


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig(epochs=3, seed=7)
    save_config(str(tmp_path), cfg)
    cfg2 = load_config(str(tmp_path))
    assert cfg2 is not None
    assert cfg2.epochs == 3 and cfg2.seed == 7
    assert cfg2.model.enc_d_model == cfg.model.enc_d_model
    assert cfg2.model.specials.blank_id == 3
    assert cfg2.optim.betas == (0.9, 0.98)
