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


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig(epochs=3, seed=7)
    save_config(str(tmp_path), cfg)
    cfg2 = load_config(str(tmp_path))
    assert cfg2 is not None
    assert cfg2.epochs == 3 and cfg2.seed == 7
    assert cfg2.model.enc_d_model == cfg.model.enc_d_model
    assert cfg2.model.specials.blank_id == 3
    assert cfg2.optim.betas == (0.9, 0.98)
