"""Gradient accumulation: accumulated micro-batches ≈ one full-batch step."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens


def test_grad_accum_matches_full_batch():
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=True,  # dropout off: micro-batches use distinct keys
        compute_dtype=jnp.float32, remat=False,
    )
    dm = DummyDataModule(batch_size=4, max_frames=32, max_tokens=6, vocab_size=16)
    optimizer = make_optimizer(OptimConfig(warmup_steps=1), total_steps=8)
    batch = next(dm.train_batches())
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch, 2)

    full = jax.jit(make_train_step(model, optimizer, LossConfig(), SpecialTokens(), 2))
    accum = jax.jit(
        make_train_step(
            model, optimizer, LossConfig(), SpecialTokens(), 2, grad_accum=2
        )
    )
    s1, aux1 = full(state, batch)
    s2, aux2 = accum(state, batch)
    s2, aux2b = accum(s2, batch)  # second step: warmup LR is 0 at step 0
    # CTC/CE are means over utterances; micro-means averaged == full-batch
    # mean only when micro losses are balanced — so compare loosely on loss
    # but require a working update and finite grads
    assert np.isfinite(float(aux2["loss"]))
    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=0.2)
    assert np.isfinite(float(aux2["grad_norm"]))
    # params moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s2.params))
    )
    assert moved
