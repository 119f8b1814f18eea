"""make_multi_train_step: K scanned steps ≡ K separate dispatches."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
from onebit_asr_tpu.train.step import make_multi_train_step, stack_batches
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens


def test_multi_step_equals_sequential_steps():
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=False, compute_dtype=jnp.float32, remat=False,
    )
    dm = DummyDataModule(batch_size=2, max_frames=32, max_tokens=6, vocab_size=16)
    optimizer = make_optimizer(OptimConfig(warmup_steps=2), total_steps=16)
    batches = list(dm.train_batches())[:3]
    state0 = create_train_state(model, optimizer, jax.random.PRNGKey(0), batches[0], 2)

    step = jax.jit(make_train_step(model, optimizer, LossConfig(), SpecialTokens(), 2))
    s = state0
    seq_losses = []
    for b in batches:
        s, aux = step(s, b)
        seq_losses.append(float(aux["loss"]))

    multi = jax.jit(
        make_multi_train_step(model, optimizer, LossConfig(), SpecialTokens(), 2)
    )
    s2, aux2 = multi(state0, stack_batches(batches))
    np.testing.assert_allclose(
        np.asarray(aux2["losses"]), seq_losses, rtol=1e-5, atol=1e-5
    )
    assert int(s2.step) == int(s.step) == 3
    # scanned vs separate programs fuse/order float math differently; the
    # optimizer trajectory agrees to ~1e-3 after 3 Adam steps
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3)
