"""evaluate_stream: multi-precision metrics over the fake backend."""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.eval import evaluate_stream
from onebit_asr_tpu.model.asr import ConformerASR
from onebit_asr_tpu.train import create_train_state, make_optimizer
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens


def test_evaluate_stream_reports_all_metrics():
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=True, compute_dtype=jnp.float32, remat=False,
    )
    dm = DummyDataModule(batch_size=2, max_frames=32, max_tokens=6, vocab_size=16)
    optimizer = make_optimizer(OptimConfig(), total_steps=4)
    batch = next(dm.train_batches())
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch, 2)

    m = evaluate_stream(
        model, state.params, dm.valid_batches(), LossConfig(), SpecialTokens(),
        2, precisions=(2, 1), max_batches=2,
    )
    for tag in ("2bit", "1bit"):
        assert np.isfinite(m[f"loss_{tag}"])
        assert 0.0 <= m[f"wer_{tag}"] <= 1.5
        assert 0.0 <= m[f"cer_{tag}"] <= 1.5
    assert m["eval_batches"] == 2 and m["eval_utts"] == 4

    # beam path (device) agrees in structure
    mb = evaluate_stream(
        model, state.params, dm.valid_batches(), LossConfig(), SpecialTokens(),
        2, precisions=(2,), max_batches=1, use_beam=True, beam_size=4,
    )
    assert np.isfinite(mb["loss_2bit"])
