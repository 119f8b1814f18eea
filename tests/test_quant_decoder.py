"""Quantized AED decoder option (ModelConfig.quant_decoder).

The reference keeps the decoder fully fp (conformer.py:275-299); this
additive option runs the decoder's q/k/v/o + ff projections through
QuantDense at each branch's BASE precision (fp32 branch → raw weights,
1-bit branch → binary, 2-bit/stochastic branches → ternary), one parameter
set for all precisions — the same convention as the encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.data import DummyDataModule
from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens

KW = dict(
    vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
    enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
    deterministic=True, compute_dtype=jnp.float32, remat=False,
)


def _setup(model):
    dm = DummyDataModule(batch_size=4, max_frames=32, max_tokens=6, vocab_size=16)
    batch = next(dm.train_batches())
    opt = make_optimizer(OptimConfig(warmup_steps=2), total_steps=8)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, 2)
    return dm, batch, opt, state


def test_decoder_precision_changes_logits():
    """With quant_decoder on, the decoder output differs per branch
    precision (binary vs ternary vs fp) under ONE parameter set."""
    model = ConformerASR(quant_decoder=True, **KW)
    _, batch, _, state = _setup(model)

    def dec_logits(precision):
        bm = precision_to_binary_mask(precision, 2)
        _, _, _, dl = model.apply(
            {"params": state.params},
            batch["feats"], batch["feat_lens"],
            batch["tokens"], batch["tokens"] > 0, bm,
            method=model.forward_with_decoder,
        )
        return np.asarray(dl)

    d32, d2, d1 = dec_logits(32), dec_logits(2), dec_logits(1)
    assert np.isfinite(d32).all() and np.isfinite(d2).all()
    assert not np.allclose(d32, d2)
    assert not np.allclose(d2, d1)


def test_quant_decoder_train_step():
    """The 3-branch QAT step trains the quantized decoder: finite loss,
    decoder alphas exist and receive updates."""
    model = ConformerASR(quant_decoder=True, **KW)
    _, batch, opt, state = _setup(model)
    step = jax.jit(make_train_step(model, opt, LossConfig(), SpecialTokens(), 2))
    s1, aux1 = step(state, batch)
    s2, aux2 = step(s1, batch)
    assert np.isfinite(float(aux1["loss"])) and np.isfinite(float(aux2["loss"]))
    dec = s2.params["decoder"]["layer0"]
    assert "alpha" in dec["self_attn"]["q"]
    # warmup LR is 0 at step 0; by step 2 the decoder weights have moved
    before = state.params["decoder"]["layer0"]["self_attn"]["q"]["kernel"]
    after = dec["self_attn"]["q"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_quant_decoder_packed_export_parity():
    """Packed 2-bit serving of a quant_decoder checkpoint reproduces the
    fake-quant forward (decoder weights pack like encoder weights)."""
    from onebit_asr_tpu.model.packed import export_packed_params

    model = ConformerASR(quant_decoder=True, **KW)
    _, batch, _, state = _setup(model)
    bm = precision_to_binary_mask(2, 2)

    def fwd(m, params):
        _, _, _, dl = m.apply(
            {"params": params},
            batch["feats"], batch["feat_lens"],
            batch["tokens"], batch["tokens"] > 0, bm,
            method=m.forward_with_decoder,
        )
        return np.asarray(dl)

    fq = fwd(model, state.params)
    packed_model = ConformerASR(quant_decoder=True, packed=True, **KW)
    pk = fwd(packed_model, export_packed_params(state.params, 2))
    # same tolerance as the encoder packed test: the ternary matmul kernel
    # accumulates the unpacked {-1,0,1} operand in bf16
    np.testing.assert_allclose(fq, pk, rtol=5e-2, atol=5e-2)
