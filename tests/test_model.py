"""Model tests: shapes, exact lengths, padding invariance, causality, NaN-freedom.

The padding-invariance test is the regression guard for the reference's two
documented defects (README.md:16-18): BN over padded frames and approximate
subsampled lengths made valid outputs depend on padding. Here valid outputs
must be bit-identical regardless of what sits in the padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.model.conformer import rel_shift, subsampled_length

TINY = dict(
    vocab_size=16,
    enc_d_model=32,
    enc_layers=2,
    enc_heads=2,
    enc_d_ff=64,
    enc_conv_kernel=7,
    dec_layers=1,
    dec_heads=2,
    dec_d_ff=64,
    deterministic=True,
    compute_dtype=jnp.float32,  # exact invariance checks need f32
    remat=False,
)


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    model = ConformerASR(**TINY)
    key = jax.random.PRNGKey(0)
    B, T, F = 2, 29, 80
    feats = jax.random.normal(key, (B, T, F))
    feat_lens = jnp.array([29, 21])
    tgt = jnp.ones((B, 5), jnp.int32)
    tv = jnp.ones((B, 5), bool)
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    vars_ = model.init(
        key, feats, feat_lens, tgt, tv, bm, method=model.forward_with_decoder
    )
    return model, vars_


def test_subsampled_length_exact():
    """Formula matches the actual VALID-conv output length for every T."""
    for t in range(7, 64):
        expected = ((t - 3) // 2 + 1 - 3) // 2 + 1  # two k=3 s=2 VALID convs
        got = int(subsampled_length(jnp.array([t]))[0])
        assert got == max(expected, 1), (t, got, expected)


def test_rel_shift_against_gather():
    """rel_shift(x)[b,h,t,s] must equal x[b,h,t, T-1-t+s]."""
    rng = np.random.default_rng(0)
    B, H, T = 2, 3, 5
    x = jnp.asarray(rng.standard_normal((B, H, T, 2 * T - 1)), jnp.float32)
    out = rel_shift(x)
    ref = np.empty((B, H, T, T), np.float32)
    xn = np.asarray(x)
    for t in range(T):
        for s in range(T):
            ref[:, :, t, s] = xn[:, :, t, T - 1 - t + s]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_rel_shift_padded_matches_rel_shift():
    """rel_shift_padded on [.., 2T] with a baked-in zero column 0 must be
    bit-identical to rel_shift on the unpadded [.., 2T-1] input (the hot
    XLA path bakes the pad into the position table for lane alignment)."""
    from onebit_asr_tpu.model.conformer import rel_shift_padded

    rng = np.random.default_rng(1)
    B, H, T = 2, 3, 7
    x = jnp.asarray(rng.standard_normal((B, H, T, 2 * T - 1)), jnp.float32)
    padded = jnp.concatenate([jnp.zeros((B, H, T, 1), x.dtype), x], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(rel_shift_padded(padded)), np.asarray(rel_shift(x))
    )


def test_forward_shapes(tiny_model_and_vars):
    model, vars_ = tiny_model_and_vars
    B, T, F = 2, 29, 80
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    feat_lens = jnp.array([29, 21])
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    enc, mask, ctc = model.apply(vars_, feats, feat_lens, bm)
    T_sub = int(subsampled_length(jnp.array([T]))[0])
    assert enc.shape == (B, T_sub, TINY["enc_d_model"])
    assert ctc.shape == (B, T_sub, TINY["vocab_size"])
    assert mask.shape == (B, T_sub)
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(mask, 1)), np.asarray(subsampled_length(feat_lens))
    )


def test_padding_invariance(tiny_model_and_vars):
    """Valid outputs must not depend on padding contents — the structural fix
    for the reference's BN-over-pads and length-arithmetic defects."""
    model, vars_ = tiny_model_and_vars
    B, T, F = 2, 29, 80
    key = jax.random.PRNGKey(2)
    feats = jax.random.normal(key, (B, T, F))
    feat_lens = jnp.array([29, 17])
    pad = jnp.arange(T)[None, :, None] >= feat_lens[:, None, None]
    feats_zero = jnp.where(pad, 0.0, feats)
    feats_junk = jnp.where(pad, 777.0, feats)
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    enc_a, mask, ctc_a = model.apply(vars_, feats_zero, feat_lens, bm)
    enc_b, _, ctc_b = model.apply(vars_, feats_junk, feat_lens, bm)
    valid = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(enc_a) * valid, np.asarray(enc_b) * valid, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ctc_a) * valid, np.asarray(ctc_b) * valid, rtol=1e-4, atol=1e-5
    )


def test_precision_branches_differ(tiny_model_and_vars):
    model, vars_ = tiny_model_and_vars
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 29, 80))
    feat_lens = jnp.array([29, 29])
    outs = {}
    for p in (32, 2, 1):
        bm = precision_to_binary_mask(p, TINY["enc_layers"])
        _, _, ctc = model.apply(vars_, feats, feat_lens, bm)
        outs[p] = np.asarray(ctc)
        assert np.isfinite(outs[p]).all()
    assert not np.allclose(outs[32], outs[2])
    assert not np.allclose(outs[2], outs[1])


def test_sp_mixed_precision_within_one_graph(tiny_model_and_vars):
    """Mixed per-layer 1-bit/ternary (traced bools) runs and differs from
    uniform branches — the stochastic-precision capability."""
    model, vars_ = tiny_model_and_vars
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 29, 80))
    feat_lens = jnp.array([29, 29])
    sp = jnp.array([True, False])
    _, _, ctc_sp = model.apply(vars_, feats, feat_lens, sp)
    _, _, ctc_2 = model.apply(
        vars_, feats, feat_lens, precision_to_binary_mask(2, 2)
    )
    assert np.isfinite(np.asarray(ctc_sp)).all()
    assert not np.allclose(np.asarray(ctc_sp), np.asarray(ctc_2))


def test_decoder_causality(tiny_model_and_vars):
    model, vars_ = tiny_model_and_vars
    feats = jax.random.normal(jax.random.PRNGKey(5), (1, 29, 80))
    feat_lens = jnp.array([29])
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    enc, mask, _ = model.apply(vars_, feats, feat_lens, bm)
    U = 6
    tgt_a = jnp.array([[1, 5, 6, 7, 8, 9]], jnp.int32)
    tgt_b = jnp.array([[1, 5, 6, 3, 2, 4]], jnp.int32)  # differs from pos 3 on
    tv = jnp.ones((1, U), bool)
    la = model.apply(vars_, enc, mask, tgt_a, tv, method=model.decode_logits)
    lb = model.apply(vars_, enc, mask, tgt_b, tv, method=model.decode_logits)
    np.testing.assert_allclose(
        np.asarray(la)[:, :3], np.asarray(lb)[:, :3], rtol=1e-4, atol=1e-5
    )
    assert not np.allclose(np.asarray(la)[:, 3:], np.asarray(lb)[:, 3:])


def test_all_pad_utterance_is_nan_free(tiny_model_and_vars):
    """Even a minimum-length (degenerate) utterance must produce finite
    outputs everywhere — no -inf softmax rows anywhere."""
    model, vars_ = tiny_model_and_vars
    feats = jnp.zeros((2, 29, 80))
    feat_lens = jnp.array([7, 29])  # utt 0 subsamples to a single frame
    bm = precision_to_binary_mask(1, TINY["enc_layers"])
    enc, mask, ctc = model.apply(vars_, feats, feat_lens, bm)
    assert np.isfinite(np.asarray(enc)).all()
    assert np.isfinite(np.asarray(ctc)).all()


def test_group_norm_conv_variant():
    """conv_norm='group_norm' runs, is padding-invariant, differs from BN."""
    args = dict(TINY, conv_norm="group_norm")
    model = ConformerASR(**args)
    key = jax.random.PRNGKey(0)
    B, T, F = 2, 29, 80
    feats = jax.random.normal(key, (B, T, F))
    feat_lens = jnp.array([29, 17])
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    v = model.init(key, feats, feat_lens, bm)
    pad = jnp.arange(T)[None, :, None] >= feat_lens[:, None, None]
    enc_a, mask, _ = model.apply(v, jnp.where(pad, 0.0, feats), feat_lens, bm)
    enc_b, _, _ = model.apply(v, jnp.where(pad, 55.0, feats), feat_lens, bm)
    valid = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(enc_a) * valid, np.asarray(enc_b) * valid, rtol=1e-4, atol=1e-5
    )
    assert "gn" in v["params"]["encoder"]["blocks"]["conv"]


def test_time_pad_multiple_parity():
    """Lane-aligning the subsampled time axis (time_pad_multiple) must not
    change valid-frame outputs, lengths, or the CTC loss — padded frames
    are masked everywhere by construction (model/conformer.py)."""
    from onebit_asr_tpu.losses import ctc_loss

    key = jax.random.PRNGKey(3)
    B, T, F = 2, 300, 80  # T'=74 -> pads to 128 under multiple=128
    feats = jax.random.normal(key, (B, T, F))
    feat_lens = jnp.array([300, 201])
    bm = precision_to_binary_mask(2, TINY["enc_layers"])

    model_pad = ConformerASR(**TINY, time_pad_multiple=128)
    model_ref = ConformerASR(**TINY, time_pad_multiple=1)
    v = model_pad.init(key, feats, feat_lens, bm)

    enc_p, mask_p, ctc_p = model_pad.apply(v, feats, feat_lens, bm)
    enc_r, mask_r, ctc_r = model_ref.apply(v, feats, feat_lens, bm)
    Tp, Tr = enc_p.shape[1], enc_r.shape[1]
    assert Tp == 128 and Tr == 74
    # identical valid lengths, and the pad region is all-invalid
    lens_p = np.asarray(jnp.sum(mask_p, axis=-1))
    lens_r = np.asarray(jnp.sum(mask_r, axis=-1))
    np.testing.assert_array_equal(lens_p, lens_r)
    # valid-frame outputs agree (f32; reduction order may differ slightly)
    valid = np.asarray(mask_p)[..., None]
    np.testing.assert_allclose(
        np.asarray(enc_p[:, :Tr]) * valid[:, :Tr],
        np.asarray(enc_r) * np.asarray(mask_r)[..., None],
        rtol=1e-5, atol=1e-5,
    )
    # CTC loss through either path is the same number
    tokens = jnp.array([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
    token_lens = jnp.array([3, 2], jnp.int32)
    l_p = ctc_loss(ctc_p, jnp.sum(mask_p, -1), tokens, token_lens, 3)
    l_r = ctc_loss(ctc_r, jnp.sum(mask_r, -1), tokens, token_lens, 3)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-5)


def test_time_pad_gate_leaves_small_inputs_alone():
    """T' at or below multiple/2 stays unpadded (tiny tests, toy models)."""
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, 29, 80))  # T'=6
    lens = jnp.array([29])
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    model = ConformerASR(**TINY, time_pad_multiple=128)
    v = model.init(key, feats, lens, bm)
    enc, mask, _ = model.apply(v, feats, lens, bm)
    assert enc.shape[1] == 6 and mask.shape[1] == 6


def test_fused_qkv_matches_separate_projections():
    """RelPosMHSA's fused [D,3D] QKV GEMM must equal three per-projection
    QuantDense matmuls on the SAME parameters (each quantized with its own
    alpha) — the checkpoint-layout-preserving fusion contract."""
    from onebit_asr_tpu.model.conformer import RelPosMHSA
    from onebit_asr_tpu.model.layers import rel_positional_encoding
    from onebit_asr_tpu.ops.quant import quantize_weight

    key = jax.random.PRNGKey(7)
    B, T, D, H = 2, 9, 32, 2
    x = jax.random.normal(key, (B, T, D))
    pos = jnp.asarray(rel_positional_encoding(T, D))
    key_mask = jnp.ones((B, T), bool)
    mod = RelPosMHSA(
        num_heads=H, dropout=0.0, deterministic=True,
        compute_dtype=jnp.float32,
    )
    for bits in (1, 2, 32):
        v = mod.init(key, x, pos, key_mask, bits)
        out = mod.apply(v, x, pos, key_mask, bits)
        assert out.shape == (B, T, D)
        assert np.all(np.isfinite(np.asarray(out)))
        # recompute q/k/v the unfused way from the same params
        p = v["params"]
        y = np.asarray(x)  # pre-LN input -> apply the module's LN first
        ln = p["ln"]
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        y = (y - mu) / np.sqrt(var + 1e-5)
        y = y * np.asarray(ln["scale"]) + np.asarray(ln["bias"])
        # single fused product must equal per-projection products exactly
        w_cat = np.concatenate(
            [
                np.asarray(quantize_weight(
                    jnp.asarray(p[n]["kernel"]), jnp.asarray(p[n]["alpha"]),
                    bits,
                ))
                for n in ("q_proj", "k_proj", "v_proj")
            ],
            axis=-1,
        )
        b_cat = np.concatenate(
            [np.asarray(p[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")]
        )
        fused = y @ w_cat + b_cat
        per = np.concatenate(
            [
                y @ np.asarray(quantize_weight(
                    jnp.asarray(p[n]["kernel"]), jnp.asarray(p[n]["alpha"]),
                    bits,
                )) + np.asarray(p[n]["bias"])
                for n in ("q_proj", "k_proj", "v_proj")
            ],
            axis=-1,
        )
        np.testing.assert_allclose(fused, per, rtol=1e-6, atol=1e-6)


def test_fused_qkv_param_layout_matches_quant_dense():
    """QuantParams must produce the same variable names/shapes/initial values
    as a QuantDense of the same shape at the same scope path, so checkpoints
    written before the fused-QKV change load unchanged."""
    from onebit_asr_tpu.model.layers import QuantDense, QuantParams

    key = jax.random.PRNGKey(3)
    D = 16

    class _Holder(nn.Module):
        @nn.compact
        def __call__(self, x):
            return QuantDense(D, compute_dtype=jnp.float32, name="proj")(x, 2)

    class _HolderFused(nn.Module):
        @nn.compact
        def __call__(self, x):
            w, a, b = QuantParams(D, D, name="proj")()
            return x @ w + b

    x = jnp.ones((2, D))
    v_dense = _Holder().init(key, x)
    v_fused = _HolderFused().init(key, x)
    flat_d = jax.tree_util.tree_flatten_with_path(v_dense)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(v_fused)[0]
    assert len(flat_d) == len(flat_f) == 3
    for (pd, vd), (pf, vf) in zip(flat_d, flat_f):
        assert pd == pf
        np.testing.assert_array_equal(np.asarray(vd), np.asarray(vf))

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick


def test_scan_unroll_is_math_identical():
    """Full unroll (scan_unroll=0, the default) and the one-body scan
    (scan_unroll=1) are the same math on the same parameters — unrolling
    is purely an XLA scheduling lever (round-3: 233.3 -> 289.6 utt/s)."""
    key = jax.random.PRNGKey(0)
    B, T, F = 2, 29, 80
    feats = jax.random.normal(key, (B, T, F))
    feat_lens = jnp.array([29, 21])
    bm = precision_to_binary_mask(2, TINY["enc_layers"])
    m_unrolled = ConformerASR(**TINY, scan_unroll=0)
    m_scanned = ConformerASR(**TINY, scan_unroll=1)
    v = m_unrolled.init(key, feats, feat_lens, bm)
    enc_u, mask_u, ctc_u = m_unrolled.apply(v, feats, feat_lens, bm)
    enc_s, mask_s, ctc_s = m_scanned.apply(v, feats, feat_lens, bm)
    np.testing.assert_array_equal(np.asarray(mask_u), np.asarray(mask_s))
    np.testing.assert_allclose(
        np.asarray(enc_u), np.asarray(enc_s), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ctc_u), np.asarray(ctc_s), rtol=1e-6, atol=1e-6
    )


def test_dropout_pack_bits_is_mask_identical():
    """Bit-packed saved dropout masks (layers.set_dropout_pack_bits) are a
    pure remat-storage change: same byte draws, same >=k threshold, so the
    dropped elements — and therefore the output — match the unpacked path
    exactly, including at trailing dims not divisible by 8."""
    from onebit_asr_tpu.model.layers import FastDropout, set_dropout_pack_bits

    key = jax.random.PRNGKey(7)
    for L in (256, 255, 3):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, L), jnp.float32)
        mod = FastDropout(rate=0.1, deterministic=False)
        try:
            set_dropout_pack_bits(False)
            y_ref = jax.jit(
                lambda x: mod.apply({}, x, rngs={"dropout": key})
            )(x)
            set_dropout_pack_bits(True)
            y_pack = jax.jit(
                lambda x: mod.apply({}, x, rngs={"dropout": key})
            )(x)
        finally:
            set_dropout_pack_bits(False)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_pack))
        assert float(jnp.sum(y_pack == 0)) > 0  # it does drop something


def test_subsampler_blanked_frames_have_channel_variance():
    """The root invariant behind the round-4 streaming NaN fix: an
    exactly-zero input frame (SpecAugment blank) must NOT map to a
    channel-CONSTANT row out of the subsampler at init — zero channel
    variance there turns every downstream per-frame LayerNorm into a
    rsqrt(eps) backward amplifier, which chunked attention (whose blanked
    windows are never re-diversified by non-blank keys) compounds across
    the stack into bf16 overflow. torch-default nonzero bias init
    (layers.torch_bias_init) guarantees the variance floor."""
    from onebit_asr_tpu.model.conformer import Conv2dSubsampling

    mod = Conv2dSubsampling(d_model=64, dropout=0.0, deterministic=True,
                            compute_dtype=jnp.float32)
    feats = jnp.zeros((2, 32, 80), jnp.float32)
    vars_ = mod.init(jax.random.PRNGKey(0), feats)
    out = mod.apply(vars_, feats)  # [B, T', d]
    chan_var = np.var(np.asarray(out), axis=-1)
    assert float(chan_var.min()) > 1e-4, (
        "zero-input frames map to channel-constant rows — the streaming "
        "NaN mechanism is back (check subsampler bias inits)"
    )


def test_chunked_blanked_window_grads_bounded():
    """Integration form of the same fix: full 3-branch QAT gradients of a
    chunked-causal layer_norm bf16 stack stay FINITE AND BOUNDED when
    whole attention windows are blanked (pre-fix this diverged: NaN at
    12 layers on CPU, NaN step 1-2 at Conformer-M on chip)."""
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.train.step import make_batch_loss, sample_sp_mask
    from onebit_asr_tpu.utils.config import LossConfig, OptimConfig, SpecialTokens

    L = 6
    model = ConformerASR(
        vocab_size=16, enc_d_model=32, enc_layers=L, enc_heads=2,
        enc_d_ff=64, enc_conv_kernel=7, dec_layers=1, dec_heads=2,
        dec_d_ff=64, deterministic=False, compute_dtype=jnp.bfloat16,
        remat=True, conv_norm="layer_norm", causal_conv=True,
        attn_chunk_size=2, attn_left_chunks=1,
    )
    B, T, F = 2, 64, 80
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, T, F)).astype(np.float32)
    feats[0] = 0.0        # whole utterance blanked
    feats[1, :40] = 0.0   # leading chunks blanked
    batch = {
        "feats": jnp.asarray(feats),
        "feat_lens": jnp.asarray([T, T], jnp.int32),
        "tokens": jnp.asarray(rng.integers(4, 16, (B, 5)), jnp.int32),
        "token_lens": jnp.asarray([5, 5], jnp.int32),
    }
    opt = make_optimizer(OptimConfig(warmup_steps=2), total_steps=8)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, L)
    bl = make_batch_loss(model, LossConfig(), SpecialTokens(), L)
    _, sp_key, r1, r2, r3 = jax.random.split(jax.random.PRNGKey(1), 5)
    sp = sample_sp_mask(sp_key, L, 0.2, 0.9)
    (loss, _), grads = jax.jit(jax.value_and_grad(bl, has_aux=True))(
        state.params, batch, sp, jnp.stack([r1, r2, r3])
    )
    assert np.isfinite(float(loss))
    mx = max(
        float(jnp.max(jnp.abs(g.astype(jnp.float32))))
        for g in jax.tree.leaves(grads)
    )
    assert np.isfinite(mx) and mx < 1e4, f"amplified gradients: max {mx}"
