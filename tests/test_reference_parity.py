"""Head-to-head numeric parity against the ACTUAL running torch reference.

Every test here instantiates the reference modules from /root/reference
(torch, CPU), transplants their weights into this framework via
utils/torch_import.py, runs both on identical inputs, and compares numbers.
This is the system-level proof the re-derived golden tests can't give:
nothing is re-implemented on the torch side — it's the reference's own code
executing.

Exact-parity surface (asserted to ~1e-4 in f32):
  quantizer fwd/bwd, Conv2dSubsampling, FeedForward, ConvModule (full
  lengths), MHSA content path, and the FULL encoder + CTC head at
  precision 32 / 2 / 1 with the position term zeroed.

Documented deviations (quantified here, not hand-waved):
  - position term: 2T-1 relative table vs legacy 0..T-1 shift
    (model/conformer.py docstring) — measured delta printed;
  - masked conv-norm vs BN-over-pads: OUR encoder is padding-invariant,
    the reference's is not — both properties measured.

Reference import note: /root/reference/onebit_asr has no __init__.py and
conformer.py does `from quant import QuantizedLinear` (SURVEY §0), so both
the repo root and the package dir go on sys.path.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

from onebit_asr_tpu.utils.torch_import import (  # noqa: E402
    _conv_module,
    _ff,
    _mhsa,
    import_reference_state_dict,
)

jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def ref():
    """The reference modules, imported with the documented PYTHONPATH quirk."""
    for p in (REF_ROOT, REF_ROOT + "/onebit_asr"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import conformer as ref_conformer  # the reference's own module
    import quant as ref_quant

    return ref_conformer, ref_quant


def _np_sd(module, prefix="m"):
    """state_dict as {prefix.name: numpy} for the torch_import helpers."""
    return {
        f"{prefix}.{k}": v.detach().cpu().numpy()
        for k, v in module.state_dict().items()
    }


def _zero_pos(mod):
    """Neutralize the position score term in a torch MHSA so the two
    position schemes can't differ: weight, bias AND alpha to 0. (Alpha must
    go too: binary quantization maps a zero weight to +alpha·1 via the
    sign(0)→+1 convention, quant.py:52-55 — with alpha=0 the dequantized
    weight is ~1e-8 on both sides, below test tolerance at any bitwidth.)"""
    with torch.no_grad():
        mod.pos_proj.weight.zero_()
        mod.pos_proj.alpha.zero_()
        if mod.pos_proj.bias is not None:
            mod.pos_proj.bias.zero_()


# --------------------------------------------------------------------------
# quantizer: our custom_vjp vs the reference autograd.Function itself
# --------------------------------------------------------------------------


@pytest.mark.parametrize("bitwidth", [1, 2])
def test_quantizer_forward_backward_vs_reference(ref, bitwidth):
    _, ref_quant = ref
    from onebit_asr_tpu.ops.quant import quantize_ste

    rng = np.random.default_rng(0)
    w_np = rng.standard_normal((48, 32)).astype(np.float32) * 0.2
    # include exact zeros and clip-boundary values (sign(0), |Wa|==1 edges)
    w_np[0, :4] = 0.0
    alpha = 0.11
    g_np = rng.standard_normal(w_np.shape).astype(np.float32)

    w_t = torch.tensor(w_np, requires_grad=True)
    a_t = torch.tensor(alpha, requires_grad=True)
    out_t = ref_quant.quantize_weight(w_t, a_t, bitwidth)
    out_t.backward(torch.tensor(g_np))

    def f(w, a):
        return jnp.vdot(
            quantize_ste(w, a, jnp.asarray(bitwidth == 1)), jnp.asarray(g_np)
        )

    out_j = quantize_ste(
        jnp.asarray(w_np), jnp.asarray(alpha), jnp.asarray(bitwidth == 1)
    )
    gw, ga = jax.grad(f, argnums=(0, 1))(jnp.asarray(w_np), jnp.asarray(alpha))

    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gw), w_t.grad.numpy(), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(ga), float(a_t.grad), rtol=1e-5, atol=1e-5
    )


# --------------------------------------------------------------------------
# component transplants
# --------------------------------------------------------------------------

D = 64  # small dims keep the CPU suite fast


def test_subsampler_transplant(ref):
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.conformer import Conv2dSubsampling

    torch.manual_seed(0)
    sub_t = ref_conformer.Conv2dSubsampling(idim=80, d_model=D).eval()
    sd = {
        f"encoder.subsample.{k}": v.detach().numpy()
        for k, v in sub_t.state_dict().items()
    }
    from onebit_asr_tpu.utils.torch_import import _subsample

    params = _subsample(sd, input_dim=80)

    x = np.random.default_rng(1).standard_normal((2, 37, 80)).astype(np.float32)
    with torch.no_grad():
        out_t = sub_t(torch.tensor(x)).numpy()

    sub_j = Conv2dSubsampling(
        d_model=D, dropout=0.0, deterministic=True, compute_dtype=jnp.float32
    )
    out_j = sub_j.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bits", [32, 2, 1])
def test_feedforward_transplant(ref, bits):
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.conformer import FeedForward

    torch.manual_seed(1)
    ff_t = ref_conformer.FeedForwardModule(D, 4 * D, dropout=0.1).eval()
    params = _ff(_np_sd(ff_t), "m")

    x = np.random.default_rng(2).standard_normal((2, 9, D)).astype(np.float32)
    with torch.no_grad():
        out_t = ff_t(torch.tensor(x), bitwidth=bits).numpy()

    ff_j = FeedForward(
        d_ff=4 * D, dropout=0.0, deterministic=True, compute_dtype=jnp.float32
    )
    y = ff_j.apply({"params": params}, jnp.asarray(x), bits)
    out_j = np.asarray(jnp.asarray(x) + 0.5 * y)  # macaron residual is in the block
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)


def test_conv_module_transplant_full_lengths(ref):
    """Full-length batch: masked BN stats == BN-over-all stats, and the
    dropped torch depthwise bias must be exactly cancelled by BN."""
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.conformer import ConvModule

    torch.manual_seed(2)
    conv_t = ref_conformer.ConvModule(D, kernel_size=15, dropout=0.1).eval()
    with torch.no_grad():  # make the bias-cancellation claim non-vacuous
        conv_t.dw.bias.uniform_(-0.5, 0.5)
    params = _conv_module(_np_sd(conv_t), "m")

    B, T = 3, 21
    x = np.random.default_rng(3).standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        out_t = conv_t(torch.tensor(x)).numpy()

    conv_j = ConvModule(
        kernel_size=15, dropout=0.0, deterministic=True,
        compute_dtype=jnp.float32, norm="batch_norm",
    )
    mask = jnp.ones((B, T), bool)
    y = conv_j.apply({"params": params}, jnp.asarray(x), mask)
    out_j = np.asarray(jnp.asarray(x) + y)  # residual is in the block here
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bits", [2, 1])
def test_mhsa_content_path_transplant(ref, bits):
    """pos_proj zeroed on both sides -> position scores are exactly 0 and
    the content path (QKV, pos_bias_u, softmax, AV, out_proj) must match."""
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.conformer import RelPosMHSA
    from onebit_asr_tpu.model.layers import rel_positional_encoding

    torch.manual_seed(3)
    H = 4
    mhsa_t = ref_conformer.MHSA(D, H, dropout=0.1).eval()
    _zero_pos(mhsa_t)
    params = _mhsa(_np_sd(mhsa_t), "m")

    B, T = 2, 13
    x = np.random.default_rng(4).standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        pos_t = mhsa_t  # reference takes pos_emb from the encoder's table
        pe = ref_conformer.RelPositionalEncoding(D, dropout_rate=0.0)
        _, pos_emb = pe(torch.tensor(x))
        full = torch.ones(B, T, T, dtype=torch.bool)
        out_t = mhsa_t(torch.tensor(x), full, bits, pos_emb).numpy()

    mhsa_j = RelPosMHSA(
        num_heads=H, dropout=0.0, deterministic=True, compute_dtype=jnp.float32
    )
    pos = jnp.asarray(rel_positional_encoding(T, D))
    key_mask = jnp.ones((B, T), bool)
    y = mhsa_j.apply({"params": params}, jnp.asarray(x), pos, key_mask, bits)
    out_j = np.asarray(jnp.asarray(x) + y)
    np.testing.assert_allclose(out_j, out_t, rtol=1e-4, atol=1e-4)


def test_position_term_deviation_quantified(ref):
    """With REAL pos weights the two position-score schemes differ by
    design (2T-1 relative table vs legacy 0..T-1 shift). Measure the output
    delta so the deviation is a number, not a hand-wave."""
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.conformer import RelPosMHSA
    from onebit_asr_tpu.model.layers import rel_positional_encoding

    torch.manual_seed(4)
    H = 4
    mhsa_t = ref_conformer.MHSA(D, H, dropout=0.1).eval()
    params = _mhsa(_np_sd(mhsa_t), "m")

    B, T = 2, 13
    x = np.random.default_rng(5).standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        pe = ref_conformer.RelPositionalEncoding(D, dropout_rate=0.0)
        _, pos_emb = pe(torch.tensor(x))
        full = torch.ones(B, T, T, dtype=torch.bool)
        out_t = mhsa_t(torch.tensor(x), full, 2, pos_emb).numpy()

    mhsa_j = RelPosMHSA(
        num_heads=H, dropout=0.0, deterministic=True, compute_dtype=jnp.float32
    )
    pos = jnp.asarray(rel_positional_encoding(T, D))
    out_j = np.asarray(
        jnp.asarray(x)
        + mhsa_j.apply(
            {"params": params}, jnp.asarray(x), pos,
            jnp.ones((B, T), bool), 2,
        )
    )
    rms = float(np.sqrt(np.mean((out_j - out_t) ** 2)))
    scale = float(np.sqrt(np.mean(out_t**2)))
    print(f"\nposition-term deviation: RMS delta {rms:.4f} "
          f"({100 * rms / scale:.1f}% of output RMS)")
    assert np.isfinite(rms)
    assert rms > 1e-6  # the deviation is real — if this ever becomes zero,
    # the schemes converged and the docs must change


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------


def _small_ref_model(ref_conformer, vocab=32, T_compatible=True):
    torch.manual_seed(7)
    return ref_conformer.ConformerASR(
        input_dim=80, vocab_size=vocab, enc_d_model=D, enc_layers=3,
        enc_heads=4, enc_d_ff=2 * D, enc_conv_kernel=7, enc_dropout=0.1,
        dec_layers=2, dec_heads=4, dec_d_ff=2 * D, dec_dropout=0.1,
    ).eval()


def _our_model(vocab=32, compute_dtype=jnp.float32):
    from onebit_asr_tpu.model.asr import ConformerASR

    return ConformerASR(
        input_dim=80, vocab_size=vocab, enc_d_model=D, enc_layers=3,
        enc_heads=4, enc_d_ff=2 * D, enc_conv_kernel=7, dropout=0.0,
        dec_layers=2, dec_heads=4, dec_d_ff=2 * D, deterministic=True,
        compute_dtype=compute_dtype, remat=False,
    )


@pytest.mark.parametrize("precision", [32, 2, 1])
def test_full_encoder_ctc_transplant(ref, precision):
    """Whole encoder + CTC head, position term zeroed both sides, at every
    served precision. T=19 makes the reference's approximate feat_lens//4
    equal the exact subsampled length, so masks agree too."""
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.asr import precision_to_binary_mask

    model_t = _small_ref_model(ref_conformer)
    for blk in model_t.encoder.blocks:
        _zero_pos(blk.mhsa)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = import_reference_state_dict(
        sd, input_dim=80, enc_layers=3, dec_layers=2
    )

    B, T = 2, 19  # exact ((T-1)//2-1)//2 == T//4 == 4
    x = np.random.default_rng(6).standard_normal((B, T, 80)).astype(np.float32)
    feat_lens = np.full((B,), T, np.int64)
    with torch.no_grad():
        _, _, ctc_t = model_t(
            {"feats": torch.tensor(x), "feat_lens": torch.tensor(feat_lens)},
            precision=precision,
        )

    model_j = _our_model()
    bm = precision_to_binary_mask(precision, 3)
    _, _, ctc_j = model_j.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(feat_lens, jnp.int32), bm
    )
    np.testing.assert_allclose(
        np.asarray(ctc_j), ctc_t.numpy(), rtol=1e-3, atol=1e-3
    )


def test_padding_invariance_ours_vs_reference_defect(ref):
    """OUR encoder's valid-frame outputs must be invariant to trailing
    padding (masked norms, exact lengths); the reference's are NOT
    (BN-over-pads, SURVEY bug suspect #1). Both properties measured."""
    ref_conformer, _ = ref
    from onebit_asr_tpu.model.asr import precision_to_binary_mask

    model_t = _small_ref_model(ref_conformer)
    for blk in model_t.encoder.blocks:
        _zero_pos(blk.mhsa)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = import_reference_state_dict(sd, 80, 3, 2)
    model_j = _our_model()
    bm = precision_to_binary_mask(2, 3)

    B, T_valid, T_pad = 2, 19, 43
    rng = np.random.default_rng(8)
    x = rng.standard_normal((B, T_valid, 80)).astype(np.float32)
    x_padded = np.zeros((B, T_pad, 80), np.float32)
    x_padded[:, :T_valid] = x
    lens = np.full((B,), T_valid, np.int64)

    n_valid_sub = 4  # exact subsampled length of 19
    _, _, ctc_short = model_j.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(lens, jnp.int32), bm
    )
    _, _, ctc_padded = model_j.apply(
        {"params": params}, jnp.asarray(x_padded), jnp.asarray(lens, jnp.int32), bm
    )
    ours_delta = float(
        np.max(
            np.abs(
                np.asarray(ctc_short)[:, :n_valid_sub]
                - np.asarray(ctc_padded)[:, :n_valid_sub]
            )
        )
    )

    with torch.no_grad():
        _, _, ref_short = model_t(
            {"feats": torch.tensor(x), "feat_lens": torch.tensor(lens)}, 2
        )
        _, _, ref_padded = model_t(
            {"feats": torch.tensor(x_padded), "feat_lens": torch.tensor(lens)}, 2
        )
    ref_delta = float(
        (ref_short[:, :n_valid_sub] - ref_padded[:, :n_valid_sub])
        .abs().max()
    )
    print(f"\npadding invariance: ours max|Δ| = {ours_delta:.2e}, "
          f"reference max|Δ| = {ref_delta:.2e}")
    assert ours_delta < 1e-3
    assert ref_delta > 1e-3  # the reference defect is real and measurable


def test_decoder_transplant_shapes(ref):
    """Decoder transplant is placement-analogous (pre-LN + positions differ
    by design): assert structural compatibility and finite logits."""
    ref_conformer, _ = ref
    model_t = _small_ref_model(ref_conformer)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = import_reference_state_dict(sd, 80, 3, 2)

    model_j = _our_model()
    B, T, U = 2, 19, 5
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    ref_init = model_j.init(
        jax.random.PRNGKey(0), x, lens,
        jnp.ones((B, U), jnp.int32), jnp.ones((B, U), bool), None,
        method="forward_with_decoder",
    )["params"]
    jax.tree_util.tree_map(
        lambda a, b: (np.testing.assert_array_equal(np.shape(a), np.shape(b))),
        ref_init, params,
    )
    enc, mask, _ = model_j.apply({"params": params}, x, lens, None)
    tgt = jnp.ones((B, U), jnp.int32) * 5
    logits = model_j.apply(
        {"params": params}, enc, mask, tgt, jnp.ones((B, U), bool),
        method="decode_logits",
    )
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_decoder_reference_mode_transplant_exact(ref):
    """With reference_decoder=True the decoder deviations are UNDONE
    (position-blind embeddings + post-LN stock-torch layers), so the
    stock nn.TransformerDecoder transplant becomes semantics-exact: same
    memory, same targets (incl. padding), logits agree to 1e-4 — the
    component-level proof behind the --reference_decoder toggle
    (VERDICT r4 item 5). Reference code executed: conformer.py:275-299."""
    ref_conformer, _ = ref
    model_t = _small_ref_model(ref_conformer)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = import_reference_state_dict(sd, 80, 3, 2)
    model_j = _our_model().clone(reference_decoder=True)

    B, T, U = 2, 8, 5
    rng = np.random.default_rng(11)
    memory = rng.standard_normal((B, T, D)).astype(np.float32)
    tgt = rng.integers(4, 32, size=(B, U)).astype(np.int64)
    tgt_lens = np.array([U, 3])
    pos = np.arange(U)[None, :]
    valid = pos < tgt_lens[:, None]
    tgt = np.where(valid, tgt, 0)  # pad_id = 0

    with torch.no_grad():
        logits_t = model_t.decoder(
            torch.tensor(tgt),
            torch.tensor(memory),
            torch.ones(B, T),  # memory_mask: 1 = valid (==0 → pad inside)
            torch.tensor(~valid),  # tgt_key_padding_mask: True = pad
        ).numpy()

    logits_j = np.asarray(
        model_j.apply(
            {"params": params},
            jnp.asarray(memory),
            jnp.ones((B, T), bool),
            jnp.asarray(tgt, jnp.int32),
            jnp.asarray(valid),
            method="decode_logits",
        )
    )
    # compare only valid target positions: torch attends FROM padded
    # queries too (key_padding only masks keys), but those rows never
    # reach the loss on either side
    d = np.abs(logits_t - logits_j)[valid]
    assert d.max() < 1e-4, f"reference-mode decoder mismatch: {d.max()}"


def test_reference_smoothing_formula_matches_reference_loss(ref):
    """LossConfig.reference_smoothing reproduces the reference's
    hand-rolled eps/(V-1) label-smoothed CE (losses.py:21-34) exactly on
    fully-valid targets (where its pad-mask no-op has nothing to hide)."""
    sys.path.insert(0, REF_ROOT + "/onebit_asr")
    import losses as ref_losses

    from onebit_asr_tpu.losses import att_ce_loss

    B, U, V = 3, 7, 32
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((B, U, V)).astype(np.float32)
    targets = rng.integers(4, V, size=(B, U)).astype(np.int64)

    with torch.no_grad():
        loss_t = float(
            ref_losses.att_ce_loss(
                torch.tensor(logits), torch.tensor(targets), pad_id=0,
                label_smoothing=0.1,
            )
        )
    loss_j = float(
        att_ce_loss(
            jnp.asarray(logits), jnp.asarray(targets),
            jnp.ones((B, U), bool), 0.1, reference_smoothing=True,
        )
    )
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-6)
    # and the default (torch-CE) formula deliberately differs
    loss_ours = float(
        att_ce_loss(
            jnp.asarray(logits), jnp.asarray(targets),
            jnp.ones((B, U), bool), 0.1, reference_smoothing=False,
        )
    )
    assert abs(loss_ours - loss_t) > 1e-4
