"""Packed-ternary inference path: export params → packed model ≈ QAT model.

The packed encoder (Pallas kernel, interpret mode on CPU) must reproduce the
fake-quant encoder's outputs to bf16-matmul tolerance, because both multiply
by exactly the same ternary weights and alpha.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.model.packed import export_packed_params

ARGS = dict(
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
    compute_dtype=jnp.float32,
    remat=False,
)


@pytest.mark.parametrize("precision", [2, 1])
def test_packed_matches_fake_quant(precision, monkeypatch):
    # interpret-mode Pallas on CPU
    from onebit_asr_tpu.ops import ternary_matmul as tm

    orig = tm.ternary_matmul_any_m
    monkeypatch.setattr(
        tm, "ternary_matmul_any_m",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    model = ConformerASR(**ARGS)
    key = jax.random.PRNGKey(0)
    B, T, F = 2, 29, 80
    feats = jax.random.normal(key, (B, T, F))
    feat_lens = jnp.array([29, 21])
    bm = precision_to_binary_mask(precision, ARGS["enc_layers"])
    variables = model.init(key, feats, feat_lens, bm)

    enc_ref, mask, ctc_ref = model.apply(variables, feats, feat_lens, bm)

    packed_params = export_packed_params(variables["params"], precision)
    pmodel = ConformerASR(**{**ARGS, "packed": True})
    enc_p, mask_p, ctc_p = pmodel.apply(
        {"params": packed_params}, feats, feat_lens, bm
    )

    valid = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(enc_p) * valid, np.asarray(enc_ref) * valid,
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(ctc_p) * valid, np.asarray(ctc_ref) * valid,
        rtol=5e-2, atol=5e-2,
    )


def test_packed_param_tree_shapes():
    model = ConformerASR(**ARGS)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (1, 29, 80))
    lens = jnp.array([29])
    bm = precision_to_binary_mask(2, ARGS["enc_layers"])
    tgt = jnp.ones((1, 4), jnp.int32)
    tv = jnp.ones((1, 4), bool)
    variables = model.init(
        key, feats, lens, tgt, tv, bm, method=model.forward_with_decoder
    )
    packed = export_packed_params(variables["params"], 2)
    blocks = packed["encoder"]["blocks"]
    w1 = blocks["ff1"]["w1"]
    assert "packed_kernel" in w1 and "kernel" not in w1
    L, K4, N = w1["packed_kernel"].shape
    assert L == ARGS["enc_layers"]
    assert K4 == ARGS["enc_d_model"] // 4 and N == ARGS["enc_d_ff"]
    assert w1["packed_kernel"].dtype == jnp.int8
    # decoder untouched
    assert "kernel" in packed["decoder"]["layer0"]["self_attn"]["q"]
