"""Fused subsampler Pallas kernel vs the XLA conv reference (interpret).

conv1(3x3 s2 VALID, C_in=1) -> ReLU -> conv2(3x3 s2 VALID) -> ReLU:
forward and every gradient (dx, dW1, db1, dW2, db2) must match the
straightforward lax.conv computation — the same math the unfused
`Conv2dSubsampling` path runs. Block-looped rows (clamped last block) and
odd sizes are exercised explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.ops.subsampler import fused_subsample, out_len


def _reference(x, w1, b1, w2, b2):
    """x [B,T,F]; w1 [3,3,C]; w2 [9C, C] ((i,j)-major, C_in-minor)."""
    C = w1.shape[-1]
    y = jax.lax.conv_general_dilated(
        x[..., None], w1[:, :, None, :], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1[None, None, None, :]
    y = jnp.maximum(y, 0.0)
    y = jax.lax.conv_general_dilated(
        y, w2.reshape(3, 3, C, C), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2[None, None, None, :]
    return jnp.maximum(y, 0.0)


def _case(seed, B=2, T=43, F=17, C=8):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((9 * C, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


# T=43 -> T2=9 (single block); T=600 -> T2=148, blocked at R2=64 with a
# clamped (overlapping) final block; T=21 -> T2=4 tiny
@pytest.mark.parametrize("T", [43, 21, 600])
def test_forward_matches_convs(T):
    x, w1, b1, w2, b2 = _case(0, T=T)
    out = fused_subsample(x, w1, b1, w2, b2, jnp.float32)
    ref = _reference(x, w1, b1, w2, b2)
    assert out.shape == (x.shape[0], out_len(out_len(T)),
                         out_len(out_len(x.shape[2])), w1.shape[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T", [43, 600])
def test_gradients_match_convs(T):
    x, w1, b1, w2, b2 = _case(1, T=T)
    wsum = jnp.asarray(
        np.random.default_rng(7).standard_normal(
            (x.shape[0], out_len(out_len(T)), out_len(out_len(x.shape[2])),
             w1.shape[-1])
        ),
        jnp.float32,
    )

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(fused_subsample(x, w1, b1, w2, b2, jnp.float32) * wsum)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_reference(x, w1, b1, w2, b2) * wsum)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_model_fused_matches_unfused():
    """Same params (checkpoint-compatible layout), same encoder output —
    full ConformerASR forward with fused_subsampler on/off, f32 compute."""
    from onebit_asr_tpu.model.asr import ConformerASR
    from onebit_asr_tpu.utils.config import ModelConfig

    base = dict(
        enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        dec_layers=1, vocab_size=40, compute_dtype="float32",
    )
    m_ref = ConformerASR.from_config(ModelConfig(**base))
    m_fused = ConformerASR.from_config(
        ModelConfig(fused_subsampler=True, **base)
    )
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((2, 37, 80)), jnp.float32)
    lens = jnp.asarray([37, 20], jnp.int32)
    params = m_ref.init(jax.random.PRNGKey(0), feats, lens)["params"]
    # identical param trees: the fused path declares the same conv1/conv2
    # kernel+bias variables
    p2 = m_fused.init(jax.random.PRNGKey(0), feats, lens)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    out_r = m_ref.apply({"params": params}, feats, lens)
    out_f = m_fused.apply({"params": params}, feats, lens)
    for a, b in zip(out_r, out_f):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-4,
        )


def test_vmap_over_branches():
    """The 3-branch train step vmaps the model; the kernel must batch."""
    x, w1, b1, w2, b2 = _case(2, T=43)
    xs = jnp.stack([x, x * 0.5, x * 2.0])

    def f(xx):
        return fused_subsample(xx, w1, b1, w2, b2, jnp.float32)

    out_v = jax.vmap(f)(xs)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out_v[i]), np.asarray(f(xs[i])), rtol=1e-5, atol=1e-5
        )
