"""Fused rel-pos attention Pallas kernel vs XLA reference (interpret mode).

Forward and the custom-VJP backward (including the in-kernel log-roll
rel-shift and its adjoint, and the accumulated dp/du/dvb) must match the
straightforward XLA computation — the same math `RelPosMHSA`'s fallback
path uses. Dropout consumes precomputed uint8 draws (an operand, keep iff
byte >= round(rate*256) — FastDropout's convention), so interpret mode
covers it too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.ops.attention import (
    NEG,
    drop_threshold,
    fused_relpos_attention,
)


def _rel_shift(x):
    B, H, T, P = x.shape
    zero_pad = jnp.zeros((B, H, T, 1), dtype=x.dtype)
    x = jnp.concatenate([zero_pad, x], axis=-1)
    x = x.reshape(B, H, 2 * T, T)
    x = x[:, :, 1:, :].reshape(B, H, T, 2 * T - 1)
    return x[..., :T]


def _reference(q, k, v, p, u, vb, key_mask, scale):
    # q/k/v [B,H,T,dh]; p [H,P,dh]; u/vb [H,dh]
    f32 = lambda x: x.astype(jnp.float32)
    qu = f32(q) + f32(u)[None, :, None, :]
    qv = f32(q) + f32(vb)[None, :, None, :]
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, f32(k))
    braw = jnp.einsum("bhtd,hpd->bhtp", qv, f32(p))
    bd = _rel_shift(braw)
    s = (ac + bd) * scale
    s = jnp.where(key_mask[:, None, None, :] > 0, s, NEG)
    attn = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", attn, f32(v)).astype(v.dtype)


def _case(seed, B=2, H=2, T=24, dh=16, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, T, dh)), dtype)
    k = jnp.asarray(rng.standard_normal((B, H, T, dh)), dtype)
    v = jnp.asarray(rng.standard_normal((B, H, T, dh)), dtype)
    p = jnp.asarray(rng.standard_normal((H, 2 * T - 1, dh)), dtype)
    u = jnp.asarray(rng.standard_normal((H, dh)), dtype) * 0.1
    vb = jnp.asarray(rng.standard_normal((H, dh)), dtype) * 0.1
    lens = rng.integers(T // 2, T + 1, size=B)
    key_mask = jnp.asarray(
        (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    )
    seeds = jnp.zeros((B, H), jnp.int32)
    return q, k, v, p, u, vb, key_mask, seeds


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_reference(seed):
    q, k, v, p, u, vb, key_mask, seeds = _case(seed)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = fused_relpos_attention(q, k, v, p, u, vb, key_mask, seeds, scale, 0.0)
    ref = _reference(q, k, v, p, u, vb, key_mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    q, k, v, p, u, vb, key_mask, seeds = _case(3)
    scale = 1.0 / np.sqrt(q.shape[-1])
    w = jnp.asarray(np.random.default_rng(9).standard_normal(q.shape), jnp.float32)

    def loss_fused(q, k, v, p, u, vb):
        return jnp.sum(
            fused_relpos_attention(q, k, v, p, u, vb, key_mask, seeds, scale, 0.0) * w
        )

    def loss_ref(q, k, v, p, u, vb):
        return jnp.sum(_reference(q, k, v, p, u, vb, key_mask, scale) * w)

    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(q, k, v, p, u, vb)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(q, k, v, p, u, vb)
    for a, b, name in zip(gf, gr, ["dq", "dk", "dv", "dp", "du", "dvb"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_vmap_batches():
    """The train step vmaps the 3 QAT branches over the model apply; the
    kernel must batch correctly under vmap."""
    q, k, v, p, u, vb, key_mask, seeds = _case(5)
    scale = 1.0 / np.sqrt(q.shape[-1])
    qs = jnp.stack([q, q * 0.5, q * 2.0])

    def f(qq):
        return fused_relpos_attention(qq, k, v, p, u, vb, key_mask, seeds, scale, 0.0)

    out_v = jax.vmap(f)(qs)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out_v[i]), np.asarray(f(qs[i])), rtol=1e-5, atol=1e-5
        )


def test_vmap_gradients_match_unbatched():
    """The 3-branch train step takes grads THROUGH the vmapped kernel; the
    accumulated dp/du/dvb outputs must survive the batching rule's grid
    prepending (regression: program_id-based accumulation broke here)."""
    q, k, v, p, u, vb, key_mask, seeds = _case(6)
    scale = 1.0 / np.sqrt(q.shape[-1])
    qs = jnp.stack([q, q * 0.5, q * 1.5])
    w = jnp.asarray(np.random.default_rng(4).standard_normal(q.shape), jnp.float32)

    def loss(qq, p, u, vb):
        return jnp.sum(
            fused_relpos_attention(qq, k, v, p, u, vb, key_mask, seeds, scale, 0.0) * w
        )

    def vloss(qs, p, u, vb):
        return jnp.sum(jax.vmap(loss, in_axes=(0, None, None, None))(qs, p, u, vb))

    gv = jax.grad(vloss, argnums=(1, 2, 3))(qs, p, u, vb)
    gs = [jax.grad(loss, argnums=(1, 2, 3))(qs[i], p, u, vb) for i in range(3)]
    for j, name in enumerate(["dp", "du", "dvb"]):
        expect = sum(np.asarray(g[j]) for g in gs)
        np.testing.assert_allclose(
            np.asarray(gv[j]), expect, rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_all_pad_row_is_finite():
    """A fully-masked key row must produce finite output (uniform softmax
    over NEG-masked scores), mirroring the XLA path's no-NaN guarantee."""
    q, k, v, p, u, vb, _, seeds = _case(7)
    key_mask = jnp.zeros((q.shape[0], q.shape[2]), jnp.float32)
    out = fused_relpos_attention(q, k, v, p, u, vb, key_mask, seeds, 0.125, 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_odd_T_not_power_of_two():
    """The log-roll skew must be exact for any T, not just powers of two
    (production T = 255)."""
    q, k, v, p, u, vb, key_mask, seeds = _case(11, T=23)
    scale = 0.25
    out = fused_relpos_attention(q, k, v, p, u, vb, key_mask, seeds, scale, 0.0)
    ref = _reference(q, k, v, p, u, vb, key_mask, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def _reference_dropout(q, k, v, p, u, vb, key_mask, drop8, scale, rate):
    """XLA chain with FastDropout applied to the probs from the SAME
    uint8 draws the kernel consumes."""
    f32 = lambda x: x.astype(jnp.float32)
    qu = f32(q) + f32(u)[None, :, None, :]
    qv = f32(q) + f32(vb)[None, :, None, :]
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, f32(k))
    bd = _rel_shift(jnp.einsum("bhtd,hpd->bhtp", qv, f32(p)))
    s = (ac + bd) * scale
    s = jnp.where(key_mask[:, None, None, :] > 0, s, NEG)
    attn = jax.nn.softmax(s, axis=-1)
    k8 = drop_threshold(rate)
    attn = jnp.where(drop8 >= k8, attn * (256.0 / (256 - k8)), 0.0)
    return jnp.einsum("bhts,bhsd->bhtd", attn, f32(v)).astype(v.dtype)


def test_dropout_matches_fastdropout_semantics():
    """With dropout on, the kernel must equal the XLA chain fed the SAME
    uint8 draws — bit-identical dropout convention (keep iff byte >= k,
    exact 256/(256-k) rescale), forward and gradients."""
    q, k, v, p, u, vb, key_mask, _ = _case(13)
    B, H, T, _ = q.shape
    scale = 1.0 / np.sqrt(q.shape[-1])
    rate = 0.1
    drop8 = jnp.asarray(
        np.random.default_rng(42).integers(0, 256, size=(B, H, T, T)),
        jnp.uint8,
    )
    out = fused_relpos_attention(
        q, k, v, p, u, vb, key_mask, drop8, scale, rate
    )
    ref = _reference_dropout(q, k, v, p, u, vb, key_mask, drop8, scale, rate)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    w = jnp.asarray(
        np.random.default_rng(8).standard_normal(q.shape), jnp.float32
    )
    gf = jax.grad(
        lambda *a: jnp.sum(
            fused_relpos_attention(*a, key_mask, drop8, scale, rate) * w
        ),
        argnums=tuple(range(6)),
    )(q, k, v, p, u, vb)
    gr = jax.grad(
        lambda *a: jnp.sum(
            _reference_dropout(*a, key_mask, drop8, scale, rate) * w
        ),
        argnums=tuple(range(6)),
    )(q, k, v, p, u, vb)
    for a, b, name in zip(gf, gr, ["dq", "dk", "dv", "dp", "du", "dvb"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )
