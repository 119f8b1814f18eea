"""Golden tests for the STE quantizer against the reference math.

The expected values re-derive the reference semantics
(/root/reference/onebit_asr/quant.py:44-92) independently in torch so the
JAX implementation's forward AND backward (dW STE + dalpha "Eq. 3") are
checked bit-for-bit on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from onebit_asr_tpu.ops.quant import (
    ALPHA_EPS,
    pack_ternary,
    quantize_ste,
    quantize_weight,
    unpack_ternary,
)


def torch_reference_quant(w_np, alpha_np, bitwidth):
    """Reference forward/backward semantics, re-derived in torch autograd.

    forward:  clip(W/a, -1, 1) -> binary sign (0->+1) or ternary thresh 0.5;
    backward: dW = g * 1[|W/a|<=1]; da = sum(g * (-Wa + Q) if |Wa|<1 else sign(Wa)).
    (quant.py:49-91)
    """
    w = torch.tensor(w_np, dtype=torch.float32, requires_grad=False)
    alpha = torch.tensor(alpha_np, dtype=torch.float32)
    wa = w / alpha
    wac = wa.clamp(-1.0, 1.0)
    if bitwidth == 1:
        q = wac.sign()
        q[q == 0] = 1.0
    else:
        q = torch.where(wac.abs() < 0.5, torch.zeros_like(wac), wac.sign())
    w_hat = alpha * q

    g = torch.ones_like(w)  # upstream grad of ones via sum()
    grad_w = g * (wa.abs() <= 1.0).float()
    if bitwidth == 1:
        q_bwd = wa.sign()
    else:
        q_bwd = torch.where(wa.abs() >= 0.5, wa.sign(), torch.zeros_like(wa))
    term = torch.where(wa.abs() < 1.0, -wa + q_bwd, wa.sign())
    grad_alpha = (g * term).sum()
    return w_hat.numpy(), grad_w.numpy(), float(grad_alpha)


@pytest.mark.parametrize("bitwidth", [1, 2])
def test_quantize_forward_backward_golden(bitwidth):
    rng = np.random.default_rng(0)
    w_np = rng.normal(size=(16, 24)).astype(np.float32) * 0.3
    # include exact edge cases: 0, +-0.5a, +-a, beyond clip
    w_np[0, :6] = np.array([0.0, 0.05, -0.05, 0.1, -0.1, 0.35], dtype=np.float32)
    alpha_np = 0.1

    ref_what, ref_gw, ref_ga = torch_reference_quant(w_np, alpha_np, bitwidth)

    binary = jnp.asarray(bitwidth == 1)
    w = jnp.asarray(w_np)
    a = jnp.asarray(alpha_np, dtype=jnp.float32)

    what = quantize_ste(w, a, binary)
    np.testing.assert_allclose(np.asarray(what), ref_what, rtol=0, atol=1e-6)

    def loss(w_, a_):
        return jnp.sum(quantize_ste(w_, a_, binary))

    gw, ga = jax.grad(loss, argnums=(0, 1))(w, a)
    np.testing.assert_allclose(np.asarray(gw), ref_gw, rtol=0, atol=1e-6)
    np.testing.assert_allclose(float(ga), ref_ga, rtol=1e-5, atol=1e-5)


def test_binary_values_are_pm_alpha():
    w = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)), jnp.float32)
    a = jnp.float32(0.25)
    q = quantize_ste(w, a, jnp.asarray(True))
    assert set(np.unique(np.asarray(q))) <= {-0.25, 0.25}


def test_ternary_values_and_threshold():
    a = jnp.float32(1.0)
    w = jnp.asarray([-2.0, -0.51, -0.5, -0.49, 0.0, 0.49, 0.5, 0.51, 2.0])
    q = quantize_ste(w, a, jnp.asarray(False))
    np.testing.assert_array_equal(
        np.asarray(q), [-1, -1, -1, 0, 0, 0, 1, 1, 1]
    )


def test_quantize_weight_static_paths():
    w = jnp.asarray(np.random.default_rng(2).normal(size=(4, 4)), jnp.float32)
    a = jnp.float32(-0.3)  # negative alpha must be used as |alpha|+eps
    q1 = quantize_weight(w, a, 1)
    q2 = quantize_weight(w, a, 2)
    q32 = quantize_weight(w, a, 32)
    assert np.allclose(np.abs(np.asarray(q1)), 0.3 + ALPHA_EPS, atol=1e-6)
    uniq2 = np.unique(np.abs(np.asarray(q2)))
    assert all(min(abs(u - 0.0), abs(u - 0.3)) < 1e-6 for u in uniq2)
    np.testing.assert_array_equal(np.asarray(q32), np.asarray(w))


def test_dynamic_bits_matches_static():
    w = jnp.asarray(np.random.default_rng(3).normal(size=(8, 8)), jnp.float32)
    a = jnp.float32(0.2)
    for bits, flag in [(1, True), (2, False)]:
        q_static = quantize_weight(w, a, bits)
        q_dyn = quantize_weight(w, a, jnp.asarray(flag))
        np.testing.assert_allclose(np.asarray(q_static), np.asarray(q_dyn))


def test_alpha_near_zero_no_nan():
    """Scale collapse must not produce NaN/Inf anywhere (NaN-free by design)."""
    w = jnp.asarray(np.random.default_rng(4).normal(size=(32, 32)), jnp.float32)
    for a0 in [0.0, 1e-30, 1e30]:
        a = jnp.float32(a0)

        def loss(w_, a_):
            return jnp.sum(quantize_weight(w_, a_, 2) ** 2)

        val, (gw, ga) = jax.value_and_grad(loss, argnums=(0, 1))(w, a)
        for x in (val, gw, ga):
            assert np.all(np.isfinite(np.asarray(x))), f"non-finite at alpha={a0}"


def test_grad_under_jit_and_vmap():
    w = jnp.asarray(np.random.default_rng(5).normal(size=(4, 8, 8)), jnp.float32)
    a = jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float32)

    def per_layer(w_, a_):
        return jnp.sum(quantize_ste(w_, a_, jnp.asarray(False)))

    g = jax.jit(jax.grad(lambda w_, a_: jnp.sum(jax.vmap(per_layer)(w_, a_))))(w, a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(6)
    q = rng.integers(-1, 2, size=(16, 128)).astype(np.float32)
    packed = pack_ternary(jnp.asarray(q))
    assert packed.shape == (16, 32) and packed.dtype == jnp.int8
    out = unpack_ternary(packed)
    np.testing.assert_array_equal(np.asarray(out), q)


class TestPerChannelAlpha:
    """Per-channel alpha: forward broadcasting + per-column dalpha."""

    def test_forward_matches_per_column_scalar(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
        alpha = jnp.asarray([0.5, 1.0, 2.0, 0.25], jnp.float32)
        out = quantize_weight(w, alpha, 2)
        for j in range(4):
            col = quantize_weight(w[:, j : j + 1], alpha[j], 2)
            np.testing.assert_allclose(np.asarray(out[:, j : j + 1]),
                                       np.asarray(col), rtol=1e-6)

    def test_per_channel_alpha_grad_reduces_per_column(self):
        import jax, jax.numpy as jnp
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
        alpha = jnp.asarray([0.5, 1.0, 2.0, 0.25], jnp.float32)
        g = jax.grad(lambda a: jnp.sum(quantize_weight(w, a, 1) ** 2))(alpha)
        assert g.shape == (4,)
        # column j's grad must equal the scalar-alpha grad on column j alone
        for j in range(4):
            gj = jax.grad(
                lambda a: jnp.sum(quantize_weight(w[:, j : j + 1], a, 1) ** 2)
            )(alpha[j])
            np.testing.assert_allclose(float(g[j]), float(gj), rtol=1e-5)

    def test_per_channel_model_trains(self):
        import jax, jax.numpy as jnp
        from onebit_asr_tpu.model.layers import QuantDense
        m = QuantDense(8, compute_dtype=jnp.float32, per_channel=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        v = m.init(jax.random.PRNGKey(0), x, 2)
        assert v["params"]["alpha"].shape == (8,)
        g = jax.grad(
            lambda p: jnp.sum(m.apply({"params": p}, x, 2) ** 2)
        )(v["params"])
        assert np.isfinite(np.asarray(g["alpha"])).all()
        assert (np.abs(np.asarray(g["alpha"])) > 0).any()

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
