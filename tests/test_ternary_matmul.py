"""Packed-ternary matmul: Pallas kernel (interpret mode on CPU) vs golden."""

import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.ops.ternary_matmul import (
    pack_planar,
    ternary_matmul,
    ternary_matmul_reference,
    unpack_planar,
)


def _case(seed, M=16, K=32, N=128):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((M, K)).astype(np.float32)
    q = rng.integers(-1, 2, size=(K, N)).astype(np.float32)
    alpha = np.float32(rng.uniform(0.5, 2.0))
    return jnp.asarray(x), jnp.asarray(q), jnp.asarray(alpha)


def test_planar_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-1, 2, size=(24, 128)).astype(np.float32)
    packed = pack_planar(jnp.asarray(q))
    assert packed.shape == (6, 128) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_planar(packed)), q)


@pytest.mark.parametrize("seed", [0, 1])
def test_reference_matches_dense(seed):
    x, q, alpha = _case(seed)
    packed = pack_planar(q)
    ref = ternary_matmul_reference(x, packed, alpha)
    dense = np.asarray(x.astype(jnp.bfloat16)) @ np.asarray(
        q.astype(jnp.bfloat16)
    ) * float(alpha)
    np.testing.assert_allclose(np.asarray(ref), dense, rtol=2e-2, atol=1e-2)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_kernel_matches_reference_interpret(seed):
    x, q, alpha = _case(seed, M=16, K=128, N=256)
    packed = pack_planar(q)
    ref = ternary_matmul_reference(x, packed, alpha)
    out = ternary_matmul(
        x, packed, alpha, block_m=8, block_n=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_pallas_kernel_multi_kblock_interpret():
    x, q, alpha = _case(5, M=8, K=256, N=128)
    packed = pack_planar(q)
    ref = ternary_matmul_reference(x, packed, alpha)
    out = ternary_matmul(
        x, packed, alpha, block_m=8, block_n=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


# --- W2A8: int8 activations on the integer MXU path ---


@pytest.mark.parametrize("seed", [0, 1])
def test_w2a8_kernel_bit_exact_vs_reference(seed):
    """Integer accumulation is exact: the Pallas W2A8 kernel equals the
    XLA int8 golden to the last float multiply (the integer dot carries no
    rounding; only the final f32 scale multiplies can differ by an ulp
    across fusion orders)."""
    from onebit_asr_tpu.ops.ternary_matmul import (
        ternary_matmul_w2a8,
        ternary_matmul_w2a8_reference,
    )

    x, q, alpha = _case(seed, M=16, K=128, N=256)
    packed = pack_planar(q)
    ref = ternary_matmul_w2a8_reference(x, packed, alpha)
    out = ternary_matmul_w2a8(
        x, packed, alpha, block_m=8, block_n=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_w2a8_close_to_f32_product():
    """The int8 activation rounding bounds the error: per-row relative
    error stays small on gaussian activations (the serving regime)."""
    from onebit_asr_tpu.ops.ternary_matmul import ternary_matmul_w2a8_reference

    x, q, alpha = _case(2, M=16, K=256, N=256)
    packed = pack_planar(q)
    exact = np.asarray(x) @ np.asarray(q) * float(alpha)
    w2a8 = np.asarray(ternary_matmul_w2a8_reference(x, packed, alpha))
    rms = np.sqrt(np.mean(exact**2))
    # int8 rounding noise accumulated over K, relative to the output scale
    assert np.max(np.abs(w2a8 - exact)) / rms < 0.05
    assert np.mean(np.abs(w2a8 - exact)) / rms < 0.01


def test_w2a8_packed_model_forward():
    """End-to-end: a packed checkpoint served with ONEBIT_PACKED_INT8_ACT=1
    produces logits close to the bf16 packed path (same weights, only
    activation rounding differs) and routes through the W2A8 kernel."""
    import os

    import jax

    from onebit_asr_tpu.data import DummyDataModule
    from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
    from onebit_asr_tpu.model.packed import export_packed_params
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.utils.config import OptimConfig

    kw = dict(
        vocab_size=16, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        deterministic=True, compute_dtype=jnp.float32, remat=False,
    )
    model = ConformerASR(**kw)
    dm = DummyDataModule(batch_size=4, max_frames=32, max_tokens=6, vocab_size=16)
    batch = next(dm.train_batches())
    opt = make_optimizer(OptimConfig(), total_steps=4)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, 2)
    packed_params = export_packed_params(state.params, 2)
    packed_model = ConformerASR(packed=True, **kw)
    bm = precision_to_binary_mask(2, 2)

    def fwd():
        _, _, logits = packed_model.apply(
            {"params": packed_params}, batch["feats"], batch["feat_lens"], bm
        )
        return np.asarray(logits)

    base = fwd()
    os.environ["ONEBIT_PACKED_INT8_ACT"] = "1"
    try:
        w2a8 = fwd()
    finally:
        os.environ.pop("ONEBIT_PACKED_INT8_ACT", None)
    assert not np.array_equal(base, w2a8)  # the route actually changed
    np.testing.assert_allclose(w2a8, base, rtol=0.3, atol=0.15)
