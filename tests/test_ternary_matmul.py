"""Packed-ternary matmul: Pallas kernel (interpret mode on CPU) vs golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.ops.quant import pack_ternary, unpack_ternary
from onebit_asr_tpu.ops.ternary_matmul import (
    pack_for_matmul,
    ternary_matmul,
    ternary_matmul_reference,
)


def _case(seed, M=16, K=32, N=128):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((M, K)).astype(np.float32)
    q = rng.integers(-1, 2, size=(K, N)).astype(np.float32)
    alpha = np.float32(rng.uniform(0.5, 2.0))
    return jnp.asarray(x), jnp.asarray(q), jnp.asarray(alpha)


def test_pack_roundtrip_2d():
    rng = np.random.default_rng(0)
    q = rng.integers(-1, 2, size=(24, 128)).astype(np.float32)
    packed = pack_for_matmul(jnp.asarray(q))
    assert packed.shape == (6, 128) and packed.dtype == jnp.int8
    back = np.asarray(unpack_ternary(packed.T).T)
    np.testing.assert_array_equal(back, q)


@pytest.mark.parametrize("seed", [0, 1])
def test_reference_matches_dense(seed):
    x, q, alpha = _case(seed)
    packed = pack_for_matmul(q)
    ref = ternary_matmul_reference(x, packed, alpha)
    dense = np.asarray(x.astype(jnp.bfloat16)) @ np.asarray(
        q.astype(jnp.bfloat16)
    ) * float(alpha)
    np.testing.assert_allclose(np.asarray(ref), dense, rtol=2e-2, atol=1e-2)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_kernel_matches_reference_interpret(seed):
    x, q, alpha = _case(seed, M=16, K=64, N=256)
    packed = pack_for_matmul(q)
    ref = ternary_matmul_reference(x, packed, alpha)
    out = ternary_matmul(
        x, packed, alpha, block_m=8, block_n=128, block_k=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)
