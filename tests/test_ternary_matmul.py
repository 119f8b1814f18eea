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
