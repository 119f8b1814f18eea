"""CTC Pallas recursion kernels == the lax.scan reference (interpret mode).

ops/ctc_pallas.py replaces the T-step scan dispatch with one VMEM-resident
fori_loop per recursion; these tests pin numeric identity of the full
alpha/beta lattices on random cases with variable logit/label lengths
(including repeated labels, which exercise the skip mask).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import onebit_asr_tpu.losses.ctc as ctcmod
from onebit_asr_tpu.losses.ctc import (
    NEG_INF,
    _alpha0_of,
    _beta_scan,
    _emissions,
    _extended_targets,
)
from onebit_asr_tpu.ops.ctc_pallas import ctc_alpha_pallas, ctc_beta_pallas

BLANK = 3


def _case(seed, B=3, T=20, V=11, U=6):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    logit_lens = jnp.asarray(rng.integers(U * 2 + 2, T + 1, size=B), jnp.int32)
    labels = jnp.asarray(rng.integers(4, V, size=(B, U)), jnp.int32)
    label_lens = jnp.asarray(rng.integers(1, U + 1, size=B), jnp.int32)
    z, can_skip = _extended_targets(labels, BLANK)
    emit, _ = _emissions(logits, z)
    return emit, logit_lens, labels, label_lens, can_skip


def _alpha_scan_reference(emit, logit_lens, label_lens, can_skip):
    """The lax.scan alpha path regardless of backend."""
    orig = ctcmod._use_pallas
    ctcmod._use_pallas = lambda *a: False
    try:
        return ctcmod._alpha_scan(emit, logit_lens, label_lens, can_skip)
    finally:
        ctcmod._use_pallas = orig


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_alpha_kernel_matches_scan(seed):
    emit, logit_lens, labels, label_lens, can_skip = _case(seed)
    ref_alphas, ref_nll = _alpha_scan_reference(
        emit, logit_lens, label_lens, can_skip
    )
    alpha0 = _alpha0_of(emit, label_lens)
    got = ctc_alpha_pallas(
        jnp.moveaxis(emit, 1, 0), logit_lens, can_skip, alpha0
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_alphas), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_beta_kernel_matches_scan(seed):
    emit, logit_lens, labels, label_lens, can_skip = _case(seed)
    B, T, S = emit.shape
    s_idx = jnp.arange(S)[None, :]
    is_end = (s_idx == 2 * label_lens[:, None]) | (
        (s_idx == 2 * label_lens[:, None] - 1) & (label_lens[:, None] > 0)
    )
    beta_init = jnp.where(is_end, 0.0, NEG_INF)
    ref = _beta_scan(emit, logit_lens, can_skip, beta_init)
    got = ctc_beta_pallas(
        jnp.moveaxis(emit, 1, 0), logit_lens, can_skip, beta_init
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_repeated_labels_skip_mask():
    """All-identical labels force can_skip=False on every label state."""
    B, T, V, U = 2, 16, 9, 4
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    logit_lens = jnp.full((B,), T, jnp.int32)
    labels = jnp.full((B, U), 6, jnp.int32)
    label_lens = jnp.full((B,), U, jnp.int32)
    z, can_skip = _extended_targets(labels, BLANK)
    emit, _ = _emissions(logits, z)
    ref_alphas, _ = _alpha_scan_reference(emit, logit_lens, label_lens, can_skip)
    got = ctc_alpha_pallas(
        jnp.moveaxis(emit, 1, 0), logit_lens,
        can_skip, _alpha0_of(emit, label_lens),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_alphas), rtol=1e-5, atol=1e-5
    )


def test_batch_grid_matches_ungridded(monkeypatch):
    """Shrink the VMEM budget so the kernel must grid over the batch axis
    (several 8-row blocks + ragged padding); lattices must be unchanged."""
    import onebit_asr_tpu.ops.ctc_pallas as pk

    emit, logit_lens, labels, label_lens, can_skip = _case(7, B=19, T=24, U=5)
    ref_alphas, _ = _alpha_scan_reference(emit, logit_lens, label_lens, can_skip)
    T, B, S = emit.shape[1], emit.shape[0], emit.shape[2]
    monkeypatch.setattr(pk, "VMEM_BUDGET_BYTES", pk._block_bytes(T, 8, S))
    assert pk.batch_block(T, B, S) == 8  # forces ceil(19/8)=3 grid steps
    got = ctc_alpha_pallas(
        jnp.moveaxis(emit, 1, 0), logit_lens, can_skip,
        _alpha0_of(emit, label_lens),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_alphas), rtol=1e-5, atol=1e-5
    )


def test_vmem_budget_fallback():
    """fits_vmem gates the Pallas route: an impossible lattice reports
    False (losses/ctc.py then stays on the scan path) and the kernel
    wrapper refuses it loudly."""
    from onebit_asr_tpu.ops.ctc_pallas import batch_block, fits_vmem

    assert fits_vmem(255, 64, 128)  # production shape fits via gridding
    assert batch_block(255, 64, 128) is not None
    # T*S so large that even an 8-row block exceeds the budget
    assert not fits_vmem(8192, 64, 2048)
    emit = jnp.zeros((8192, 2, 2048), jnp.float32)
    with pytest.raises(ValueError, match="VMEM budget"):
        ctc_alpha_pallas(
            emit, jnp.ones((2,), jnp.int32),
            jnp.zeros((2, 2048), bool), jnp.zeros((2, 2048)),
        )
