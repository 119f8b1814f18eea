"""Golden tests for losses: CTC vs torch.nn.CTCLoss, CE/KL vs torch math.

The reference delegates all three to torch natives
(/root/reference/onebit_asr/losses.py:11-59); our from-scratch JAX versions
must match those semantics numerically (modulo the documented fix that CE is
masked before reduction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from onebit_asr_tpu.losses import att_ce_loss, ctc_loss, kl_logits, make_att_targets
from onebit_asr_tpu.losses.ctc import ctc_neg_log_likelihood
from onebit_asr_tpu.utils.config import SpecialTokens

SPECIALS = SpecialTokens()
BLANK = SPECIALS.blank_id


def _rand_ctc_case(seed, B=3, T=20, V=11, U=6):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_lens = rng.integers(U * 2 + 2, T + 1, size=B).astype(np.int32)
    labels = rng.integers(4, V, size=(B, U)).astype(np.int32)
    label_lens = rng.integers(1, U + 1, size=B).astype(np.int32)
    return logits, logit_lens, labels, label_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_nll_matches_torch(seed):
    logits, logit_lens, labels, label_lens = _rand_ctc_case(seed)
    nll = ctc_neg_log_likelihood(
        jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), BLANK,
    )
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)  # [T,B,V]
    ref = tF.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=BLANK, reduction="none",
        zero_infinity=False,
    )
    np.testing.assert_allclose(np.asarray(nll), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ctc_loss_mean_semantics():
    logits, logit_lens, labels, label_lens = _rand_ctc_case(7)
    ours = ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), BLANK,
    )
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    ref = tF.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=BLANK, reduction="mean",
        zero_infinity=True,
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4, atol=1e-4)


def test_ctc_infeasible_is_zero_not_nan():
    """T' shorter than needed for the labels → 0 loss (zero_infinity), no NaN."""
    B, T, V, U = 2, 4, 8, 4
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    # U distinct labels need >= U frames; force len 2 < 4 for utt 0
    loss = ctc_loss(
        logits, jnp.array([2, 4]), jnp.full((B, U), 5, jnp.int32),
        jnp.array([4, 1]), BLANK,
    )
    assert np.isfinite(float(loss))


def test_ctc_gradients_finite_and_match_torch():
    logits, logit_lens, labels, label_lens = _rand_ctc_case(3)
    f = lambda lg: ctc_loss(
        lg, jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), BLANK,
    )
    g = jax.grad(f)(jnp.asarray(logits))
    t = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(t, dim=-1).transpose(0, 1)
    ref = tF.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=BLANK, reduction="mean",
        zero_infinity=True,
    )
    ref.backward()
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), t.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_gradients_infeasible_utterance_zero_not_nan():
    """Custom-VJP backward: an infeasible utterance contributes zero gradient
    (zero_infinity semantics) and never NaN; the feasible one matches torch."""
    B, T, V, U = 2, 4, 8, 4
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_lens = np.array([2, 4], np.int32)  # utt 0: 2 frames < 4 labels
    labels = np.full((B, U), 5, np.int32)
    label_lens = np.array([4, 1], np.int32)
    f = lambda lg: ctc_loss(
        lg, jnp.asarray(logit_lens), jnp.asarray(labels),
        jnp.asarray(label_lens), BLANK,
    )
    g = jax.grad(f)(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g[0]), 0.0, atol=0)
    t = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(t, dim=-1).transpose(0, 1)
    ref = tF.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=BLANK, reduction="mean",
        zero_infinity=True,
    )
    ref.backward()
    np.testing.assert_allclose(
        np.asarray(g[1]), t.grad.numpy()[1], rtol=1e-3, atol=1e-4
    )


def test_att_ce_matches_torch_on_valid_positions():
    rng = np.random.default_rng(5)
    B, U, V = 4, 7, 13
    logits = rng.standard_normal((B, U, V)).astype(np.float32)
    targets = rng.integers(0, V, size=(B, U)).astype(np.int32)
    valid = np.arange(U)[None, :] < rng.integers(2, U + 1, size=(B, 1))
    ours = att_ce_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid), 0.1
    )
    lt = torch.tensor(logits).reshape(-1, V)
    tt = torch.tensor(targets.astype(np.int64)).reshape(-1)
    per_pos = tF.cross_entropy(lt, tt, label_smoothing=0.1, reduction="none")
    ref = (per_pos * torch.tensor(valid.reshape(-1), dtype=torch.float32)).sum() / valid.sum()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-5)


def test_kl_matches_torch():
    rng = np.random.default_rng(6)
    B, U, V = 3, 5, 9
    t_logits = rng.standard_normal((B, U, V)).astype(np.float32)
    s_logits = rng.standard_normal((B, U, V)).astype(np.float32)
    valid = np.ones((B, U), bool)
    valid[1, 3:] = False
    ours = kl_logits(jnp.asarray(t_logits), jnp.asarray(s_logits), jnp.asarray(valid))
    pt = torch.log_softmax(torch.tensor(t_logits), -1)
    ps = torch.log_softmax(torch.tensor(s_logits), -1)
    kl = (pt.exp() * (pt - ps)).sum(-1)
    ref = (kl * torch.tensor(valid, dtype=torch.float32)).sum() / valid.sum()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-5)


def test_kl_teacher_gets_no_gradient():
    rng = np.random.default_rng(8)
    t = jnp.asarray(rng.standard_normal((2, 3, 5)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 3, 5)), jnp.float32)
    valid = jnp.ones((2, 3), bool)
    gt = jax.grad(lambda x: kl_logits(x, s, valid))(t)
    gs = jax.grad(lambda x: kl_logits(t, x, valid))(s)
    assert float(jnp.abs(gt).sum()) == 0.0
    assert float(jnp.abs(gs).sum()) > 0.0


def test_make_att_targets():
    tokens = jnp.array([[5, 6, 7, 0], [8, 0, 0, 0]], jnp.int32)
    lens = jnp.array([3, 1])
    tgt_inp, tgt_out, valid = make_att_targets(tokens, lens, SPECIALS)
    np.testing.assert_array_equal(
        np.asarray(tgt_inp), [[1, 5, 6, 7, 0], [1, 8, 0, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(tgt_out), [[5, 6, 7, 2, 0], [8, 2, 0, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(valid),
        [[True, True, True, True, False], [True, True, False, False, False]],
    )

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
