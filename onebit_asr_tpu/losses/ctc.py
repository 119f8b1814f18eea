"""CTC loss — jit-friendly log-semiring forward algorithm on device.

The reference wraps `nn.CTCLoss(blank, zero_infinity=True)`
(/root/reference/onebit_asr/losses.py:41-47), i.e. cuDNN/CPU native code.
This is a from-scratch TPU implementation: a `lax.scan` over time steps of
the standard alpha recursion in log space, fully batched, static shapes,
with a custom VJP that computes the analytic alpha-beta posterior gradient
(one reverse beta scan + a one-hot matmul) instead of letting reverse-mode
autodiff replay the alpha scan.

Semantics match the reference call site:
- per-utterance valid logit lengths (train.py:87-88) and label lengths;
- mean over batch of per-utterance negative log-likelihood — torch's
  `reduction="mean"` divides each utterance's NLL by its *label length*
  first (losses.py:44-47), which we reproduce;
- impossible alignments (T' < required frames) contribute 0, the explicit
  equivalent of `zero_infinity=True` (losses.py:45).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # log-space "zero" that survives summation without NaN


def _extended_targets(
    labels: jnp.ndarray, blank_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """labels [B,U] → z [B,S=2U+1] = blank l1 blank l2 … blank, plus the
    'can skip from s-2' mask (z[s] != blank and z[s] != z[s-2])."""
    B, U = labels.shape
    S = 2 * U + 1
    z = jnp.full((B, S), blank_id, dtype=labels.dtype)
    z = z.at[:, 1::2].set(labels)
    z_prev2 = jnp.concatenate(
        [jnp.full((B, 2), blank_id, dtype=labels.dtype), z[:, :-2]], axis=1
    )
    is_label = jnp.arange(S)[None, :] % 2 == 1
    can_skip = is_label & (z != z_prev2)
    return z, can_skip


def _emissions(logits32, z):
    """emit[b,t,s] = log_softmax(logits)[b,t,z[b,s]] for ALL (t,s) up front —
    ONE gather over the [B,T,V] logits plus a logsumexp normalizer, instead
    of a per-scan-step gather from the 5004-wide log-softmax (which kept the
    whole normalized [B,T,V] tensor + its backward live inside the loop;
    ablation on v5e measured the in-loop form at ~35% of the entire 3-branch
    train step). Also returns lse [B,T] so the backward can form
    softmax = exp(logits - lse) without a second full-vocab reduction."""
    lse = jax.scipy.special.logsumexp(logits32, axis=-1)  # [B,T]
    emit = (
        jnp.take_along_axis(logits32, z[:, None, :], axis=-1) - lse[..., None]
    )  # [B,T,S]
    return emit, lse


def _use_pallas(T: int, B: int, S: int) -> bool:
    """Route the recursions through ops/ctc_pallas on TPU: the lax.scan
    form pays T sequential loop-step dispatches for tiny [B,S] bodies; the
    Pallas kernels run the whole recursion in batch-gridded VMEM-resident
    fori_loops. The scan form remains the CPU/reference path (and the
    numerics oracle — tests pin kernel == scan) and the fallback when even
    an 8-row batch block of the [T,*,S] lattice would exceed the VMEM
    budget (ops/ctc_pallas.fits_vmem)."""
    import os

    if os.environ.get("ONEBIT_CTC_PALLAS", "1") != "1":
        return False
    if jax.default_backend() == "cpu" and not os.environ.get(
        "ONEBIT_CTC_PALLAS_FORCE_INTERPRET"
    ):
        # interpret mode is numerics-correct but slow; opt in for tests that
        # exercise the kernel path's composition (e.g. under shard_map)
        return False
    from onebit_asr_tpu.ops.ctc_pallas import fits_vmem

    return fits_vmem(T, B, S)


def pallas_available_on_backend() -> bool:
    """True when ctc_loss would route through the Pallas recursions for
    typical shapes on this backend (honoring the env-var gates)."""
    return _use_pallas(64, 8, 16)


def _alpha0_of(emit_all, label_lens):
    B, T, S = emit_all.shape
    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit_all[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lens > 0, emit_all[:, 0, 1], NEG_INF)
    )
    return alpha0


def _nll_of(alpha, label_lens):
    # final states: s = 2*label_len (trailing blank) and s = 2*label_len - 1
    end_blank = jnp.take_along_axis(alpha, (2 * label_lens)[:, None], axis=1)[:, 0]
    end_label_idx = jnp.maximum(2 * label_lens - 1, 0)[:, None]
    end_label = jnp.take_along_axis(alpha, end_label_idx, axis=1)[:, 0]
    end_label = jnp.where(label_lens > 0, end_label, NEG_INF)
    return -jnp.logaddexp(end_blank, end_label)


def _alpha_scan(emit_all, logit_lens, label_lens, can_skip):
    """Forward (alpha) recursion. Returns (alphas [T,B,S], nll [B])."""
    B, T, S = emit_all.shape
    alpha0 = _alpha0_of(emit_all, label_lens)

    if _use_pallas(T, B, S):
        from onebit_asr_tpu.ops.ctc_pallas import ctc_alpha_pallas

        alphas = ctc_alpha_pallas(
            jnp.moveaxis(emit_all, 1, 0), logit_lens, can_skip, alpha0
        )
        return alphas, _nll_of(alphas[-1], label_lens)

    neg_inf_col = jnp.full((B, 1), NEG_INF)

    def step(alpha, inp):
        t, emit = inp  # emit: [B,S], gathered outside the loop
        a_stay = alpha
        a_prev = jnp.concatenate([neg_inf_col, alpha[:, :-1]], axis=1)
        a_skip = jnp.concatenate([neg_inf_col, neg_inf_col, alpha[:, :-2]], axis=1)
        a_skip = jnp.where(can_skip, a_skip, NEG_INF)
        stacked = jnp.stack([a_stay, a_prev, a_skip], axis=0)
        merged = jax.scipy.special.logsumexp(stacked, axis=0)
        new_alpha = merged + emit
        # freeze past each utterance's final frame
        active = (t < logit_lens)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, new_alpha

    # NOTE: unroll>1 was measured SLOWER here (90 vs 106 utt/s end-to-end on
    # v5e) — the unrolled body defeats fusion across iterations; keep plain.
    alpha, alphas_rest = jax.lax.scan(
        step,
        alpha0,
        (jnp.arange(1, T), jnp.moveaxis(emit_all[:, 1:], 1, 0)),
    )
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T,B,S]
    return alphas, _nll_of(alpha, label_lens)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_neg_log_likelihood(
    logits: jnp.ndarray,  # [B, T, V] raw (pre-softmax)
    logit_lens: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, U] (no blanks; padding beyond label_lens arbitrary)
    label_lens: jnp.ndarray,  # [B]
    blank_id: int,
) -> jnp.ndarray:
    """Per-utterance -log P(labels | logits). Infeasible alignments → +inf.

    Custom VJP: the gradient is the ANALYTIC alpha-beta posterior formula
        d(-logZ)/dlogits[t,v] = softmax[t,v] - sum_{s: z_s=v} gamma_t(s),
        gamma_t(s) = exp(alpha_t(s) + beta_t(s) - logZ),
    computed with one extra reverse (beta) scan plus a one-hot matmul —
    instead of reverse-mode autodiff replaying the alpha scan (which stores
    per-step logsumexp residuals and runs a second sequential pass with the
    full VJP machinery). Golden-tested against torch CTC incl. gradients.
    """
    z, can_skip = _extended_targets(labels, blank_id)
    emit_all, _ = _emissions(logits.astype(jnp.float32), z)
    _, nll = _alpha_scan(emit_all, logit_lens, label_lens, can_skip)
    return nll


def _ctc_nll_fwd(logits, logit_lens, labels, label_lens, blank_id):
    z, can_skip = _extended_targets(labels, blank_id)
    emit_all, lse = _emissions(logits.astype(jnp.float32), z)
    alphas, nll = _alpha_scan(emit_all, logit_lens, label_lens, can_skip)
    res = (logits, lse, logit_lens, label_lens, z, can_skip, emit_all, alphas, nll)
    return nll, res


def _ctc_nll_bwd(blank_id, res, g):
    logits, lse, logit_lens, label_lens, z, can_skip, emit_all, alphas, nll = res
    B, T, V = logits.shape
    S = z.shape[1]
    logZ = -nll  # [B]; -inf (≈NEG_INF) when infeasible
    feasible = logZ > 0.5 * NEG_INF
    safe_logZ = jnp.where(feasible, logZ, 0.0)

    # beta init: indicator of the two admissible end states, per utterance
    s_idx = jnp.arange(S)[None, :]
    is_end = (s_idx == 2 * label_lens[:, None]) | (
        (s_idx == 2 * label_lens[:, None] - 1) & (label_lens[:, None] > 0)
    )
    beta_init = jnp.where(is_end, 0.0, NEG_INF)  # [B,S]

    if _use_pallas(emit_all.shape[1], B, S):
        from onebit_asr_tpu.ops.ctc_pallas import ctc_beta_pallas

        betas = ctc_beta_pallas(
            jnp.moveaxis(emit_all, 1, 0), logit_lens, can_skip, beta_init
        )
    else:
        betas = _beta_scan(emit_all, logit_lens, can_skip, beta_init)

    # posterior over lattice states; exactly sums to 1 over s for valid t
    log_gamma = alphas + betas - safe_logZ[None, :, None]  # [T,B,S]
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    t_valid = jnp.arange(T)[:, None] < logit_lens[None, :]  # [T,B]
    gamma = jnp.where(
        (t_valid & feasible[None, :])[..., None], gamma, 0.0
    ).transpose(1, 0, 2)  # [B,T,S]

    # scatter gamma onto the vocab axis via a one-hot matmul (MXU-friendly;
    # S*V is tiny next to the model matmuls)
    onehot = jax.nn.one_hot(z, V, dtype=jnp.float32)  # [B,S,V]
    scattered = jnp.einsum(
        "bts,bsv->btv", gamma, onehot, preferred_element_type=jnp.float32
    )

    # softmax from the forward's saved normalizer: exp(x - lse) is exactly
    # jax.nn.softmax (lse >= max(x), so the exp never overflows) minus the
    # second full-vocab max/sum reduction pass over [B,T,V]
    softmax = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    valid_bt = (t_valid.T & feasible[:, None])[..., None]  # [B,T,1]
    dlogits = jnp.where(valid_bt, softmax - scattered, 0.0)
    dlogits = dlogits * g[:, None, None]
    return (dlogits.astype(logits.dtype), None, None, None)


def _beta_scan(emit_all, logit_lens, can_skip, beta_init):
    """Reverse (beta) recursion, lax.scan form (CPU/reference path)."""
    B, T, S = emit_all.shape
    neg_inf_col = jnp.full((B, 1), NEG_INF)

    def step(beta_next, inp):
        # reverse scan: carry is beta_{t+1}; consume emit[t+1]; produce beta_t
        t, emit_next = inp
        y = emit_next + beta_next  # [B,S]
        y_stay = y
        y_from_next = jnp.concatenate([y[:, 1:], neg_inf_col], axis=1)
        y_from_skip = jnp.concatenate([y[:, 2:], neg_inf_col, neg_inf_col], axis=1)
        skip_ok = jnp.concatenate(
            [can_skip[:, 2:], jnp.zeros((B, 2), bool)], axis=1
        )
        y_from_skip = jnp.where(skip_ok, y_from_skip, NEG_INF)
        merged = jax.scipy.special.logsumexp(
            jnp.stack([y_stay, y_from_next, y_from_skip], axis=0), axis=0
        )
        # for t >= len-1 the carry stays at the end-state indicator, so the
        # recursion at t = len-2 sees the correct beta_{len-1}
        beta_t = jnp.where((t <= logit_lens - 2)[:, None], merged, beta_init)
        return beta_t, beta_t

    _, betas_rest = jax.lax.scan(
        step,
        beta_init,
        (jnp.arange(0, T - 1), jnp.moveaxis(emit_all[:, 1:], 1, 0)),
        reverse=True,
    )
    return jnp.concatenate([betas_rest, beta_init[None]], axis=0)  # [T,B,S]


ctc_neg_log_likelihood.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss(
    logits: jnp.ndarray,
    logit_lens: jnp.ndarray,
    labels: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank_id: int,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Batch-mean CTC loss with torch-CTCLoss 'mean' semantics
    (per-utterance NLL / label_len, then batch mean; infeasible → 0).
    `axis_name` (inside shard_map/pmap): mean over the GLOBAL batch —
    num/den psum'd over the axis, matching the GSPMD full-batch loss."""
    nll = ctc_neg_log_likelihood(logits, logit_lens, labels, label_lens, blank_id)
    # infeasible alignment (T' too short) → clamp to 0 (zero_infinity=True)
    feasible = nll < -0.5 * NEG_INF
    nll = jnp.where(feasible, nll, 0.0)
    denom = jnp.maximum(label_lens.astype(jnp.float32), 1.0)
    num = jnp.sum(nll / denom)
    den = jnp.float32(nll.shape[0])
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / den
