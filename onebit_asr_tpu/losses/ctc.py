"""CTC loss — jit-friendly log-semiring forward algorithm on device.

The reference wraps `nn.CTCLoss(blank, zero_infinity=True)`
(/root/reference/onebit_asr/losses.py:41-47), i.e. cuDNN/CPU native code.
This is a from-scratch TPU implementation: a `lax.scan` over time steps of
the standard alpha recursion in log space, fully batched, static shapes,
differentiable through `logsumexp` (XLA derives the backward pass — no
custom kernel needed since the scan body is a handful of fused VPU ops).

Semantics match the reference call site:
- per-utterance valid logit lengths (train.py:87-88) and label lengths;
- mean over batch of per-utterance negative log-likelihood — torch's
  `reduction="mean"` divides each utterance's NLL by its *label length*
  first (losses.py:44-47), which we reproduce;
- impossible alignments (T' < required frames) contribute 0, the explicit
  equivalent of `zero_infinity=True` (losses.py:45).
"""

from __future__ import annotations

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


def ctc_neg_log_likelihood(
    logits: jnp.ndarray,  # [B, T, V] raw (pre-softmax)
    logit_lens: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, U] (no blanks; padding beyond label_lens arbitrary)
    label_lens: jnp.ndarray,  # [B]
    blank_id: int,
) -> jnp.ndarray:
    """Per-utterance -log P(labels | logits). Infeasible alignments → +inf."""
    B, T, V = logits.shape
    z, can_skip = _extended_targets(labels, blank_id)
    S = z.shape[1]

    # Emission log-probs for ALL (t, s) up front — ONE gather over the
    # [B,T,V] logits plus a logsumexp normalizer, instead of a per-scan-step
    # gather from the 5004-wide log-softmax (which kept the whole normalized
    # [B,T,V] tensor + its backward live inside the loop; ablation on v5e
    # measured the in-loop form at ~35% of the entire 3-branch train step).
    # emit[b,t,s] = logits[b,t,z[b,s]] - logsumexp_v(logits[b,t,:]).
    logits32 = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits32, axis=-1)  # [B,T]
    emit_all = (
        jnp.take_along_axis(logits32, z[:, None, :], axis=-1) - lse[..., None]
    )  # [B,T,S]

    # alpha_0: state 0 (blank) and state 1 (first label) reachable
    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit_all[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lens > 0, emit_all[:, 0, 1], NEG_INF)
    )

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
        return jnp.where(active, new_alpha, alpha), None

    # NOTE: unroll>1 was measured SLOWER here (90 vs 106 utt/s end-to-end on
    # v5e) — the unrolled body defeats fusion across iterations; keep plain.
    alpha, _ = jax.lax.scan(
        step,
        alpha0,
        (jnp.arange(1, T), jnp.moveaxis(emit_all[:, 1:], 1, 0)),
    )

    # final states: s = 2*label_len (trailing blank) and s = 2*label_len - 1
    end_blank = jnp.take_along_axis(alpha, (2 * label_lens)[:, None], axis=1)[:, 0]
    end_label_idx = jnp.maximum(2 * label_lens - 1, 0)[:, None]
    end_label = jnp.take_along_axis(alpha, end_label_idx, axis=1)[:, 0]
    end_label = jnp.where(label_lens > 0, end_label, NEG_INF)
    total = jnp.logaddexp(end_blank, end_label)
    return -total


def ctc_loss(
    logits: jnp.ndarray,
    logit_lens: jnp.ndarray,
    labels: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Batch-mean CTC loss with torch-CTCLoss 'mean' semantics
    (per-utterance NLL / label_len, then batch mean; infeasible → 0)."""
    nll = ctc_neg_log_likelihood(logits, logit_lens, labels, label_lens, blank_id)
    # infeasible alignment (T' too short) → clamp to 0 (zero_infinity=True)
    feasible = nll < -0.5 * NEG_INF
    nll = jnp.where(feasible, nll, 0.0)
    denom = jnp.maximum(label_lens.astype(jnp.float32), 1.0)
    return jnp.mean(nll / denom)
