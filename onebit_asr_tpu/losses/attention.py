"""Attention-branch losses: target prep, label-smoothed CE, KL distillation.

Counterparts of /root/reference/onebit_asr/losses.py:11-59 with one
deliberate fix: the reference's smoothed CE averages over ALL positions
including padding — its pad-mask multiply lands on an already-reduced scalar
and is a no-op (losses.py:32-35, flagged in SURVEY §2.4). Here every loss is
masked *before* reduction, so padding never contributes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from onebit_asr_tpu.utils.config import SpecialTokens


def make_att_targets(
    tokens: jnp.ndarray,  # [B, U] pad-padded label ids
    token_lens: jnp.ndarray,  # [B]
    specials: SpecialTokens,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build decoder inputs/targets (reference losses.py:11-19).

    Returns (tgt_inp [B,U+1] = BOS + tokens, tgt_out [B,U+1] = tokens + EOS,
    valid [B,U+1] bool over the first token_lens+1 positions). Static shapes;
    EOS is scattered at position token_lens per utterance.
    """
    B, U = tokens.shape
    pad = jnp.full((B, 1), specials.pad_id, dtype=tokens.dtype)
    bos = jnp.full((B, 1), specials.bos_id, dtype=tokens.dtype)
    tgt_inp = jnp.concatenate([bos, tokens], axis=1)  # [B, U+1]

    tgt_out = jnp.concatenate([tokens, pad], axis=1)  # [B, U+1]
    pos = jnp.arange(U + 1)[None, :]
    at_eos = pos == token_lens[:, None]
    tgt_out = jnp.where(at_eos, specials.eos_id, tgt_out)

    valid = pos <= token_lens[:, None]  # tokens plus the EOS slot
    tgt_inp = jnp.where(valid, tgt_inp, specials.pad_id)
    tgt_out = jnp.where(valid, tgt_out, specials.pad_id)
    return tgt_inp, tgt_out, valid


def att_ce_loss(
    logits: jnp.ndarray,  # [B, U, V] float32
    targets: jnp.ndarray,  # [B, U] int
    valid: jnp.ndarray,  # [B, U] bool
    label_smoothing: float = 0.1,
    axis_name: str | None = None,
    reference_smoothing: bool = False,
) -> jnp.ndarray:
    """Label-smoothed cross-entropy, mean over VALID positions only.

    torch semantics (reference call sites train.py:86,94,105): target
    distribution = (1-ls)·onehot + ls/V·uniform.

    `reference_smoothing=True` uses the reference's own hand-rolled
    formula instead (losses.py:27-31): true_dist filled with ls/(V-1)
    then the target entry REPLACED by 1-ls — i.e. the target class gets
    exactly 1-ls and each of the other V-1 classes ls/(V-1). The masked
    mean (our pad fix) is kept in both modes; only the distribution
    differs. This is the loss half of the --reference_decoder toggle.

    `axis_name` (inside shard_map/pmap): numerator and valid-count are
    psum'd over that axis so the mean is over the GLOBAL batch's valid
    positions — bitwise the loss the GSPMD step computes on the full batch
    (a pmean of per-shard masked means would weight shards equally
    regardless of their token counts).
    """
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if reference_smoothing:
        # -sum(true_dist * logp): (1-ls)*nll + ls/(V-1)*(sum(-logp) - nll)
        sum_neg = -jnp.sum(logp, axis=-1)
        loss = (1.0 - label_smoothing) * nll + (
            label_smoothing / (V - 1)
        ) * (sum_neg - nll)
    else:
        smooth = -jnp.mean(logp, axis=-1)  # uniform, ls/V each of V
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    m = valid.astype(jnp.float32)
    num, den = jnp.sum(loss * m), jnp.sum(m)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def kl_logits(
    teacher_logits: jnp.ndarray,  # [B, U, V]
    student_logits: jnp.ndarray,  # [B, U, V]
    valid: jnp.ndarray,  # [B, U] bool
    axis_name: str | None = None,
) -> jnp.ndarray:
    """KL(stop_grad(teacher) ‖ student), mean over valid positions
    (reference losses.py:50-59; teacher detached at train.py:99,109).
    `axis_name`: global-batch mean under shard_map — see att_ce_loss."""
    pt_log = jax.nn.log_softmax(
        jax.lax.stop_gradient(teacher_logits.astype(jnp.float32)), axis=-1
    )
    ps_log = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    kl = jnp.sum(jnp.exp(pt_log) * (pt_log - ps_log), axis=-1)  # [B, U]
    m = valid.astype(jnp.float32)
    num, den = jnp.sum(kl * m), jnp.sum(m)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)
