"""Optimizer and LR schedule (optax).

Parity with the reference training driver:
- `WarmupCosine`: linear warmup over `warmup_steps`, then cosine decay to
  `min_lr_ratio` x peak over the remaining steps, stepped per optimizer step
  (/root/reference/onebit_asr/train.py:32-53, 119-120).
- AdamW lr 5e-4, betas (0.9, 0.98), weight_decay 1e-2, global-norm grad clip
  5.0 (train.py:259, 117). Weight decay applies to every parameter, matching
  torch AdamW's default (the reference does not exclude norms/biases).
"""

from __future__ import annotations

import math

import optax

from onebit_asr_tpu.utils.config import OptimConfig


def warmup_cosine_schedule(
    peak_lr: float, warmup_steps: int, total_steps: int, min_lr_ratio: float = 0.1
) -> optax.Schedule:
    """lr(step) = peak * step/warmup            for step < warmup
               = floor + (1-floor)/2 * (1+cos(pi*progress)) * peak  after,
    exactly the reference's hand-rolled WarmupCosine (train.py:32-53)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        lr_warm = peak_lr * jnp.minimum(step / warm, 1.0)
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        lr_cos = peak_lr * (min_lr_ratio + (1.0 - min_lr_ratio) * cos)
        return jnp.where(step < warmup_steps, lr_warm, lr_cos)

    return schedule


def make_schedule(cfg: OptimConfig, total_steps: int) -> optax.Schedule:
    return warmup_cosine_schedule(
        cfg.lr, cfg.warmup_steps, total_steps, cfg.min_lr_ratio
    )


def make_optimizer(cfg: OptimConfig, total_steps: int) -> optax.GradientTransformation:
    schedule = make_schedule(cfg, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )
