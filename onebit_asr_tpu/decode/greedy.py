"""Greedy CTC decoding — fully on-device, batched, static shapes.

The reference's greedy decode is a host-side Python loop per utterance
(/root/reference/onebit_asr/metrics.py:51-60). Here the whole batch decodes
in one jitted call: argmax → collapse repeats → drop blanks → left-compact
into a padded id matrix via a cumulative-position scatter. No host
round-trip until the final (tiny) id arrays are pulled for text conversion.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("blank_id",))
def greedy_ctc_decode(
    logits: jnp.ndarray,  # [B, T, V]
    logit_lens: jnp.ndarray,  # [B]
    blank_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ids [B, T] left-compacted, pad = -1; lens [B])."""
    B, T, V = logits.shape
    ids = jnp.argmax(logits, axis=-1)  # [B, T]
    prev = jnp.concatenate([jnp.full((B, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    t = jnp.arange(T)[None, :]
    keep = (ids != prev) & (ids != blank_id) & (t < logit_lens[:, None])
    # left-compact: kept id lands at (# keeps before it); everything else is
    # scattered out of bounds and dropped.
    pos = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, T)
    out = jnp.full((B, T), -1, dtype=ids.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    out = out.at[bidx, pos].set(ids, mode="drop")
    lens = jnp.sum(keep, axis=1)
    return out, lens
