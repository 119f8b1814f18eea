"""Vectorized prefix CTC beam search — fully on-device, batched, jit-friendly.

The exact Hannun prefix-beam-search semantics of `beam.py` (which itself
fixes the reference's merge-rule defect, see beam.py docstring), re-designed
for TPU: fixed beam width W and per-frame top-K candidates, `lax.scan` over
frames, `vmap` over the batch, zero host round-trips. The reference runs a
pure-Python dict-based loop per utterance per precision
(/root/reference/onebit_asr/metrics.py:74-145) — the eval bottleneck
SURVEY §2.5 calls out.

Key insight that removes the sort/dedup a naive vectorization needs: beams
hold UNIQUE prefixes, so among the W 'stay' candidates (prefix unchanged)
and W·K 'extend' candidates (prefix + c) the only possible collisions are
extend(w, c) == stay(w') with prefix(w') = prefix(w) + c. Those are found
with a W·K × W rolling-hash match (tiny), merged in log space, and the
loser is masked out — exact merging with static shapes.

Prefixes are materialized as [W, L_max] id rows updated by scatter; dedup
identity uses two independent 32-bit rolling hashes plus length (collision
probability ~2^-64 per pair — negligible against float beam-score noise).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30

# numpy (not jnp) scalars: a module-level jnp constant would initialize the
# JAX backend at import time — before a CLI main() can re-assert the
# platform the caller asked for (utils/platform.py) — which hangs every
# `python -m onebit_asr_tpu.eval` invocation when the TPU tunnel is down
_MUL1 = np.uint32(1000003)
_MUL2 = np.uint32(2654435761)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.where(m <= NEG_INF, 0.0, m)
    out = m_safe + jnp.log1p(
        jnp.exp(jnp.minimum(a, b) - m_safe) * (jnp.minimum(a, b) > NEG_INF)
    )
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _beam_search_single(
    log_probs: jnp.ndarray,  # [T, V]
    valid_len: jnp.ndarray,  # scalar
    lm,  # DeviceLM or None
    blank_id: int,
    beam_size: int,
    top_k: int,
    max_len: int,
    lm_weight: float,
    length_bonus: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    T, V = log_probs.shape
    W, K = beam_size, top_k

    # beam state
    prefixes = jnp.full((W, max_len), -1, jnp.int32)
    plen = jnp.zeros((W,), jnp.int32)
    last = jnp.full((W,), -1, jnp.int32)
    pb = jnp.full((W,), NEG_INF).at[0].set(0.0)  # empty prefix, blank mass 1
    pnb = jnp.full((W,), NEG_INF)
    # unique hash seeds per (initially identical/dummy) beam slot prevent
    # false merges between dead slots
    h1 = jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(7919) + jnp.uint32(1)
    h2 = jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(104729) + jnp.uint32(2)
    h1 = h1.at[0].set(jnp.uint32(0))
    h2 = h2.at[0].set(jnp.uint32(0))

    def step(state, t):
        prefixes, plen, last, pb, pnb, h1, h2 = state
        lp = log_probs[t]  # [V]
        topv, topi = jax.lax.top_k(lp, K)  # [K]
        total = _logaddexp(pb, pnb)  # [W]
        lp_blank = lp[blank_id]

        # ---- stay candidates (one per beam): blank path + repeat-merge ----
        is_rep = topi[None, :] == last[:, None]  # [W, K]
        rep_lp = jnp.where(is_rep, topv[None, :], NEG_INF).max(axis=1)  # [W]
        stay_pb = total + lp_blank
        stay_pnb = pnb + rep_lp  # collapsed repeat keeps prefix (from pnb)

        # ---- extend candidates (W x K): prefix + c ----
        is_blank_c = topi == blank_id  # [K]
        # c == last extends from pb only; else from total
        src = jnp.where(is_rep, pb[:, None], total[:, None])  # [W, K]
        ext_pnb = src + topv[None, :]
        # shallow fusion: every extension gains
        # lm_weight * log P_LM(c | prefix) + length_bonus, exactly the host
        # beam's lm_bonus (beam.py) — the merged-into-stay flow below
        # inherits it through ext_pnb, as the host's slot accumulation does
        if lm is not None and lm_weight:
            ext_pnb = ext_pnb + lm_weight * lm.scores(prefixes, plen, topi)
        if length_bonus:
            ext_pnb = ext_pnb + length_bonus
        ext_pnb = jnp.where(is_blank_c[None, :], NEG_INF, ext_pnb)
        ext_pnb = jnp.where(plen[:, None] >= max_len, NEG_INF, ext_pnb)
        c32 = topi.astype(jnp.uint32) + jnp.uint32(1)
        ext_h1 = h1[:, None] * _MUL1 + c32[None, :]  # [W, K]
        ext_h2 = h2[:, None] * _MUL2 + c32[None, :]
        ext_len = plen + 1  # [W]

        # ---- merge extend(w,c) into stay(w') where prefixes match ----
        m = (
            (ext_h1[:, :, None] == h1[None, None, :])
            & (ext_h2[:, :, None] == h2[None, None, :])
            & (ext_len[:, None, None] == plen[None, None, :])
        )  # [W, K, W]
        # mass flowing into each stay beam w'
        inflow = jnp.where(m, ext_pnb[:, :, None], NEG_INF)  # [W,K,W]
        stay_extra = _reduce_logaddexp(inflow.reshape(-1, W))
        stay_pnb = _logaddexp(stay_pnb, stay_extra)
        # matched extend candidates die
        ext_pnb = jnp.where(m.any(axis=2), NEG_INF, ext_pnb)

        # ---- select top W among W stay + W*K extend ----
        stay_score = _logaddexp(stay_pb, stay_pnb)  # [W]
        ext_score = ext_pnb.reshape(-1)  # [W*K]
        scores = jnp.concatenate([stay_score, ext_score])
        _, sel = jax.lax.top_k(scores, W)  # indices into [W + W*K]
        is_stay = sel < W
        w_stay = jnp.clip(sel, 0, W - 1)
        e = jnp.clip(sel - W, 0, W * K - 1)
        w_ext, k_ext = e // K, e % K

        parent = jnp.where(is_stay, w_stay, w_ext)  # [W]
        new_prefixes = prefixes[parent]
        new_plen = jnp.where(is_stay, plen[w_stay], plen[w_ext] + 1)
        new_last = jnp.where(is_stay, last[w_stay], topi[k_ext])
        new_pb = jnp.where(is_stay, stay_pb[w_stay], NEG_INF)
        new_pnb = jnp.where(is_stay, stay_pnb[w_stay], ext_pnb[w_ext, k_ext])
        new_h1 = jnp.where(is_stay, h1[w_stay], ext_h1[w_ext, k_ext])
        new_h2 = jnp.where(is_stay, h2[w_stay], ext_h2[w_ext, k_ext])
        # write the new char for extended beams
        write_pos = jnp.clip(plen[w_ext], 0, max_len - 1)
        updated = new_prefixes.at[jnp.arange(W), write_pos].set(
            jnp.where(is_stay, new_prefixes[jnp.arange(W), write_pos], topi[k_ext])
        )
        new_prefixes = updated

        new_state = (new_prefixes, new_plen, new_last, new_pb, new_pnb, new_h1, new_h2)
        # freeze past the utterance's end
        active = t < valid_len
        merged = jax.tree.map(
            lambda n, o: jnp.where(
                jnp.reshape(active, (1,) * n.ndim), n, o
            ),
            new_state,
            state,
        )
        return merged, None

    state = (prefixes, plen, last, pb, pnb, h1, h2)
    state, _ = jax.lax.scan(step, state, jnp.arange(T))
    prefixes, plen, last, pb, pnb, h1, h2 = state
    best = jnp.argmax(_logaddexp(pb, pnb))
    ids = prefixes[best]
    n = plen[best]
    ids = jnp.where(jnp.arange(max_len) < n, ids, -1)
    return ids, n


def _reduce_logaddexp(x: jnp.ndarray) -> jnp.ndarray:
    """logaddexp-reduce axis 0 of [N, W] with NEG_INF identity."""
    m = jnp.max(x, axis=0)
    m_safe = jnp.where(m <= NEG_INF, 0.0, m)
    s = jnp.sum(jnp.exp(x - m_safe[None, :]) * (x > NEG_INF), axis=0)
    return jnp.where(m <= NEG_INF, NEG_INF, m_safe + jnp.log(jnp.maximum(s, 1e-37)))


@partial(
    jax.jit,
    static_argnames=(
        "blank_id", "beam_size", "top_k", "max_len", "lm_weight",
        "length_bonus",
    ),
)
def beam_search_device(
    log_probs: jnp.ndarray,  # [B, T, V] log-softmax
    valid_lens: jnp.ndarray,  # [B]
    blank_id: int = 3,
    beam_size: int = 10,
    top_k: int = 20,
    max_len: int = 256,
    lm=None,  # decode/lm_device.DeviceLM (packed n-gram tables)
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched on-device prefix beam search, optionally LM-fused.

    Returns (ids [B, max_len] with -1 padding, lens [B])."""
    f = partial(
        _beam_search_single,
        lm=lm if lm_weight else None,
        blank_id=blank_id,
        beam_size=beam_size,
        top_k=min(top_k, log_probs.shape[-1]),  # clamp to vocab
        max_len=max_len,
        lm_weight=lm_weight,
        length_bonus=length_bonus,
    )
    return jax.vmap(f)(log_probs, valid_lens)
