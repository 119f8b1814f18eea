"""Incremental streaming ASR session over a chunked-causal checkpoint.

Host-side driver around `model.streaming.StreamingEncoderStep`: feed feature
frames as they arrive (`accept`), get CTC tokens back incrementally, and
`finish()` drains the tail. One fixed-shape jitted step → zero recompiles
regardless of stream length; per-layer caches bound memory to
O(L · cache_chunks · cs · D) independent of how long the stream runs.

The emitted transcript equals the offline chunked-causal encoder's greedy
CTC decode of the whole recording (tests/test_streaming.py) — streaming is
a latency choice, not an accuracy compromise.

No reference counterpart (the reference evaluates full utterances offline,
/root/reference/eval.py:117-195); additive capability.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.model.layers import Dense
from onebit_asr_tpu.model.streaming import (
    StreamingEncoderStep,
    raw_window_size,
    streaming_cache_chunks,
)
from onebit_asr_tpu.utils.config import ModelConfig


def _subsampled_len_int(n: int) -> int:
    return max(((n - 1) // 2 - 1) // 2, 0)


@lru_cache(maxsize=None)
def _cached_step_fn(**fields):
    """ONE jitted chunk step per architecture config, shared across
    sessions: params are arguments (not closure), so decoding N utterances
    through N sessions compiles exactly once."""
    vocab_size = fields.pop("vocab_size")
    compute_dtype = jnp.dtype(fields.pop("compute_dtype"))
    step_mod = StreamingEncoderStep(compute_dtype=compute_dtype, **fields)
    head = Dense(vocab_size, compute_dtype=compute_dtype)

    @jax.jit
    def step_fn(enc_params, head_params, window, caches, cache_valid,
                cur_valid, bm):
        enc, new_caches = step_mod.apply(
            enc_params, window, caches, cache_valid, cur_valid, bm
        )
        logits = head.apply(head_params, enc).astype(jnp.float32)
        return logits, new_caches

    return step_fn


class StreamingSession:
    """Single-stream (B=1) incremental recognizer.

    Parameters
    ----------
    cfg : ModelConfig with `attn_chunk_size` set, `attn_left_chunks >= 0`,
        `causal_conv=True`, `conv_norm="layer_norm"` — the streaming-trained
        configuration.
    params : the trained model's param tree (same tree the offline
        `ConformerASR` uses; the decoder subtree is ignored).
    precision : 1 | 2 | 32 — served weight precision (reference convention).
    """

    def __init__(self, cfg: ModelConfig, params, precision: int = 2):
        if cfg.attn_chunk_size is None:
            raise ValueError("streaming needs cfg.attn_chunk_size")
        if cfg.attn_left_chunks < 0:
            raise ValueError("streaming needs finite cfg.attn_left_chunks")
        if not cfg.causal_conv:
            raise ValueError("streaming needs cfg.causal_conv=True")
        if cfg.conv_norm != "layer_norm":
            raise ValueError(
                "streaming needs per-frame conv_norm='layer_norm' "
                f"(got {cfg.conv_norm!r}: sequence-global statistics)"
            )
        from onebit_asr_tpu.model.asr import precision_to_binary_mask

        self.cfg = cfg
        self.cs = int(cfg.attn_chunk_size)
        self.window_raw = raw_window_size(self.cs)
        self.hop_raw = 4 * self.cs
        self.cache_chunks = streaming_cache_chunks(
            cfg.enc_conv_kernel, self.cs, cfg.attn_left_chunks
        )
        self.blank_id = cfg.specials.blank_id
        L = cfg.enc_layers
        D = cfg.enc_d_model
        self._bm = precision_to_binary_mask(precision, L)

        step_fn = _cached_step_fn(
            d_model=D,
            num_layers=L,
            num_heads=cfg.enc_heads,
            d_ff=cfg.enc_d_ff,
            conv_kernel=cfg.enc_conv_kernel,
            chunk_size=self.cs,
            left_chunks=cfg.attn_left_chunks,
            compute_dtype=cfg.compute_dtype,
            per_channel=cfg.quant_per_channel,
            vocab_size=cfg.vocab_size,
        )
        enc_params = {"params": params["encoder"]}
        head_params = {"params": params["ctc_head"]}
        self._step = lambda window, caches, cv, nv: step_fn(
            enc_params, head_params, window, caches, cv, nv, self._bm
        )

        self._caches = jnp.zeros(
            (L, 1, self.cache_chunks * self.cs, D), jnp.dtype(cfg.compute_dtype)
        )
        self._cache_valid = 0
        self._buf = np.zeros((0, cfg.input_dim), np.float32)
        self._cursor = 0  # raw index of the next window start (= 4 * j_done)
        self._j_done = 0  # subsampled frames already emitted
        self._prev_label = self.blank_id
        self._finished = False

    # ------------------------------------------------------------------ api

    def accept(self, feats: np.ndarray) -> List[int]:
        """Feed [T, F] new feature frames; returns newly decoded token ids."""
        if self._finished:
            raise RuntimeError("session already finished")
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 2 or feats.shape[1] != self.cfg.input_dim:
            raise ValueError(f"expected [T, {self.cfg.input_dim}], got {feats.shape}")
        self._buf = np.concatenate([self._buf, feats], axis=0)
        out: List[int] = []
        while len(self._buf) - self._cursor >= self.window_raw:
            window = self._buf[self._cursor : self._cursor + self.window_raw]
            out.extend(self._run_chunk(window, self.cs))
            self._cursor += self.hop_raw
        # drop consumed frames, keeping the inter-window overlap
        if self._cursor > 0:
            self._buf = self._buf[self._cursor :]
            self._cursor = 0
        return out

    def finish(self) -> List[int]:
        """Flush the partial tail chunk; the session becomes unusable."""
        if self._finished:
            return []
        self._finished = True
        tail = self._buf[self._cursor :]
        # Mirror the offline encoder's minimum-1 clamp (model/conformer.py
        # subsampled_length uses jnp.maximum(l2, 1)): a recording shorter
        # than ~7 raw frames still produces 1 encoder frame offline, so the
        # session must emit that frame too for streaming == offline.
        total_sub = max(self._j_done + _subsampled_len_int(len(tail)), 1)
        n_rem = total_sub - self._j_done
        if n_rem <= 0:
            return []
        window = np.zeros((self.window_raw, self.cfg.input_dim), np.float32)
        window[: len(tail)] = tail
        return self._run_chunk(window, n_rem)

    # ------------------------------------------------------------- internals

    def _run_chunk(self, window: np.ndarray, n_valid: int) -> List[int]:
        logits, self._caches = self._step(
            jnp.asarray(window)[None],
            self._caches,
            jnp.int32(self._cache_valid),
            jnp.int32(n_valid),
        )
        self._cache_valid = min(
            self._cache_valid + self.cs, self.cache_chunks * self.cs
        )
        self._j_done += n_valid
        labels = np.asarray(jnp.argmax(logits[0, :n_valid], axis=-1))
        out: List[int] = []
        for lab in labels.tolist():
            if lab != self.blank_id and lab != self._prev_label:
                out.append(int(lab))
            self._prev_label = lab
        return out


def streaming_greedy_decode(
    cfg: ModelConfig,
    params,
    feats: np.ndarray,  # [T, F] whole recording (post-CMVN features)
    precision: int = 2,
    feed_frames: Optional[int] = None,
) -> List[int]:
    """Convenience: run one recording through a StreamingSession in
    `feed_frames`-sized pushes (default: one chunk window at a time)."""
    sess = StreamingSession(cfg, params, precision)
    feed = feed_frames or sess.hop_raw
    out: List[int] = []
    for s in range(0, len(feats), feed):
        out.extend(sess.accept(feats[s : s + feed]))
    out.extend(sess.finish())
    return out
