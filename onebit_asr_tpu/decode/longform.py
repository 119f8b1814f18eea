"""Long-form audio inference: overlapped chunking + stitched CTC decode.

BASELINE config 4 targets "Conformer-L inference … long-form audio". Full
self-attention is O(T²) and a single jit shape per utterance length would
recompile per file; instead long recordings run through FIXED-size
overlapped windows (one compiled shape), the encoder sees each window with
full context, and the CTC logits are stitched from each window's center
region (overlap margins discarded — attention there lacks context anyway).
Greedy decode then runs over the stitched sequence on device.

This trades exactness at window seams for O(T) cost and zero recompiles;
with the default 30 s windows / 4 s overlap the seams are negligible for
CTC (frame-local posteriors).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.decode.greedy import greedy_ctc_decode
from onebit_asr_tpu.model.conformer import subsampled_length


def chunk_feats(
    feats: np.ndarray,  # [T, F] one long utterance
    chunk_frames: int,
    overlap_frames: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """[T,F] → ([n, chunk_frames, F] padded windows, [n] valid lens, hop)."""
    T, F = feats.shape
    hop = chunk_frames - overlap_frames
    if hop <= 0:
        raise ValueError("overlap must be smaller than chunk")
    n = max(1, math.ceil(max(T - overlap_frames, 1) / hop))
    out = np.zeros((n, chunk_frames, F), feats.dtype)
    lens = np.zeros((n,), np.int32)
    for i in range(n):
        s = i * hop
        piece = feats[s : s + chunk_frames]
        out[i, : len(piece)] = piece
        lens[i] = len(piece)
    return out, lens, hop


def longform_greedy_decode(
    model,
    params,
    feats: np.ndarray,  # [T, F] (post-CMVN features of one long recording)
    binary_mask,
    blank_id: int,
    chunk_frames: int = 3000,  # 30 s at 10 ms frames
    overlap_frames: int = 400,  # 4 s
) -> Tuple[np.ndarray, int]:
    """Returns (label ids, count) for one arbitrarily long recording."""
    T = feats.shape[0]
    if T <= chunk_frames:
        # short file: single exact pass
        f = jnp.asarray(feats)[None]
        _, mask, logits = model.apply(
            {"params": params}, f, jnp.asarray([T]), binary_mask
        )
        ids, lens = greedy_ctc_decode(logits, jnp.sum(mask, -1), blank_id)
        n = int(lens[0])
        return np.asarray(ids[0, :n]), n

    chunks, lens, hop = chunk_feats(feats, chunk_frames, overlap_frames)
    _, mask, logits = model.apply(
        {"params": params}, jnp.asarray(chunks), jnp.asarray(lens), binary_mask
    )  # [n, T', V]
    enc_lens = np.asarray(jnp.sum(mask, -1))
    n = chunks.shape[0]

    # stitch: window i contributes encoder frames for input range
    # [keep_lo, keep_hi) where margins of overlap/2 are dropped except at
    # the sequence ends; subsampling is 4x with the exact length formula.
    margin_in = overlap_frames // 2
    pieces = []
    for i in range(n):
        in_lo = 0 if i == 0 else margin_in
        # encoder frame index ≈ exact subsampled count of the input prefix
        lo = int(subsampled_length(jnp.asarray([in_lo]))[0]) if in_lo else 0
        hi = int(enc_lens[i]) if i == n - 1 else int(
            subsampled_length(jnp.asarray([chunk_frames - margin_in]))[0]
        )
        hi = min(hi, int(enc_lens[i]))
        pieces.append(np.asarray(logits[i, lo:hi]))
    stitched = np.concatenate(pieces, axis=0)  # [T_total', V]

    ids, out_len = greedy_ctc_decode(
        jnp.asarray(stitched)[None],
        jnp.asarray([stitched.shape[0]]),
        blank_id,
    )
    k = int(out_len[0])
    return np.asarray(ids[0, :k]), k
