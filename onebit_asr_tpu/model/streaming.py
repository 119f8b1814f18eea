"""Streaming (incremental) encoder step — consumes the OFFLINE param tree.

A model trained with the U2-style chunked-causal encoder options
(`ModelConfig.attn_chunk_size=cs, attn_left_chunks=l, causal_conv=True,
conv_norm="layer_norm"`) can be served incrementally: each step consumes the
raw feature window of ONE chunk plus per-layer activation caches, and emits
that chunk's encoder output — numerically identical to the offline encoder's
output for the same frames (tests/test_streaming.py proves it).

Why this is exact:
- attention for a frame in chunk c covers chunks [c-l .. c]; the step's
  window holds exactly those frames (the cache keeps each layer's INPUT
  frames; a layer's output for frame t was computed when t's chunk was
  current, with its full allowed context, and then flowed to the next
  layer's cache);
- a current frame's causal depthwise conv consumes the post-MHSA values of
  the previous k-1 frames, which the step recomputes exactly from cached
  inputs (cache_chunks = ceil((k-1)/cs) + left_chunks — see
  `streaming_cache_chunks`);
- everything else in the block is frame-local ("layer_norm" conv-norm is
  the per-frame choice — batch/group norm statistics are sequence-global
  and cannot stream).

Rel-position encoding is translation-invariant, so the window's [2W-1]
table reproduces the offline scores for every in-window pair.

The reference has no streaming path (single offline eval driver,
/root/reference/eval.py); this subsystem is additive capability on the same
trained checkpoints.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from onebit_asr_tpu.model.conformer import (
    ConformerBlock,
    Conv2dSubsampling,
    chunk_pair_mask,
)
from onebit_asr_tpu.model.layers import LayerNorm, rel_positional_encoding

Dtype = Any


def streaming_cache_chunks(
    conv_kernel: int, chunk_size: int, left_chunks: int
) -> int:
    """Chunks of per-layer input history a streaming step must keep.

    A current frame's causal conv consumes the POST-MHSA values of the
    previous k-1 frames; those cached frames must therefore be recomputed
    with their own original attention context (`left_chunks` before THEM),
    so the window holds ceil((k-1)/cs) conv-history chunks plus
    `left_chunks` context chunks for the oldest of them."""
    conv_chunks = math.ceil((conv_kernel - 1) / chunk_size)
    return max(conv_chunks + left_chunks, 1)


def raw_window_size(chunk_size: int) -> int:
    """Raw (10 ms) frames consumed per streaming step to yield exactly
    `chunk_size` subsampled frames through the two VALID k=3 s=2 convs:
    subsampled frame j needs raw frames [4j, 4j+6], so a chunk of cs frames
    spans 4*cs + 3 raw frames (a 3-frame lookahead shared with the next
    window; the hop between windows is 4*cs)."""
    return 4 * chunk_size + 3


class StreamingEncoderStep(nn.Module):
    """One chunk step. Submodule names mirror `ConformerEncoder`
    ("subsample", "blocks", "ln_out"), so the offline model's
    params["encoder"] subtree applies verbatim."""

    d_model: int
    num_layers: int
    num_heads: int
    d_ff: int
    conv_kernel: int
    chunk_size: int  # cs, in subsampled frames
    left_chunks: int  # attention history in chunks (>= 0 for streaming)
    compute_dtype: Dtype = jnp.bfloat16
    packed: bool = False
    per_channel: bool = False

    @nn.compact
    def __call__(
        self,
        window_feats: jnp.ndarray,  # [B, 4*cs+3, F] raw features
        caches: jnp.ndarray,  # [L, B, C_len, D] per-layer input history
        cache_valid: jnp.ndarray,  # [] int32: valid frames at cache tail
        cur_valid: jnp.ndarray,  # [] int32: valid frames in this chunk (= cs
        # except for the final partial chunk)
        binary_mask: Optional[jnp.ndarray] = None,  # [L] bool / None = fp32
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cs = self.chunk_size
        L, B, C_len, D = caches.shape
        W = C_len + cs

        quantize = binary_mask is not None
        if binary_mask is None:
            binary_mask = jnp.zeros((self.num_layers,), dtype=bool)

        x = Conv2dSubsampling(
            self.d_model, 0.0, True, self.compute_dtype, name="subsample"
        )(window_feats)  # [B, cs, D]

        pos = jnp.asarray(rel_positional_encoding(W, D))  # [2W-1, D]

        idx = jnp.arange(C_len)
        cached_ok = idx >= (C_len - cache_valid)  # [C_len]
        cur_ok = jnp.arange(cs) < cur_valid
        key_mask = jnp.concatenate(
            [
                jnp.broadcast_to(cached_ok, (B, C_len)),
                jnp.broadcast_to(cur_ok, (B, cs)),
            ],
            axis=1,
        )  # [B, W] — frame validity (conv + attention)

        # The window is chunk-aligned, so the OFFLINE chunk mask applied in
        # window coordinates reproduces every frame's original attention
        # context — cached frames recompute their exact post-MHSA values,
        # which the current frames' causal conv consumes.
        pair_mask = chunk_pair_mask(W, cs, self.left_chunks)

        block = ConformerBlock(
            num_heads=self.num_heads,
            d_ff=self.d_ff,
            conv_kernel=self.conv_kernel,
            dropout=0.0,
            deterministic=True,
            quantize=quantize,
            compute_dtype=self.compute_dtype,
            packed=self.packed,
            conv_norm="layer_norm",
            per_channel=self.per_channel,
            causal_conv=True,
            name="blocks",
        )

        def body(blk, x_cur, scanned):
            cache_l, binary_l = scanned
            window_x = jnp.concatenate(
                [cache_l.astype(x_cur.dtype), x_cur], axis=1
            )  # [B, W, D]
            y, _ = blk(window_x, binary_l, pos, key_mask, pair_mask)
            new_cache = window_x[:, -C_len:]
            return y[:, C_len:], new_cache

        scan_layers = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=self.num_layers,
            # full unroll, as in the offline encoder (ModelConfig.
            # scan_unroll doc): the layer scan blocks cross-layer
            # scheduling; chunk steps are latency-sensitive
            unroll=self.num_layers,
        )
        x, new_caches = scan_layers(block, x, (caches, binary_mask))

        x = LayerNorm(name="ln_out")(x)
        return x, new_caches
