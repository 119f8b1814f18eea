"""ConformerASR: quantized Conformer encoder + fp decoder + CTC head.

API parity with the reference `ConformerASR`
(/root/reference/onebit_asr/conformer.py:302-322):

    enc_out, enc_mask, logits_ctc = model(feats, feat_lens, binary_mask)
    dec_logits = model.decode_logits(enc_out, enc_mask, tgt_inp, tgt_valid)

with the reference's `precision`/`sp_mask` convention mapped onto a single
per-layer boolean `binary_mask` by `precision_to_binary_mask` (reference
mapping: sp_mask[i]==1 → 1-bit else 2-bit, conformer.py:265-269).

The CTC head is full-precision (conformer.py:313); logits stay in
compute_dtype (bf16-rounded values either way — see __call__), consumers
upcast to f32 where they do arithmetic.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from onebit_asr_tpu.model.conformer import ConformerEncoder
from onebit_asr_tpu.model.decoder import TransformerDecoder
from onebit_asr_tpu.model.layers import Dense
from onebit_asr_tpu.utils.config import ModelConfig

Dtype = Any


def precision_to_binary_mask(
    precision: int, num_layers: int, sp_mask: Optional[jnp.ndarray] = None
) -> Optional[jnp.ndarray]:
    """Map reference (precision, sp_mask) → per-layer binary mask or None.

    precision 32 → None (full-precision branch, quantization skipped);
    precision 1  → all layers binary;
    precision 2  → ternary, unless sp_mask marks layers as binary
                   (stochastic-precision branch, train.py:101-109).
    """
    if precision == 32:
        return None
    if precision == 1:
        return jnp.ones((num_layers,), dtype=bool)
    if precision == 2:
        if sp_mask is None:
            return jnp.zeros((num_layers,), dtype=bool)
        return jnp.asarray(sp_mask).astype(bool)
    raise ValueError(f"precision must be 1, 2 or 32, got {precision}")


class ConformerASR(nn.Module):
    """Flagship model. Construct via `ConformerASR.from_config(cfg)`."""

    input_dim: int = 80
    vocab_size: int = 5004
    enc_d_model: int = 256
    enc_layers: int = 12
    enc_heads: int = 4
    enc_d_ff: int = 1024
    enc_conv_kernel: int = 31
    dropout: float = 0.1
    dec_layers: int = 2
    dec_heads: int = 4
    dec_d_ff: int = 1024
    pad_id: int = 0
    deterministic: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = True
    remat_policy: str = "full"
    packed: bool = False
    conv_norm: str = "batch_norm"
    per_channel: bool = False
    causal_conv: bool = False
    attn_chunk_size: Optional[int] = None
    attn_left_chunks: int = -1
    time_pad_multiple: int = 128
    scan_unroll: int = 0  # 0 = full unroll (see ModelConfig.scan_unroll)
    fused_attention: bool = False
    fused_subsampler: bool = False
    split_qkv: bool = False  # explicit tensor-parallel MHSA layout
    reference_decoder: bool = False  # reference-exact decoder semantics
    # (position-blind + post-LN) for controlled head-to-head runs
    quant_decoder: bool = False  # additive: QuantDense decoder projections
    # driven per-branch (reference keeps the decoder fp, conformer.py:275)
    norm_axis: Optional[str] = None  # sync-BN axis under shard_map SPMD:
    # set via model.clone(norm_axis=...) by make_sharded_train_step so the
    # masked BatchNorm statistics psum to the GSPMD/global-batch numbers
    pipeline_axis: Optional[str] = None  # GPipe pipeline over the encoder
    pipeline_stages: int = 1  # blocks: set via clone() by
    pipeline_microbatches: int = 1  # parallel/pipeline.py (shard_map only)

    @classmethod
    def from_config(
        cls, cfg: ModelConfig, deterministic: bool = True, packed: bool = False
    ) -> "ConformerASR":
        return cls(
            packed=packed,
            input_dim=cfg.input_dim,
            vocab_size=cfg.vocab_size,
            enc_d_model=cfg.enc_d_model,
            enc_layers=cfg.enc_layers,
            enc_heads=cfg.enc_heads,
            enc_d_ff=cfg.enc_d_ff,
            enc_conv_kernel=cfg.enc_conv_kernel,
            dropout=cfg.dropout,
            dec_layers=cfg.dec_layers,
            dec_heads=cfg.dec_heads,
            dec_d_ff=cfg.dec_d_ff,
            pad_id=cfg.specials.pad_id,
            deterministic=deterministic,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            remat=cfg.remat_blocks,
            remat_policy=cfg.remat_policy,
            conv_norm=cfg.conv_norm,
            per_channel=cfg.quant_per_channel,
            causal_conv=cfg.causal_conv,
            attn_chunk_size=cfg.attn_chunk_size,
            attn_left_chunks=cfg.attn_left_chunks,
            time_pad_multiple=cfg.time_pad_multiple,
            scan_unroll=cfg.scan_unroll,
            fused_attention=cfg.fused_attention,
            fused_subsampler=cfg.fused_subsampler,
            split_qkv=cfg.split_qkv,
            reference_decoder=cfg.reference_decoder,
            quant_decoder=cfg.quant_decoder,
        )

    def setup(self):
        self.encoder = ConformerEncoder(
            d_model=self.enc_d_model,
            num_layers=self.enc_layers,
            num_heads=self.enc_heads,
            d_ff=self.enc_d_ff,
            conv_kernel=self.enc_conv_kernel,
            dropout=self.dropout,
            deterministic=self.deterministic,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            remat_policy=self.remat_policy,
            packed=self.packed,
            conv_norm=self.conv_norm,
            per_channel=self.per_channel,
            causal_conv=self.causal_conv,
            attn_chunk_size=self.attn_chunk_size,
            attn_left_chunks=self.attn_left_chunks,
            time_pad_multiple=self.time_pad_multiple,
            scan_unroll=self.scan_unroll,
            fused_attention=self.fused_attention,
            fused_subsampler=self.fused_subsampler,
            split_qkv=self.split_qkv,
            norm_axis=self.norm_axis,
            pipeline_axis=self.pipeline_axis,
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
        )
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=self.enc_d_model,
            num_layers=self.dec_layers,
            num_heads=self.dec_heads,
            d_ff=self.dec_d_ff,
            dropout=self.dropout,
            pad_id=self.pad_id,
            deterministic=self.deterministic,
            compute_dtype=self.compute_dtype,
            quantize=self.quant_decoder,
            per_channel=self.per_channel,
            packed=self.packed,
            reference_mode=self.reference_decoder,
        )
        self.ctc_head = Dense(self.vocab_size, compute_dtype=self.compute_dtype)

    def __call__(
        self,
        feats: jnp.ndarray,  # [B, T, F]
        feat_lens: jnp.ndarray,  # [B]
        binary_mask: Optional[jnp.ndarray] = None,  # [L] bool / None = fp32
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        enc_out, enc_mask = self.encoder(feats, feat_lens, binary_mask)
        # stays in compute_dtype: the head's MXU accumulation is f32 but its
        # output is bf16-rounded either way (Dense casts), so a f32 copy of
        # the [B,T,V=5004] tensor would double its HBM traffic for zero
        # precision — consumers upcast where they do arithmetic (losses/ctc
        # gathers+logsumexp in f32; eval's log_softmax upcasts)
        logits_ctc = self.ctc_head(enc_out)
        return enc_out, enc_mask, logits_ctc

    def _decoder_bits(self, binary_mask: Optional[jnp.ndarray]):
        """Per-branch decoder precision when quant_decoder is on: the
        branch's BASE precision (fp32 branch → 32; 1-bit branch → binary;
        2-bit/stochastic branches → ternary). Derived as all(binary_mask):
        only the pure 1-bit branch has every layer binary."""
        if not self.quant_decoder or binary_mask is None:
            return 32
        return jnp.all(binary_mask)

    def decode_logits(
        self,
        enc_out: jnp.ndarray,
        enc_mask: jnp.ndarray,
        tgt_inp: jnp.ndarray,
        tgt_valid_mask: jnp.ndarray,
        binary_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.decoder(
            tgt_inp, enc_out, enc_mask, tgt_valid_mask,
            self._decoder_bits(binary_mask),
        )

    def forward_with_decoder(
        self,
        feats: jnp.ndarray,
        feat_lens: jnp.ndarray,
        tgt_inp: jnp.ndarray,
        tgt_valid_mask: jnp.ndarray,
        binary_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One-shot training branch: encoder + CTC head + AED decoder."""
        enc_out, enc_mask, logits_ctc = self(feats, feat_lens, binary_mask)
        dec_logits = self.decode_logits(
            enc_out, enc_mask, tgt_inp, tgt_valid_mask, binary_mask
        )
        return enc_out, enc_mask, logits_ctc, dec_logits
