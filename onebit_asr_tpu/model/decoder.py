"""Full-precision Transformer decoder (training-time attention branch).

Counterpart of the reference's stock `nn.TransformerDecoder` wrapper
(/root/reference/onebit_asr/conformer.py:275-299): token embedding with a
zeroed pad row, causal self-attention, cross-attention over encoder memory,
final LayerNorm + vocab projection. Entirely full-precision — quantization
applies to the encoder only, as in the reference.

Deviations (deliberate): sinusoidal positional encoding is added to the
embeddings (the reference feeds position-blind embeddings to a stock decoder
— a latent defect, since nn.TransformerDecoder adds no positions itself) and
layers are pre-LN for stability. Masks are finite-fill, NaN-free.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from onebit_asr_tpu.model.layers import (
    Dense,
    FastDropout,
    LayerNorm,
    abs_positional_encoding,
)

Dtype = Any

NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    """Standard MHA with f32 softmax and finite (NaN-free) masking."""

    num_heads: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, kv, mask):
        # q: [B, Tq, D]; kv: [B, Tk, D]; mask: broadcastable [B,1,Tq,Tk] bool
        B, Tq, D = q.shape
        H = self.num_heads
        dh = D // H
        qh = Dense(D, compute_dtype=self.compute_dtype, name="q")(q)
        kh = Dense(D, compute_dtype=self.compute_dtype, name="k")(kv)
        vh = Dense(D, compute_dtype=self.compute_dtype, name="v")(kv)
        qh = qh.reshape(B, Tq, H, dh)
        kh = kh.reshape(B, -1, H, dh)
        vh = vh.reshape(B, -1, H, dh)
        scores = jnp.einsum(
            "bthd,bshd->bhts", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(dh))
        scores = jnp.where(mask, scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = FastDropout(self.dropout, deterministic=self.deterministic)(attn)
        out = jnp.einsum(
            "bhts,bshd->bthd",
            attn.astype(self.compute_dtype),
            vh,
            preferred_element_type=jnp.float32,
        ).astype(self.compute_dtype)
        out = out.reshape(B, Tq, D)
        return Dense(D, compute_dtype=self.compute_dtype, name="o")(out)


class DecoderLayer(nn.Module):
    num_heads: int
    d_ff: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, y, memory, self_mask, cross_mask):
        h = LayerNorm(name="ln1")(y)
        h = MultiHeadAttention(
            self.num_heads, self.dropout, self.deterministic,
            self.compute_dtype, name="self_attn",
        )(h, h, self_mask)
        y = y + FastDropout(self.dropout, deterministic=self.deterministic)(h)

        h = LayerNorm(name="ln2")(y)
        h = MultiHeadAttention(
            self.num_heads, self.dropout, self.deterministic,
            self.compute_dtype, name="cross_attn",
        )(h, memory, cross_mask)
        y = y + FastDropout(self.dropout, deterministic=self.deterministic)(h)

        h = LayerNorm(name="ln3")(y)
        h = Dense(self.d_ff, compute_dtype=self.compute_dtype, name="ff1")(h)
        h = nn.relu(h)
        h = FastDropout(self.dropout, deterministic=self.deterministic)(h)
        h = Dense(y.shape[-1], compute_dtype=self.compute_dtype, name="ff2")(h)
        y = y + FastDropout(self.dropout, deterministic=self.deterministic)(h)
        return y


class TransformerDecoder(nn.Module):
    """Embedding (+pos) → N pre-LN decoder layers → LN → vocab logits.

    `__call__(tgt_inp [B,U], memory [B,T,D], memory_mask [B,T],
    tgt_valid_mask [B,U])` → logits [B,U,V] in compute_dtype, matching the reference
    call contract (conformer.py:287-299). Masks are True = valid.
    """

    vocab_size: int
    d_model: int = 256
    num_layers: int = 2
    num_heads: int = 4
    d_ff: int = 1024
    dropout: float = 0.1
    pad_id: int = 0
    deterministic: bool = True
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        tgt_inp: jnp.ndarray,  # [B, U] int32
        memory: jnp.ndarray,  # [B, T, D]
        memory_mask: jnp.ndarray,  # [B, T] bool, True = valid
        tgt_valid_mask: jnp.ndarray,  # [B, U] bool, True = valid token
    ) -> jnp.ndarray:
        B, U = tgt_inp.shape

        def emb_init(key, shape, dtype=jnp.float32):
            e = nn.initializers.normal(1.0)(key, shape, dtype)
            return e.at[self.pad_id].set(0.0)  # padding_idx row zeroed

        emb = self.param("embedding", emb_init, (self.vocab_size, self.d_model))
        y = emb[tgt_inp].astype(self.compute_dtype)
        pos = jnp.asarray(abs_positional_encoding(U, self.d_model))
        y = y + pos[None].astype(self.compute_dtype)
        y = FastDropout(self.dropout, deterministic=self.deterministic)(y)

        causal = jnp.tril(jnp.ones((U, U), dtype=bool))  # [U, U]
        self_mask = (
            causal[None, None, :, :] & tgt_valid_mask[:, None, None, :]
        )  # [B,1,U,U]
        cross_mask = memory_mask[:, None, None, :]  # [B,1,1,T] broadcasts over U

        for i in range(self.num_layers):
            y = DecoderLayer(
                self.num_heads, self.d_ff, self.dropout, self.deterministic,
                self.compute_dtype, name=f"layer{i}",
            )(y, memory, self_mask, cross_mask)

        y = LayerNorm(name="ln_out")(y)
        logits = Dense(
            self.vocab_size, compute_dtype=self.compute_dtype, name="out"
        )(y)
        # compute_dtype out (values are bf16-rounded regardless — Dense casts
        # its f32 accumulation down); losses upcast to f32 internally
        return logits
