"""Transformer decoder (training-time attention branch).

Counterpart of the reference's stock `nn.TransformerDecoder` wrapper
(/root/reference/onebit_asr/conformer.py:275-299): token embedding with a
zeroed pad row, causal self-attention, cross-attention over encoder memory,
final LayerNorm + vocab projection. Full-precision by default — quantization
applies to the encoder only, as in the reference.

Additive option `quantize=True` (ModelConfig.quant_decoder): the q/k/v/o and
ff projections become QuantDense, driven by a per-branch `binary` flag the
same way the encoder's per-layer mask works (None = fp32 branch; False =
ternary; True = binary). Embedding and the vocab projection stay
full-precision (mirroring the encoder's fp subsampler projection and CTC
head, and BitNet practice for embeddings). One parameter set serves all
precisions, exactly like the encoder.

Deviations (deliberate): sinusoidal positional encoding is added to the
embeddings (the reference feeds position-blind embeddings to a stock decoder
— a latent defect, since nn.TransformerDecoder adds no positions itself) and
layers are pre-LN for stability. Masks are finite-fill, NaN-free.

`reference_mode=True` (ModelConfig.reference_decoder / --reference_decoder)
UNDOES both deviations for controlled head-to-head runs: position-blind
embeddings (no positional add, no embedding dropout — the stock decoder has
neither) and post-LN layer structure exactly matching
nn.TransformerDecoderLayer's norm_first=False default
(x = LN(x + Drop(sublayer(x))) per sublayer). The param tree is unchanged,
so utils/torch_import._decoder transplants become semantics-exact in this
mode. Pair with LossConfig.reference_smoothing for the reference's
eps/(V-1) label-smoothing formula (losses/attention.py)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from onebit_asr_tpu.model.layers import (
    Dense,
    FastDropout,
    LayerNorm,
    QuantDense,
    abs_positional_encoding,
)
from onebit_asr_tpu.parallel.mesh import constrain

Dtype = Any

NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    """Standard MHA with f32 softmax and finite (NaN-free) masking."""

    num_heads: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16
    quantize: bool = False
    per_channel: bool = False
    packed: bool = False

    @nn.compact
    def __call__(self, q, kv, mask, bits=32):
        # q: [B, Tq, D]; kv: [B, Tk, D]; mask: broadcastable [B,1,Tq,Tk] bool
        B, Tq, D = q.shape
        H = self.num_heads
        dh = D // H
        dense = _proj(self.quantize, self.per_channel, self.compute_dtype,
                      bits, self.packed)
        qh = dense(D, "q")(q)
        kh = dense(D, "k")(kv)
        vh = dense(D, "v")(kv)
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
        return dense(D, "o")(out)


def _proj(quantize, per_channel, compute_dtype, bits, packed=False):
    """Projection factory: QuantDense(x, bits) when quantized, Dense(x)
    otherwise — the fp param tree is unchanged when quantize=False.
    `packed` routes serving through the planar 2-bit kernel, like the
    encoder (export_packed_params packs every kernel+alpha pair)."""
    def make(features, name):
        if quantize:
            layer = QuantDense(features, compute_dtype=compute_dtype,
                               per_channel=per_channel, packed=packed,
                               name=name)
            return lambda x: layer(x, bits)
        layer = Dense(features, compute_dtype=compute_dtype, name=name)
        return lambda x: layer(x)
    return make


class DecoderLayer(nn.Module):
    num_heads: int
    d_ff: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16
    quantize: bool = False
    per_channel: bool = False
    packed: bool = False
    reference_mode: bool = False  # post-LN (torch norm_first=False) layer
    # structure; same params (ln1/ln2/ln3 move from pre- to post-sublayer)

    @nn.compact
    def __call__(self, y, memory, self_mask, cross_mask, bits=32):
        drop = lambda h: FastDropout(  # noqa: E731
            self.dropout, deterministic=self.deterministic
        )(h)
        self_attn = MultiHeadAttention(
            self.num_heads, self.dropout, self.deterministic,
            self.compute_dtype, self.quantize, self.per_channel,
            self.packed, name="self_attn",
        )
        cross_attn = MultiHeadAttention(
            self.num_heads, self.dropout, self.deterministic,
            self.compute_dtype, self.quantize, self.per_channel,
            self.packed, name="cross_attn",
        )
        dense = _proj(self.quantize, self.per_channel, self.compute_dtype,
                      bits, self.packed)
        ln1 = LayerNorm(name="ln1")
        ln2 = LayerNorm(name="ln2")
        ln3 = LayerNorm(name="ln3")

        def ff(h):
            h = dense(self.d_ff, "ff1")(h)
            h = nn.relu(h)
            h = drop(h)
            return dense(y.shape[-1], "ff2")(h)

        if self.reference_mode:
            # stock nn.TransformerDecoderLayer (norm_first=False):
            # x = LN(x + Drop(sublayer(x))) per sublayer
            y = ln1(y + drop(self_attn(y, y, self_mask, bits)))
            y = ln2(y + drop(cross_attn(y, memory, cross_mask, bits)))
            y = ln3(y + drop(ff(y)))
            return y

        h = ln1(y)
        y = y + drop(self_attn(h, h, self_mask, bits))
        y = y + drop(cross_attn(ln2(y), memory, cross_mask, bits))
        y = y + drop(ff(ln3(y)))
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
    quantize: bool = False
    per_channel: bool = False
    packed: bool = False
    reference_mode: bool = False  # reference-exact semantics: position-
    # blind embeddings (no pos add / emb dropout) + post-LN layers — see
    # module docstring

    @nn.compact
    def __call__(
        self,
        tgt_inp: jnp.ndarray,  # [B, U] int32
        memory: jnp.ndarray,  # [B, T, D]
        memory_mask: jnp.ndarray,  # [B, T] bool, True = valid
        tgt_valid_mask: jnp.ndarray,  # [B, U] bool, True = valid token
        bits=32,  # static 32 (fp branch) or traced bool (True = binary)
    ) -> jnp.ndarray:
        B, U = tgt_inp.shape

        def emb_init(key, shape, dtype=jnp.float32):
            e = nn.initializers.normal(1.0)(key, shape, dtype)
            return e.at[self.pad_id].set(0.0)  # padding_idx row zeroed

        emb = self.param("embedding", emb_init, (self.vocab_size, self.d_model))
        y = emb[tgt_inp].astype(self.compute_dtype)
        if not self.reference_mode:
            # the stock reference decoder is position-blind and applies no
            # embedding dropout (conformer.py:293-296); both are our
            # documented additions
            pos = jnp.asarray(abs_positional_encoding(U, self.d_model))
            y = y + pos[None].astype(self.compute_dtype)
            y = FastDropout(self.dropout, deterministic=self.deterministic)(y)
        # Layout anchors for SPMD meshes: decoder activations are batch-
        # sharded over 'data' and replicated over every other axis. Without
        # these, a 2-D (data x model) mesh partitioner has no constraint on
        # the cross-attention chain and falls into "involuntary full
        # rematerialization" replicate-then-repartition layouts
        # (MULTICHIP_r02 tail). No-ops without an active mesh context.
        y = constrain(y, "data")
        memory = constrain(memory, "data")

        causal = jnp.tril(jnp.ones((U, U), dtype=bool))  # [U, U]
        self_mask = (
            causal[None, None, :, :] & tgt_valid_mask[:, None, None, :]
        )  # [B,1,U,U]
        cross_mask = memory_mask[:, None, None, :]  # [B,1,1,T] broadcasts over U

        for i in range(self.num_layers):
            y = DecoderLayer(
                self.num_heads, self.d_ff, self.dropout, self.deterministic,
                self.compute_dtype, self.quantize, self.per_channel,
                self.packed, self.reference_mode, name=f"layer{i}",
            )(y, memory, self_mask, cross_mask, bits)
            y = constrain(y, "data")

        y = LayerNorm(name="ln_out")(y)
        logits = Dense(
            self.vocab_size, compute_dtype=self.compute_dtype, name="out"
        )(y)
        # compute_dtype out (values are bf16-rounded regardless — Dense casts
        # its f32 accumulation down); losses upcast to f32 internally
        return logits
