"""Conformer encoder — scanned, rematerialized, statically-shaped, NaN-free.

TPU-native re-design of the reference encoder
(/root/reference/onebit_asr/conformer.py:27-272). Key deviations, each
deliberate and documented:

- **Blocks run under `nn.scan`** (+ optional `nn.remat`): one compiled block
  body regardless of depth, stacked parameters [L, ...] (great for pjit
  sharding), O(1) compile time in depth, and activation memory bounded by
  rematerialization — this is what removes the reference's batch-size<8
  memory ceiling (README.md:16).
- **Per-layer bitwidth is a scanned boolean**, so the stochastic-precision
  branch (reference conformer.py:265-269) runs inside the same compiled
  graph instead of a Python-level per-layer dispatch.
- **Exact subsampled lengths**: `((T-1)//2 - 1)//2` per the true VALID-conv
  arithmetic, fixing the reference's `feat_lens // 4` over-approximation
  (conformer.py:253 — SURVEY bug suspect #2).
- **Masked conv-module normalization** (MaskedBatchNorm) instead of
  BatchNorm over padded frames (conformer.py:157-160, 225 — bug suspect #1).
- **Finite masking**: attention uses a large-negative f32 fill rather than
  -inf, so softmax never emits NaN and the reference's `nan_to_num` patch
  (conformer.py:122-127) is unnecessary by construction.
- **Full 2T-1 relative positions** (Transformer-XL rel-shift) instead of the
  legacy 0..T-1 table (conformer.py:55-76).

Module structure mirrors the reference block: FF(1/2) -> rel-pos MHSA ->
Conv -> FF(1/2) -> LayerNorm (conformer.py:212-228), with the conv module
kept full-precision as in the reference (conformer.py:225) and all FF/MHSA
projections quantized.
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from onebit_asr_tpu.model.layers import (
    Dense,
    FastDropout,
    LayerNorm,
    MaskedBatchNorm,
    MaskedGroupNorm,
    QuantDense,
    QuantParams,
    lengths_to_mask,
    rel_positional_encoding,
    torch_bias_init,
)
from onebit_asr_tpu.ops.quant import quantize_weight
from onebit_asr_tpu.ops.subsampler import fused_subsample

Dtype = Any

NEG_INF = -1e9  # finite mask fill: softmax stays NaN-free even for all-pad rows


_warned_ambient_tp = False


def _tp_model_axis_active() -> bool:
    """True when tracing under a mesh with a 'model' axis (tensor
    parallelism, parallel/sharding_rules.py). Layout-only switch: MHSA
    then uses three per-projection GEMMs instead of the fused [D,3D]
    concat, whose q/k/v split boundaries interleave with the column-shard
    boundaries and cost the partitioner a collective-permute per
    re-alignment (forward and transpose). Read at trace time from the
    ambient mesh (jax.sharding.set_mesh), which both the train CLI and
    the dryrun establish.

    FALLBACK ONLY: the TP code paths (cli/train.py, __graft_entry__)
    plumb the explicit `split_qkv` model flag; this ambient probe is
    insurance for ad-hoc users who set a 'model'-axis mesh without it.
    It catches ONLY AttributeError (API drift: `get_abstract_mesh` or
    `.axis_names` renamed/removed across jax versions) — anything else
    propagates — and it warns once when it flips the layout, so the
    switch is never silent (ADVICE r4: spooky ambient action)."""
    global _warned_ambient_tp
    try:
        mesh = jax.sharding.get_abstract_mesh()
        active = mesh is not None and "model" in (mesh.axis_names or ())
    except AttributeError as e:  # pragma: no cover - API drift guard
        warnings.warn(
            "jax.sharding.get_abstract_mesh probe failed "
            f"({e}); assuming no tensor-parallel 'model' axis. Under TP "
            "pass split_qkv=True explicitly or MHSA will use the fused "
            "QKV layout and pay collective-permutes.",
            RuntimeWarning,
            stacklevel=2,
        )
        return False
    if active and not _warned_ambient_tp:
        _warned_ambient_tp = True
        warnings.warn(
            "ambient mesh has a 'model' axis: MHSA switches to split "
            "q/k/v projections (tensor-parallel layout). Prefer the "
            "explicit split_qkv=True model flag (identical math; this "
            "ambient switch exists as a fallback).",
            RuntimeWarning,
            stacklevel=2,
        )
    return active


def subsampled_length(lengths: jnp.ndarray) -> jnp.ndarray:
    """Exact output length of two VALID k=3 s=2 convs: ((T-1)//2 - 1)//2.

    The reference approximates with `feat_lens // 4` (conformer.py:253),
    which can exceed the true frame count and corrupt masks/CTC lengths.
    """
    l1 = (lengths - 1) // 2
    l2 = (l1 - 1) // 2
    return jnp.maximum(l2, 1)


def chunk_pair_mask(
    T: int, chunk_size: int, left_chunks: int = -1
) -> jnp.ndarray:
    """[T, T] bool — True where a query frame may attend to a key frame under
    U2-style chunked attention: frame t sees its own chunk fully plus
    `left_chunks` previous chunks (all history if left_chunks < 0).

    Training with this mask makes the encoder consumable by the streaming
    runtime (decode/streaming.py) with bit-identical attention context.
    """
    cid = jnp.arange(T) // chunk_size
    q, k = cid[:, None], cid[None, :]
    mask = k <= q
    if left_chunks >= 0:
        mask = mask & (k >= q - left_chunks)
    return mask


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] position scores → [B, H, T, T] aligned per (t, s).

    Input column j scores relative offset (T-1-j); output[:, :, t, s] picks
    offset t-s, i.e. column T-1-t+s. Standard Transformer-XL zero-pad
    reshape trick (cf. reference's legacy variant at conformer.py:97-103).
    """
    B, H, T, P = x.shape
    zero_pad = jnp.zeros((B, H, T, 1), dtype=x.dtype)
    x = jnp.concatenate([zero_pad, x], axis=-1)  # [B,H,T,2T]
    return rel_shift_padded(x)


def rel_shift_padded(x: jnp.ndarray) -> jnp.ndarray:
    """`rel_shift` for inputs whose zero column is already baked in.

    x: [B, H, T, 2T] where column 0 is exactly zero (the pad `rel_shift`
    would concatenate). Baking the pad into the POSITION TABLE (one zero
    row prepended to the projected [2T-1, H, dh] table, RelPosMHSA below)
    keeps the big [B,H,T,·] einsum output lane-aligned at 2T and deletes
    the [B,H,T,1]+[B,H,T,2T-1] concat — edge-masked 2T-1-wide tiles were
    the same relayout tax the subsampled-time padding removed (see
    ModelConfig.time_pad_multiple). Exact transformation: column 0 of the
    einsum output is (q+v)·0 = 0, bit-identical to the concat-then-shift.
    """
    B, H, T = x.shape[:3]
    x = x.reshape(B, H, 2 * T, T)
    x = x[:, :, 1:, :].reshape(B, H, T, 2 * T - 1)
    return x[..., :T]


class FeedForward(nn.Module):
    """Macaron feed-forward: pre-LN → QuantDense d→d_ff → swish → dropout →
    QuantDense d_ff→d → dropout (reference conformer.py:27-45)."""

    d_ff: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16
    packed: bool = False
    per_channel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, bits) -> jnp.ndarray:
        d = x.shape[-1]
        qd = partial(QuantDense, compute_dtype=self.compute_dtype,
                     packed=self.packed, per_channel=self.per_channel)
        y = LayerNorm(name="ln")(x)
        y = qd(self.d_ff, name="w1")(y, bits)
        # named so remat_policy="attn_ffn" can save the [.., d_ff] hidden
        # pre-activation: the backward then skips recomputing the d->d_ff
        # matmul (silu and its derivative re-derive from this tensor)
        y = checkpoint_name(y, "ffn_hidden")
        y = jax.nn.silu(y)
        y = FastDropout(self.dropout, deterministic=self.deterministic)(y)
        y = qd(d, name="w2")(y, bits)
        y = FastDropout(self.dropout, deterministic=self.deterministic)(y)
        return y


class RelPosMHSA(nn.Module):
    """Relative-position multi-head self-attention (Transformer-XL style).

    All five projections quantized, learnable pos_bias_u/v, scale 1/sqrt(d_h)
    (reference conformer.py:79-138). Masking uses finite NEG_INF and output
    rows for padded queries are zeroed — no NaN path exists.
    """

    num_heads: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16
    packed: bool = False
    per_channel: bool = False
    fused: bool = False  # Pallas fused rel-pos attention kernel (TPU); the
    # XLA path runs when a pair_mask is present (streaming) or on CPU
    split_qkv: bool = False  # explicit tensor-parallel layout flag: three
    # per-projection [D,D] GEMMs instead of the fused [D,3D] concat (set by
    # the TP code paths; identical math and param tree either way)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        pos: jnp.ndarray,  # [2T-1, D]
        key_mask: jnp.ndarray,  # [B, T] bool, True = valid
        bits,
        pair_mask: Optional[jnp.ndarray] = None,  # [T, T] bool, True = may
        # attend (chunked/causal attention for streaming encoders)
    ) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.num_heads
        dh = D // H
        qd = partial(QuantDense, compute_dtype=self.compute_dtype,
                     packed=self.packed, per_channel=self.per_channel)

        y = LayerNorm(name="ln")(x)
        if self.packed or self.split_qkv or _tp_model_axis_active():
            # separate projections: the serving path (each a packed-ternary
            # matmul), and ALSO the tensor-parallel path — under a 'model'
            # mesh axis the fused [D,3D] concat would interleave the q/k/v
            # boundaries (at D, 2D) with the column-shard boundaries
            # (at 3D/N), and the partitioner re-aligns every split/concat
            # with collective-permutes (the 16 unexplained permutes in
            # MULTICHIP_r03's tp counts). Three column-sharded [D,D] GEMMs
            # need zero resharding; identical math either way. split_qkv
            # is the explicit TP plumbing; the ambient-mesh probe is a
            # warn-once fallback.
            q = qd(D, name="q_proj")(y, bits)
            k = qd(D, name="k_proj")(y, bits)
            v = qd(D, name="v_proj")(y, bits)
            p = qd(D, name="pos_proj")(pos.astype(self.compute_dtype), bits)
        else:
            # Fused QKV: quantize each projection with its OWN alpha
            # (reference tensor-wise semantics, quant.py:110-113), then run
            # ONE [B*T, D] x [D, 3D] GEMM instead of three [D, D] GEMMs —
            # y is read from HBM once instead of three times and the MXU
            # sees a 3x-wider output tile. Bitwise-identical math: each
            # output column contracts over the same D with the same f32
            # accumulation as the per-projection dots. The pos projection
            # stays separate: its input is the [2T-1, D] position table,
            # and folding it in row-wise (a [D, 4D] GEMM over concat rows)
            # would spend ~60% extra FLOPs computing q/k/v of pos rows and
            # pos-proj of y rows. Param layout matches three QuantDense
            # layers exactly (layers.QuantParams) so checkpoints are
            # unchanged.
            qp = partial(QuantParams, D, D, per_channel=self.per_channel)
            wq, aq, bq = qp(name="q_proj")()
            wk, ak, bk = qp(name="k_proj")()
            wv, av, bv = qp(name="v_proj")()
            w_cat = jnp.concatenate(
                [
                    quantize_weight(wq, aq, bits),
                    quantize_weight(wk, ak, bits),
                    quantize_weight(wv, av, bits),
                ],
                axis=-1,
            )  # [D, 3D]
            qkv = jnp.dot(
                y.astype(self.compute_dtype),
                w_cat.astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            qkv = (
                qkv + jnp.concatenate([bq, bk, bv])
            ).astype(self.compute_dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            wp, ap, bp = qp(name="pos_proj")()
            p = (
                jnp.dot(
                    pos.astype(self.compute_dtype),
                    quantize_weight(wp, ap, bits).astype(self.compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + bp
            ).astype(self.compute_dtype)

        q = q.reshape(B, T, H, dh)
        k = k.reshape(B, T, H, dh)
        v = v.reshape(B, T, H, dh)
        p = p.reshape(-1, H, dh)  # [2T-1, H, dh]

        u = self.param(
            "pos_bias_u", nn.initializers.normal(0.01), (H, dh), jnp.float32
        ).astype(self.compute_dtype)
        vb = self.param(
            "pos_bias_v", nn.initializers.normal(0.01), (H, dh), jnp.float32
        ).astype(self.compute_dtype)

        scale = 1.0 / float(np.sqrt(dh))
        use_fused = (
            self.fused
            and pair_mask is None
            and jax.default_backend() != "cpu"
        )
        if use_fused:
            # Entire rel-pos attention (content + skewed position scores +
            # mask + softmax + dropout + AV) in one VMEM-resident Pallas
            # kernel: nothing [T,T]-or-wider touches HBM.
            from onebit_asr_tpu.ops.attention import (
                drop_threshold,
                fused_relpos_attention,
            )

            rate = 0.0 if self.deterministic else self.dropout
            if drop_threshold(rate) > 0:
                # Uint8 draws from XLA's rng-bit-generator, word-split as
                # in FastDropout and drawn SHAPED (flat->[...,T] uint8
                # relayouts at T=255 cost ~3 ms/layer, layers.py note) —
                # NOT drawn in-kernel: pltpu's PRNG primitives measured
                # far slower than XLA's generator. Named "dropout_bits"
                # so the masks/fused remat policies save them instead of
                # regenerating in the backward.
                q4 = (T + 3) // 4
                words = jax.random.bits(
                    self.make_rng("dropout"), (B, H, T, q4), jnp.uint32
                )
                drop8 = jax.lax.bitcast_convert_type(words, jnp.uint8)
                drop8 = drop8.reshape(B, H, T, 4 * q4)[..., :T]
                drop8 = checkpoint_name(drop8, "dropout_bits")
            else:
                rate = 0.0
                drop8 = jnp.zeros((1, 1, 1, 1), jnp.uint8)
            out = fused_relpos_attention(
                q.transpose(0, 2, 1, 3),  # [B, H, T, dh]
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                p.transpose(1, 0, 2),  # [H, 2T-1, dh]
                u, vb,
                key_mask.astype(jnp.float32), drop8, scale, rate,
            ).transpose(0, 2, 1, 3)  # back to [B, T, H, dh]
            # save the (small) kernel output across remat so the backward
            # runs the kernel's own VJP instead of fwd-recompute + VJP
            out = checkpoint_name(out, "attn_out")
        else:
            # XLA fallback (CPU, streaming pair masks). Score tensors stay
            # in compute_dtype (bf16 in production) to halve HBM traffic —
            # the MXU accumulates in f32 internally, and the softmax below
            # is always f32.
            # zero row prepended to the position table -> the einsum output
            # is [B,H,T,2T] (lane-aligned) with rel_shift's pad column baked
            # into column 0; see rel_shift_padded
            p_padded = jnp.concatenate(
                [jnp.zeros((1, H, dh), p.dtype), p], axis=0
            )  # [2T, H, dh]
            bd = jnp.einsum(
                "bthd,phd->bhtp", q + vb[None, None], p_padded,
                preferred_element_type=self.compute_dtype,
            )  # [B,H,T,2T] -> rel_shift_padded -> [B,H,T,T]
            bd = rel_shift_padded(bd)
            ac = jnp.einsum(
                "bthd,bshd->bhts", q + u[None, None], k,
                preferred_element_type=self.compute_dtype,
            )
            scores = (ac + bd).astype(jnp.float32) * scale
            allowed = key_mask[:, None, None, :]
            if pair_mask is not None:
                allowed = allowed & pair_mask[None, None, :, :]
            scores = jnp.where(allowed, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)  # f32, finite always
            # named so remat_policy="attn" can save the prob tensor (in
            # compute_dtype) and skip recomputing the whole [T,T]-wide
            # score/skew/softmax chain in the backward
            attn = checkpoint_name(
                attn.astype(self.compute_dtype), "attn_probs"
            )
            attn = FastDropout(
                self.dropout, deterministic=self.deterministic
            )(attn)
            out = jnp.einsum(
                "bhts,bshd->bthd", attn, v,
                preferred_element_type=jnp.float32,
            ).astype(self.compute_dtype)
        out = out.reshape(B, T, D)
        out = qd(D, name="out_proj")(out, bits)
        out = FastDropout(self.dropout, deterministic=self.deterministic)(out)
        # zero padded query rows (reference conformer.py:133-137)
        return out * key_mask[..., None].astype(out.dtype)


class ConvModule(nn.Module):
    """Conformer convolution module, full-precision per the paper and the
    reference (conformer.py:141-167, 225): pre-LN → pointwise d→2d → GLU →
    depthwise k-conv (SAME) → masked batch-norm → swish → pointwise → dropout.

    Inputs are masked before the depthwise conv so padding can never leak
    into valid frames through the receptive field.
    """

    kernel_size: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16
    norm: str = "batch_norm"  # "batch_norm" (reference semantics, masked);
    # "group_norm" (per-sample masked stats: no cross-batch reduction -> no
    # per-layer collective under data parallelism); "layer_norm" (per-frame:
    # the streaming-safe choice — frame t's output never depends on other
    # frames' statistics)
    causal: bool = False  # left-only receptive field (streaming encoders):
    # pad (k-1, 0) instead of SAME, so frame t sees only frames <= t
    norm_axis: str | None = None  # sync-BN axis for shard_map SPMD (see
    # layers.MaskedBatchNorm) — only batch_norm has cross-batch statistics

    @nn.compact
    def __call__(self, x: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        y = LayerNorm(name="ln")(x)
        y = Dense(2 * D, compute_dtype=self.compute_dtype, name="pw1")(y)
        y = nn.glu(y, axis=-1)
        y = y * frame_mask[..., None].astype(y.dtype)

        dw_kernel = self.param(
            "dw_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, D),
            jnp.float32,
        )
        # Depthwise conv runs in f32: mixed-dtype conv grads are ill-defined
        # in XLA, and a bf16-everything variant measured exactly equal step
        # time (the conv is not on the critical path), so keep the safer
        # numerics.
        pad = (
            [(self.kernel_size - 1, 0)] if self.causal else "SAME"
        )
        y = jax.lax.conv_general_dilated(
            y.astype(jnp.float32),
            dw_kernel,
            window_strides=(1,),
            padding=pad,
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=D,
        ).astype(self.compute_dtype)

        if self.norm == "group_norm":
            y = MaskedGroupNorm(num_groups=min(32, D), name="gn")(y, frame_mask)
        elif self.norm == "layer_norm":
            y = LayerNorm(name="frame_ln")(y)
            y = y * frame_mask[..., None].astype(y.dtype)
        else:
            y = MaskedBatchNorm(axis_name=self.norm_axis, name="bn")(
                y, frame_mask
            )
        y = jax.nn.silu(y)
        y = Dense(D, compute_dtype=self.compute_dtype, name="pw2")(y)
        y = FastDropout(self.dropout, deterministic=self.deterministic)(y)
        return y * frame_mask[..., None].astype(y.dtype)


class ConformerBlock(nn.Module):
    """ff1(1/2) → MHSA → Conv → ff2(1/2) → LN (reference conformer.py:212-228).

    Shaped for `nn.scan`: carry is the hidden state, the scanned input is the
    per-layer 1-bit/ternary selector.
    """

    num_heads: int
    d_ff: int
    conv_kernel: int
    dropout: float
    deterministic: bool
    quantize: bool
    compute_dtype: Dtype = jnp.bfloat16
    packed: bool = False
    conv_norm: str = "batch_norm"
    per_channel: bool = False
    causal_conv: bool = False
    fused_attention: bool = False
    norm_axis: str | None = None
    split_qkv: bool = False

    @nn.compact
    def __call__(self, x, binary, pos, key_mask, pair_mask=None):
        bits = binary if self.quantize else 32
        x = x + 0.5 * FeedForward(
            self.d_ff, self.dropout, self.deterministic,
            self.compute_dtype, self.packed, self.per_channel, name="ff1",
        )(x, bits)
        x = x + RelPosMHSA(
            self.num_heads, self.dropout, self.deterministic,
            self.compute_dtype, self.packed, self.per_channel,
            self.fused_attention, self.split_qkv, name="mhsa",
        )(x, pos, key_mask, bits, pair_mask)
        x = x + ConvModule(
            self.conv_kernel, self.dropout, self.deterministic,
            self.compute_dtype, self.conv_norm, self.causal_conv,
            self.norm_axis, name="conv",
        )(x, key_mask)
        x = x + 0.5 * FeedForward(
            self.d_ff, self.dropout, self.deterministic,
            self.compute_dtype, self.packed, self.per_channel, name="ff2",
        )(x, bits)
        x = LayerNorm(name="ln_out")(x)
        return x, None


class _ConvParams(nn.Module):
    """Parameter holder matching `nn.Conv`'s variable layout exactly
    (kernel [3,3,I,O] HWIO lecun-normal, bias [O] torch-uniform) so fused
    and unfused subsampler checkpoints are interchangeable."""

    c_in: int
    c_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.c_in, self.c_out), jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(9 * self.c_in), (self.c_out,),
            jnp.float32,
        )
        return kernel, bias


class Conv2dSubsampling(nn.Module):
    """Two 3x3 stride-2 VALID convs + ReLU, flatten freq, Dense → d_model
    (reference conformer.py:170-208; projections full-precision there too).

    With `fused=True` the conv1→ReLU→conv2→ReLU chain runs as one Pallas
    kernel (ops/subsampler.py): the conv1 output — the single largest
    activation of the whole step — never touches HBM. Same parameters,
    same math (conv2 matmul in compute_dtype, like the unfused nn.Conv)."""

    d_model: int
    dropout: float
    deterministic: bool
    compute_dtype: Dtype = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        if self.fused:
            C = self.d_model
            w1, b1 = _ConvParams(1, C, name="conv1")()
            w2, b2 = _ConvParams(C, C, name="conv2")()
            x = fused_subsample(
                feats.astype(jnp.float32), w1[:, :, 0, :], b1,
                w2.reshape(9 * C, C), b2, self.compute_dtype,
            )  # [B, T2, F2, C] compute_dtype
        else:
            # torch-default NONZERO bias init is load-bearing here: it is
            # what keeps SpecAugment-blanked (zero) frames from producing
            # channel-constant rows that zero out every downstream
            # per-frame LayerNorm's variance (layers.torch_bias_init)
            x = feats[..., None].astype(self.compute_dtype)  # [B,T,F,1]
            x = nn.Conv(
                self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv1",
                bias_init=torch_bias_init(9 * 1),
            )(x)
            x = nn.relu(x)
            x = nn.Conv(
                self.d_model, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.compute_dtype, param_dtype=jnp.float32, name="conv2",
                bias_init=torch_bias_init(9 * self.d_model),
            )(x)
            x = nn.relu(x)
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x = Dense(self.d_model, compute_dtype=self.compute_dtype, name="proj",
                  torch_bias=True)(x)
        return FastDropout(self.dropout, deterministic=self.deterministic)(x)


class ConformerEncoder(nn.Module):
    """Full encoder: subsample → rel-pos table → L scanned blocks → LN.

    `binary_mask` is a [L] bool array (True = 1-bit, False = ternary) or None
    for the full-precision branch; `ConformerASR` maps the reference's
    precision/sp_mask convention onto it (conformer.py:265-269).
    """

    d_model: int = 256
    num_layers: int = 12
    num_heads: int = 4
    d_ff: int = 1024
    conv_kernel: int = 31
    dropout: float = 0.1
    deterministic: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = True
    remat_policy: str = "full"  # "full" saves none; "dots" saves matmul outputs
    packed: bool = False
    conv_norm: str = "batch_norm"
    per_channel: bool = False
    fused_attention: bool = False  # Pallas fused attention kernel on TPU
    fused_subsampler: bool = False  # Pallas fused conv1→ReLU→conv2→ReLU
    split_qkv: bool = False  # tensor-parallel MHSA layout (see RelPosMHSA)
    causal_conv: bool = False  # streaming: conv sees only the past
    attn_chunk_size: Optional[int] = None  # streaming: chunked attention —
    # frame t attends within its chunk of this many SUBSAMPLED frames plus
    # `attn_left_chunks` previous chunks (U2-style); None = full context
    attn_left_chunks: int = -1  # -1 = unlimited history within the utterance
    scan_unroll: int = 0  # lax.scan unroll for the block stack: 0 = FULL
    # unroll (the measured default — see ModelConfig.scan_unroll), N>0 =
    # unroll factor, 1 = one compiled body
    time_pad_multiple: int = 128  # pad the SUBSAMPLED time axis up to a
    # multiple of this (when T exceeds half of it): the canonical T=1024 raw
    # frames subsample to T'=255, and a 255-wide lane dimension costs
    # measured ~13% of the whole train step in relayouts and edge-masked
    # tiles across the [.., T', T'] score/prob/draw tensors (bench: 197.5 →
    # 222.8 utt/s at T'=256). Padded frames carry zeros and are masked
    # everywhere (attention keys, conv input, CTC/decode lengths); 1
    # disables.
    norm_axis: Optional[str] = None  # sync-BN axis under shard_map SPMD
    # Pipeline parallelism (GPipe-style) over the block stack: set by
    # parallel/pipeline.py make_pipeline_train_step via clone(). The stacked
    # [L, ...] block params shard over the mesh's `pipeline_axis` (each
    # device holds L/stages layers); microbatches rotate through the stages
    # with lax.ppermute. Only meaningful INSIDE jax.shard_map over a mesh
    # with that axis — never set for single-device or GSPMD use.
    pipeline_axis: Optional[str] = None
    pipeline_stages: int = 1
    pipeline_microbatches: int = 1

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, T, F]
        feat_lens: jnp.ndarray,  # [B]
        binary_mask: Optional[jnp.ndarray] = None,  # [L] bool or None (=fp32)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        quantize = binary_mask is not None
        if binary_mask is None:
            binary_mask = jnp.zeros((self.num_layers,), dtype=bool)

        x = Conv2dSubsampling(
            self.d_model, self.dropout, self.deterministic,
            self.compute_dtype, fused=self.fused_subsampler, name="subsample",
        )(feats)
        enc_lens = subsampled_length(feat_lens)
        B, T, D = x.shape
        # lane-align the subsampled time axis (see time_pad_multiple doc);
        # the T > m/2 gate keeps tiny shapes (tests, toy models) unpadded,
        # where alignment buys nothing and the pad would dominate compute
        m = self.time_pad_multiple
        if m > 1 and T > m // 2 and T % m:
            pad = m - T % m
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            T += pad
        key_mask = lengths_to_mask(enc_lens, T)  # [B, T]

        pos = jnp.asarray(rel_positional_encoding(T, D))  # [2T-1, D] constant
        x = FastDropout(self.dropout, deterministic=self.deterministic)(x)

        pair_mask = None
        if self.attn_chunk_size is not None:
            pair_mask = chunk_pair_mask(
                T, self.attn_chunk_size, self.attn_left_chunks
            )

        block_cls = ConformerBlock
        if self.remat:
            # remat_policy "dots": save matmul/einsum outputs (and the fused
            # attention kernel's output, via its checkpoint_name), recompute
            # only the cheap elementwise ops in the backward pass. "full"
            # recomputes everything (minimum memory); anything else falls
            # back to full recompute. NOTE: with the XLA attention path,
            # "dots" also saves the [B,H,T,T] score matmuls to HBM — on
            # bandwidth-bound configs "full" can be faster there; with the
            # fused kernel no [T,T] tensor is a dot output, so "dots" keeps
            # only cheap tensors.
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.checkpoint_dots,
                    jax.checkpoint_policies.save_only_these_names("attn_out"),
                )
            elif self.remat_policy == "masks":
                # "full" + saved dropout bytes: recompute every activation
                # but NOT the PRNG draws — mask regeneration is RNG-bound
                # (layers.FastDropout note) while uint8 masks reload at HBM
                # speed. Costs ~1 byte/activation of live memory.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "dropout_bits"
                )
            elif self.remat_policy == "attn":
                # "masks" + the softmax prob tensors: the backward skips
                # recomputing the widest chain in the step (scores + skew +
                # softmax, [T,T]/[T,2T-1] per layer per branch). Costs
                # ~B*H*T*T*2 bytes/layer/branch of live memory — the knob
                # for throughput-first configs with headroom.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "dropout_bits", "attn_probs"
                )
            elif self.remat_policy == "attn_ffn":
                # "attn" + the macaron FF hidden pre-activations: the
                # backward also skips the two d->d_ff matmul recomputes per
                # block. Costs ~B*T*d_ff*2 bytes x2 FF/layer/branch more
                # live memory than "attn".
                policy = jax.checkpoint_policies.save_only_these_names(
                    "dropout_bits", "attn_probs", "ffn_hidden"
                )
            elif self.remat_policy == "fused":
                # the pairing for fused_attention=True: save the kernel's
                # (small, [B,H,T,dh]) output so the backward calls its
                # flash-style VJP directly instead of recomputing the
                # forward kernel first, plus the uint8 dropout draws —
                # including the kernel's own [B,H,T,T] attention draws,
                # which its VJP re-reads as an operand ("masks"
                # economics at every site).
                policy = jax.checkpoint_policies.save_only_these_names(
                    "dropout_bits", "attn_out"
                )
            elif self.remat_policy == "full":
                policy = None
            else:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}; expected "
                    "one of: full, masks, attn, attn_ffn, dots, fused"
                )
            block_cls = nn.remat(
                ConformerBlock,
                prevent_cse=False,
                static_argnums=(),
                policy=policy,
            )
        scan_length = self.num_layers
        if self.pipeline_axis is not None:
            if self.num_layers % self.pipeline_stages:
                raise ValueError(
                    f"num_layers {self.num_layers} not divisible by "
                    f"pipeline_stages {self.pipeline_stages}"
                )
            if self.conv_norm == "batch_norm":
                raise ValueError(
                    "pipeline parallelism needs a per-sample conv norm "
                    "(group_norm/layer_norm): BatchNorm statistics over a "
                    "microbatch cannot be synchronized across pipeline "
                    "ticks (the GPipe-BN problem)"
                )
            # each device applies only its stage's layer slice per tick
            scan_length = self.num_layers // self.pipeline_stages
        block_kwargs = dict(
            num_heads=self.num_heads,
            d_ff=self.d_ff,
            conv_kernel=self.conv_kernel,
            dropout=self.dropout,
            deterministic=self.deterministic,
            quantize=quantize,
            compute_dtype=self.compute_dtype,
            packed=self.packed,
            conv_norm=self.conv_norm,
            per_channel=self.per_channel,
            causal_conv=self.causal_conv,
            fused_attention=self.fused_attention,
            norm_axis=self.norm_axis,
            split_qkv=self.split_qkv,
        )
        ScanBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
            length=scan_length,
            unroll=(
                scan_length
                if self.scan_unroll < 1
                else min(self.scan_unroll, scan_length)
            ),
        )
        if self.pipeline_axis is None:
            x, _ = ScanBlocks(**block_kwargs, name="blocks")(
                x, binary_mask, pos, key_mask, pair_mask
            )
        else:
            x = self._pipelined_blocks(
                ScanBlocks, block_kwargs, x, binary_mask, pos, key_mask,
                pair_mask,
            )

        x = LayerNorm(name="ln_out")(x)
        return x, key_mask

    def _pipelined_blocks(
        self, ScanBlocks, block_kwargs, x, binary_mask, pos, key_mask,
        pair_mask,
    ):
        """GPipe-style pipelined application of the block stack.

        Runs INSIDE jax.shard_map over a mesh with axis `pipeline_axis` of
        size `pipeline_stages` (S). The stacked block params are sharded
        over that axis (parallel/pipeline.py), so this device's "blocks"
        leaves hold its L/S consecutive layers. The local batch splits into
        M = `pipeline_microbatches` microbatches; a lax.scan over
        M + S - 1 ticks rotates activations stage→stage+1 with ppermute:
        stage 0 ingests microbatch t at tick t, stage p processes
        microbatch t-p, the last stage writes finished microbatches into
        the output buffer, which a psum over the stage axis then broadcasts
        to every stage (transposing to the exact reverse pipeline under
        autodiff — jax differentiates ppermute/psum, so the backward IS the
        GPipe backward schedule, no hand scheduling). Bubble fraction
        (S-1)/(M+S-1).

        The reference has no model parallelism of any kind (SURVEY §2.8);
        this axis composes with 'data' on a 2-D mesh.
        """
        S = self.pipeline_stages
        M = self.pipeline_microbatches
        axis = self.pipeline_axis
        B, T, D = x.shape
        if B % M:
            raise ValueError(
                f"local batch {B} not divisible by microbatches {M}"
            )
        mb = B // M
        local_L = self.num_layers // S
        stage = jax.lax.axis_index(axis)
        bm_local = jax.lax.dynamic_slice(
            binary_mask, (stage * local_L,), (local_L,)
        )
        x_mbs = x.reshape(M, mb, T, D)
        mask_mbs = key_mask.reshape(M, mb, T)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(mdl, carry, t):
            cur, out = carry
            m = t - stage  # the microbatch this stage works on at tick t
            inp = jax.lax.dynamic_index_in_dim(
                x_mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            cur = jnp.where(stage == 0, inp, cur)
            m_c = jnp.clip(m, 0, M - 1)
            mask_m = jax.lax.dynamic_index_in_dim(
                mask_mbs, m_c, 0, keepdims=False
            )
            y, _ = ScanBlocks(**block_kwargs, name="blocks")(
                cur, bm_local, pos, mask_m, pair_mask
            )
            # bubble ticks (m outside [0, M)) compute finite garbage that is
            # neither written nor differentiated into anything
            write_ok = (stage == S - 1) & (m >= 0) & (m < M)
            out = jnp.where(
                write_ok,
                jax.lax.dynamic_update_index_in_dim(out, y, m_c, 0),
                out,
            )
            nxt = jax.lax.ppermute(y, axis, perm)
            return (nxt, out), None

        TickScan = nn.scan(
            tick,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=M + S - 1,
        )
        carry0 = (jnp.zeros((mb, T, D), x.dtype), jnp.zeros_like(x_mbs))
        (_, out), _ = TickScan(self, carry0, jnp.arange(M + S - 1))
        # finished microbatches live on the last stage only (zeros
        # elsewhere): psum broadcasts them to every stage, and its autodiff
        # transpose psums the S identical loss replicas' cotangents back
        # onto the last stage — see parallel/pipeline.py for the 1/S loss
        # scaling that makes the sum come out to the true cotangent.
        out = jax.lax.psum(out, axis)
        return out.reshape(B, T, D)
