"""Shared building blocks: quantized dense, masked norms, positional tables.

TPU-first counterparts of the reference's `QuantizedLinear`
(/root/reference/onebit_asr/quant.py:99-127) and the norm layers used by the
Conformer (/root/reference/onebit_asr/conformer.py:19-24, 141-167).

Design notes (vs the torch original):

- `QuantDense` keeps its weight in float32 (optimizer-friendly) and quantizes
  at call time with the custom-VJP STE quantizer; the dequantized weight is
  cast to the layer's `compute_dtype` (bfloat16 by default) so the matmul
  lands on the MXU at full rate while alpha-gradient math stays in f32.
- `bits` is a per-call argument, never module state, exactly like the
  reference's runtime `bitwidth` argument (quant.py:120) — one parameter set
  serves 1-bit / ternary / fp32 branches in one step. It may also be a traced
  boolean so a scanned layer stack can mix precisions per layer (the
  stochastic-precision branch) inside a single compiled graph.
- `MaskedBatchNorm` computes batch statistics over VALID frames only. The
  reference normalizes over padded frames with `BatchNorm1d(
  track_running_stats=False)` (conformer.py:157-160) and never passes a mask
  (conformer.py:225) — identified in SURVEY.md as NaN/batch-size-bug suspect
  #1. Computing masked statistics fixes it by construction while keeping the
  reference's batch-statistics semantics (no running stats in eval).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from onebit_asr_tpu.ops.quant import BitSpec, quantize_weight

Dtype = Any


def _kaiming_x2(key, shape, dtype=jnp.float32):
    # kaiming_uniform(a=sqrt(5)) as torch Linear default, then x2
    # (reference quant.py:104-108).
    fan_in = shape[0]
    gain = np.sqrt(2.0 / (1.0 + 5.0))  # leaky_relu gain, a=sqrt(5)
    bound = gain * np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound) * 2.0


class QuantParams(nn.Module):
    """Parameter holder with `QuantDense`'s exact variable layout and
    initializers (kernel kaiming×2, alpha mean|W|, bias zeros — reference
    quant.py:104-118), declared in the same order so per-param init RNG
    streams match. Lets a caller fetch the raw (kernel, alpha, bias) of
    several logical projections, quantize each with its own alpha, and run
    ONE concatenated GEMM — checkpoints stay interchangeable with stacks of
    individual `QuantDense` layers (used by RelPosMHSA's fused QKV path)."""

    in_features: int
    features: int
    use_bias: bool = True
    per_channel: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _kaiming_x2, (self.in_features, self.features)
        )
        if self.per_channel:
            alpha = self.param(
                "alpha", lambda key: jnp.mean(jnp.abs(kernel), axis=0)
            )
        else:
            alpha = self.param(
                "alpha", lambda key: jnp.mean(jnp.abs(kernel)).reshape(())
            )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, alpha, bias


class QuantDense(nn.Module):
    """Dense layer whose weight is binary/ternary-quantized with learnable alpha.

    Reference: `QuantizedLinear` (quant.py:99-127) — weight kaiming-init
    scaled x2 so |W/alpha| mostly exceeds the ternary threshold 0.5
    (quant.py:104-108), alpha initialized to mean|W| (quant.py:110-113),
    bias full-precision (quant.py:115-118).

    `packed=True` switches to the inference-only serving path: the weight is
    a planar-packed 2-bit int8 buffer (4 weights/byte) fed to the Pallas
    packed-ternary matmul — 8x less weight HBM traffic than bf16 (BASELINE
    config 4). Parameters come from `model.packed.export_packed_params`.
    """

    features: int
    use_bias: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    packed: bool = False
    per_channel: bool = False  # alpha per output channel (BitNet-style
    # absmean generalization; reference is tensor-wise)

    @nn.compact
    def __call__(self, x: jnp.ndarray, bits: BitSpec) -> jnp.ndarray:
        in_features = x.shape[-1]
        if self.packed:
            from onebit_asr_tpu.ops.quant import ALPHA_EPS
            from onebit_asr_tpu.ops.ternary_matmul import (
                int8_act_enabled,
                ternary_matmul_any_m,
                ternary_matmul_w2a8_any_m,
            )

            packed_kernel = self.param(
                "packed_kernel",
                nn.initializers.zeros_init(),
                (in_features // 4, self.features),
                jnp.int8,
            )
            alpha = self.param("alpha", nn.initializers.ones_init(), ())
            lead = x.shape[:-1]
            # W2A8 (opt-in, ONEBIT_PACKED_INT8_ACT=1 / eval --int8_act):
            # per-row int8 activations onto the MXU integer path (2x bf16
            # peak) — lossy only in the activation rounding
            matmul = (
                ternary_matmul_w2a8_any_m
                if int8_act_enabled()
                else ternary_matmul_any_m
            )
            y = matmul(
                x.reshape(-1, in_features).astype(self.compute_dtype),
                packed_kernel,
                jnp.abs(alpha.astype(jnp.float32)) + ALPHA_EPS,
            ).reshape(*lead, self.features)
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros_init(), (self.features,)
                )
                y = y + bias
            return y.astype(self.compute_dtype)

        kernel = self.param(
            "kernel", _kaiming_x2, (in_features, self.features)
        )
        if self.per_channel:
            alpha = self.param(
                "alpha",
                lambda key: jnp.mean(jnp.abs(kernel), axis=0),
            )
        else:
            alpha = self.param(
                "alpha",
                lambda key: jnp.mean(jnp.abs(kernel)).reshape(()),
            )
        w = quantize_weight(kernel, alpha, bits)  # f32 in, f32 out
        y = jnp.dot(
            x.astype(self.compute_dtype),
            w.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + bias
        return y.astype(self.compute_dtype)


_DROPOUT_PACK_BITS = True


def set_dropout_pack_bits(enabled: bool) -> None:
    """Trace-time toggle: save dropout masks BIT-PACKED across remat
    boundaries (1 bit/element instead of the 1 byte/element draw — 8x
    fewer saved-mask bytes under remat policies that save
    "dropout_bits").

    DEFAULT ON since round 5: measured on chip at the bench of record it
    is the single biggest HBM-bytes lever — 90.5 -> 77.6 GB/dispatch and
    285.1 -> 319.2 utt/s/chip (+12%, MFU 19.7% -> 22.2%); see
    docs/RESULTS.md round 5. bench.py BENCH_DROPOUT_PACK=0 measures the
    unpacked baseline.

    Mask-identical by construction: the same byte draws and the same
    >=k threshold produce the same boolean mask; packing only changes
    WHAT is stored for the backward (the packed mask) and adds cheap
    VPU shift/mask ops to repack/unpack (pinned by
    tests/test_model.py::test_dropout_pack_bits_is_mask_identical).
    A process-global rather than a config plumbed through all 13
    dropout sites because it cannot change numerics — only the remat
    schedule; read at TRACE time, so set it before jit tracing."""
    global _DROPOUT_PACK_BITS
    _DROPOUT_PACK_BITS = bool(enabled)


class FastDropout(nn.Module):
    """Dropout from 8-bit random draws — the measured mask-generation fix.

    `nn.Dropout` draws a full 32-bit word per element; at this model's
    scale (~0.6B mask elements per 3-branch step, regenerated under remat
    in the backward) mask generation alone measured ~29 ms of a 108 ms
    step on v5e (bench.py ablation, BENCH_DROPOUT=0). A uint8 draw needs
    1/4 the PRNG words and 1/4 the HBM traffic for identical dropout
    semantics with the drop rate quantized to k/256 (k = round(rate*256));
    the keep-scale uses the exact realized probability (256-k)/256, so
    E[output] == input exactly, as with float-threshold dropout.
    """

    rate: float
    deterministic: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic or self.rate <= 0.0:
            return x
        k = int(round(self.rate * 256))
        if k <= 0:
            return x
        if k >= 256:
            return jnp.zeros_like(x)
        keep_p = (256 - k) / 256.0
        # Draw uint32 WORDS and split each into 4 iid uniform bytes, rather
        # than asking the generator for uint8 directly: XLA's
        # rng-bit-generator charges one 32-bit generator word per OUTPUT
        # ELEMENT regardless of element width, so a native-uint8 request
        # wastes 3/4 of the RNG throughput. All bits of a counter-based
        # generator word are iid uniform, so byte-slicing preserves exact
        # Bernoulli(k/256) semantics (any fixed byte->element bijection
        # does). The draw is SHAPED: words [..., ceil(L/4)] bitcast to
        # bytes [..., ceil(L/4), 4], minor-merged and sliced to [..., L].
        # A flat draw + reshape to x.shape was measured at 3.09 ms vs
        # 0.182 ms per 12.5M-element attention-prob site on v5e: for
        # lane-unaligned trailing dims (T=255) the flat->tiled uint8
        # relayout dominated the whole step's "dropout cost" (~35 of the
        # 37 ms dropout-on/off delta came from these relayouts, x12
        # layers), while the shaped draw's minor-dim merge is free.
        L = int(x.shape[-1])
        q = (L + 3) // 4
        lead = tuple(int(d) for d in x.shape[:-1])
        words = jax.random.bits(
            self.make_rng("dropout"), lead + (q,), jnp.uint32
        )
        bits = jax.lax.bitcast_convert_type(words, jnp.uint8)
        bits = bits.reshape(lead + (4 * q,))[..., :L]
        # named so remat_policy="masks" can SAVE the drawn bytes: RNG runs
        # at ~3 Gwords/s on v5e (measured) while reloading uint8 masks costs
        # ~1/50 of that in HBM time — regenerating ~0.6 GB of mask bytes in
        # the backward is pure waste
        scale = jnp.asarray(1.0 / keep_p, x.dtype)
        if _DROPOUT_PACK_BITS:
            # Bit-packed saved masks: threshold FIRST (uniform bytes:
            # P(bits >= k) = (256-k)/256), then pack the boolean mask 8
            # elements per byte and give the PACKED tensor the
            # "dropout_bits" checkpoint name — remat policies that save
            # dropout state now store 1/8 the bytes, and the backward
            # recomputes only the unpack (VPU shifts) instead of either
            # re-generating draws or loading full-width masks.
            keep = bits >= k
            q8 = (L + 7) // 8
            pad = 8 * q8 - L
            if pad:
                keep = jnp.pad(keep, [(0, 0)] * (keep.ndim - 1) + [(0, pad)])
            weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
            packed = jnp.sum(
                keep.reshape(lead + (q8, 8)).astype(jnp.uint8) * weights,
                axis=-1, dtype=jnp.uint8,
            )
            packed = checkpoint_name(packed, "dropout_bits")
            unpacked = (
                (packed[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            ).reshape(lead + (8 * q8,))[..., :L]
            return jnp.where(
                unpacked.astype(bool), x * scale, jnp.zeros((), x.dtype)
            )
        bits = checkpoint_name(bits, "dropout_bits")
        # uniform over 0..255: P(bits >= k) = (256-k)/256
        return jnp.where(bits >= k, x * scale, jnp.zeros((), x.dtype))


def torch_bias_init(fan_in: int):
    """torch's Conv/Linear default bias init: U(-1/sqrt(fan_in), +1/sqrt(
    fan_in)). NOT cosmetic parity — the subsampler MUST have nonzero
    biases. With flax's zeros-init, a SpecAugment-blanked (exactly-zero)
    frame maps to an exactly-zero row out of conv1/conv2/proj, every
    downstream per-frame LayerNorm sees ZERO channel variance and outputs
    its (zero-init) bias — another zero row — so the rsqrt(eps)≈316
    backward gain compounds through the whole stack. Full-context
    attention re-diversifies such rows with non-blank keys after block 0;
    a CHUNKED-attention query whose entire visible window is blanked is
    never rescued, and at 12 layers the compounded gain overflows bf16 →
    NaN step (root-caused round 4; the round-2 time-mask cap cannot help
    because a ≤100-frame mask fully covers an early chunk's 64-raw-frame
    window). A channel-diverse bias gives the first LayerNorm O(1/fan_in)
    variance to normalize to unit scale, killing the mechanism at the
    source — exactly why the torch reference (default inits,
    conformer.py:170-208) never exhibits this NaN class."""
    bound = 1.0 / np.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """Full-precision dense with bf16 compute, f32 params/accumulation."""

    features: int
    use_bias: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    torch_bias: bool = False  # torch_bias_init (see above) vs zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        y = jnp.dot(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias_init = (
                torch_bias_init(x.shape[-1]) if self.torch_bias
                else nn.initializers.zeros_init()
            )
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y.astype(self.compute_dtype)


class LayerNorm(nn.Module):
    """LayerNorm computed in f32 regardless of activation dtype."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (dim,))
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(dtype)


class MaskedBatchNorm(nn.Module):
    """Batch normalization over valid (unpadded) frames only.

    Fixes the reference's BN-over-pads defect (conformer.py:157-160, 225):
    statistics are computed per channel over all valid [B,T] positions, in
    f32, with a variance floor so tiny batches can't produce NaN. Matches the
    reference's `track_running_stats=False` semantics (batch stats at eval
    too), which keeps train/eval parity trivially correct under jit.

    `axis_name`: sync-BN for shard_map SPMD. Under jit/GSPMD a batch-dim
    sharding makes XLA psum these reductions automatically (global-batch
    statistics, reference-exact); under shard_map the module only sees its
    LOCAL shard, so the statistics sums must psum explicitly over the data
    axis to compute the same numbers. Same two-pass arithmetic, three tiny
    [C]-sized collectives.
    """

    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]; frame_mask: [B, T] (1 = valid)
        dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (dim,))
        bias = self.param("bias", nn.initializers.zeros_init(), (dim,))
        x32 = x.astype(jnp.float32)
        m = frame_mask.astype(jnp.float32)[..., None]  # [B,T,1]
        n = jnp.sum(m)
        s1 = jnp.sum(x32 * m, axis=(0, 1))  # [C]
        if self.axis_name is not None:
            n = jax.lax.psum(n, self.axis_name)
            s1 = jax.lax.psum(s1, self.axis_name)
        n = jnp.maximum(n, 1.0)
        mean = s1 / n  # [C]
        sq = jnp.sum(jnp.square(x32 - mean) * m, axis=(0, 1))
        if self.axis_name is not None:
            sq = jax.lax.psum(sq, self.axis_name)
        var = sq / n
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return ((y * scale + bias) * m).astype(dtype)


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics cover VALID frames only.

    Per (utterance, group): mean/var over valid [T] positions and the
    group's channels, in f32. Unlike `nn.GroupNorm` (which reduces over the
    full padded T), padding cannot perturb the statistics — the same
    defect-class fix as MaskedBatchNorm, applied to the per-sample variant
    used under data parallelism (no cross-batch reduction → no per-layer
    collective)."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T, C]; frame_mask: [B, T] (1 = valid)
        dtype = x.dtype
        B, T, C = x.shape
        G = self.num_groups
        if C % G:
            raise ValueError(f"channels {C} not divisible by groups {G}")
        scale = self.param("scale", nn.initializers.ones_init(), (C,))
        bias = self.param("bias", nn.initializers.zeros_init(), (C,))
        x32 = x.astype(jnp.float32).reshape(B, T, G, C // G)
        m = frame_mask.astype(jnp.float32)[:, :, None, None]  # [B,T,1,1]
        n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True) * (C // G), 1.0)
        mean = jnp.sum(x32 * m, axis=(1, 3), keepdims=True) / n  # [B,1,G,1]
        var = jnp.sum(jnp.square(x32 - mean) * m, axis=(1, 3), keepdims=True) / n
        y = ((x32 - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(B, T, C)
        return ((y * scale + bias) * frame_mask[..., None]).astype(dtype)


def rel_positional_encoding(length: int, d_model: int) -> np.ndarray:
    """Sinusoidal table over relative offsets [L-1 .. -(L-1)] → [2L-1, D].

    Row i encodes relative position (L-1-i), so row 0 is the most-positive
    offset and the center row is offset 0 — the layout `rel_shift` expects.
    The reference instead feeds absolute-style positions 0..T-1 ("legacy
    ESPnet", conformer.py:55-76); the full 2T-1 relative range is the modern
    equivalent with strictly more positional information.
    """
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    table = np.zeros((2 * length - 1, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table.astype(np.float32)


def abs_positional_encoding(length: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal absolute positions 0..L-1 → [L, D]."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    table = np.zeros((length, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table.astype(np.float32)


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths → [B, max_len] bool mask (True = valid)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]
