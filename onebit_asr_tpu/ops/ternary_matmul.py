"""Packed-ternary matmul — Pallas TPU kernel + XLA fallback.

Inference/serving path (BASELINE.json config 4/5): ternary weights live in
HBM as packed int8 — four 2-bit weights per byte — and are unpacked to bf16
tiles in VMEM on the fly, so HBM weight traffic is 8x smaller than bf16 and
4x smaller than int8. For the memory-bound regimes that dominate serving
(small batch, large K·N) the kernel's roofline is set by that traffic;
compute-bound shapes still ride the MXU at full rate.

PLANAR layout (chosen for the TPU): weight rows are split into 4 contiguous
K-planes and byte i of `packed[K//4, N]` holds rows {i, i+K/4, i+K/2,
i+3K/4} in its 2-bit slots (slot j = plane j, storing q+1 ∈ {0,1,2}).
In-kernel unpacking is then pure VPU elementwise (shift/and/sub — NO
sublane interleave/reshape, which Mosaic lowers poorly) followed by four
MXU dots against four contiguous x column-chunks.

Tiling: the activation block keeps the FULL K dimension in VMEM (ASR dims:
K ≤ a few thousand → ≤ a couple MB per block), which satisfies the Mosaic
rule that block minor dims be (8,128)-divisible or span the whole array;
the grid tiles M and N only. The 2-bit weight block is (K/4, block_n).

The quantized TRAINING path deliberately stays with fake-quant einsum on
bf16 (quantize_weight + jnp.dot): the STE backward needs W/alpha anyway and
XLA already fuses the dequant elementwise into the matmul.

Storage/shipping across a mesh uses the same 2-bit density via
ops/quant.py's pack_ternary/unpack_ternary (interleaved layout, layout-
compatible with generic serialization); `pack_planar`/`unpack_planar` here
are the matmul-operand layout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_planar(q: jnp.ndarray) -> jnp.ndarray:
    """Ternary [K, N] {-1,0,1} → planar-packed [K//4, N] int8."""
    K, N = q.shape
    if K % 4:
        raise ValueError(f"K={K} not a multiple of 4")
    u = (q.astype(jnp.int8) + 1).astype(jnp.uint8).reshape(4, K // 4, N)
    byte = u[0] | (u[1] << 2) | (u[2] << 4) | (u[3] << 6)
    return jax.lax.bitcast_convert_type(byte, jnp.int8)


def unpack_planar(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_planar → float32 [K, N] in {-1, 0, +1}."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    planes = [((u >> (2 * j)) & 0x3).astype(jnp.float32) - 1.0 for j in range(4)]
    return jnp.concatenate(planes, axis=0)


def _kernel(x_ref, packed_ref, alpha_ref, out_ref):
    # grid (M/bm, N/bn); x block [bm, K] spans all of K
    K4 = packed_ref.shape[0]
    u = pltpu.bitcast(packed_ref[:], jnp.uint8).astype(jnp.int32)  # [K4, bn]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(4):
        w = (((u >> (2 * j)) & 0x3) - 1).astype(jnp.bfloat16)  # [K4, bn]
        acc += jnp.dot(
            x_ref[:, j * K4 : (j + 1) * K4], w,
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = (acc * alpha_ref[0, 0]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def ternary_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    packed: jnp.ndarray,  # [K//4, N] int8 planar (pack_planar)
    alpha: jnp.ndarray,  # scalar scale
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (alpha * unpack_planar(packed)) with in-kernel unpacking → f32."""
    M, K = x.shape
    K4, N = packed.shape
    if K4 * 4 != K:
        raise ValueError(f"packed K {K4 * 4} != x K {K}")
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    if M % block_m or N % block_n:
        raise ValueError(
            f"M={M},N={N} not divisible by blocks ({block_m},{block_n})"
        )
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))

    grid = (M // block_m, N // block_n)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_m, K), lambda i, n: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K4, block_n), lambda i, n: (0, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, n: (i, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed, alpha2d)


def ternary_matmul_any_m(
    x: jnp.ndarray,  # [M, K], any M
    packed: jnp.ndarray,  # [K//4, N] planar
    alpha: jnp.ndarray,
    block_n: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """ternary_matmul for arbitrary M (activations): pads M up to a block
    multiple, runs the kernel, slices back. N must satisfy the lane tiling
    (model dims are chosen TPU-friendly). `interpret=None` follows the
    backend (interpret on CPU), like the other Pallas ops — so the packed
    serving path works off-TPU too."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    K4, N = packed.shape
    block_m = 128 if M > 32 else 8
    pad = (-M) % block_m
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = ternary_matmul(
        x, packed, alpha,
        block_m=block_m,
        block_n=min(block_n, N),
        interpret=interpret,
    )
    return out[:M] if pad else out


def ternary_matmul_reference(
    x: jnp.ndarray, packed: jnp.ndarray, alpha: jnp.ndarray
) -> jnp.ndarray:
    """XLA fallback / golden: unpack to dense then one bf16 dot."""
    w = unpack_planar(packed)
    return (
        jnp.dot(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * alpha.astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# W2A8: int8 activations x ternary weights on the MXU integer path.
#
# The bf16 kernel above wins on weight TRAFFIC (8x); this variant also
# halves activation traffic and rides the MXU's int8 mode (2x the bf16
# peak on v5e: 394 vs 197 TOP/s), the right regime for compute-bound
# serving shapes (Conformer-M packed serving measured compute-bound,
# docs/RESULTS.md). Activations quantize per-ROW (dynamic absmax/127 —
# one scale per token, the standard W8A8 recipe); weights unpack to
# {-1,0,+1} int8 in VMEM; the dot accumulates int32 exactly, so the ONLY
# approximation is the activation rounding. Opt-in because it is lossy:
# eval --packed --int8_act reports the measured WER delta.
# ---------------------------------------------------------------------------


def quantize_activations_int8(x: jnp.ndarray):
    """Per-row symmetric int8: returns (q [M,K] int8, scale [M,1] f32),
    x ≈ q * scale. Zero rows get scale eps (q all-zero, exact)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _kernel_w2a8(xq_ref, scale_ref, packed_ref, alpha_ref, out_ref):
    # grid (M/bm, N/bn); xq block [bm, K] int8 spans all of K
    K4 = packed_ref.shape[0]
    u = pltpu.bitcast(packed_ref[:], jnp.uint8).astype(jnp.int32)  # [K4, bn]
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for j in range(4):
        w = (((u >> (2 * j)) & 0x3) - 1).astype(jnp.int8)  # [K4, bn]
        acc += jnp.dot(
            xq_ref[:, j * K4 : (j + 1) * K4], w,
            preferred_element_type=jnp.int32,
        )
    out_ref[:] = (
        acc.astype(jnp.float32) * scale_ref[:] * alpha_ref[0, 0]
    ).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def ternary_matmul_w2a8(
    x: jnp.ndarray,  # [M, K] bf16/f32 (quantized per-row inside)
    packed: jnp.ndarray,  # [K//4, N] int8 planar (pack_planar)
    alpha: jnp.ndarray,  # scalar weight scale
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(int8-rounded x) @ (alpha * unpack_planar(packed)) → f32.

    Integer accumulation is exact; output = ternary_matmul_w2a8_reference
    bit-for-bit. Differs from the f32 product only by the per-row int8
    activation rounding."""
    M, K = x.shape
    K4, N = packed.shape
    if K4 * 4 != K:
        raise ValueError(f"packed K {K4 * 4} != x K {K}")
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    if M % block_m or N % block_n:
        raise ValueError(
            f"M={M},N={N} not divisible by blocks ({block_m},{block_n})"
        )
    xq, scale = quantize_activations_int8(x)
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    grid = (M // block_m, N // block_n)
    return pl.pallas_call(
        _kernel_w2a8,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_m, K), lambda i, n: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_m, 1), lambda i, n: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K4, block_n), lambda i, n: (0, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, n: (i, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, scale, packed, alpha2d)


def ternary_matmul_w2a8_any_m(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    alpha: jnp.ndarray,
    block_n: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """ternary_matmul_w2a8 for arbitrary M (pads M, slices back)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    K4, N = packed.shape
    block_m = 128 if M > 32 else 8
    pad = (-M) % block_m
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = ternary_matmul_w2a8(
        x, packed, alpha,
        block_m=block_m,
        block_n=min(block_n, N),
        interpret=interpret,
    )
    return out[:M] if pad else out


def ternary_matmul_w2a8_reference(
    x: jnp.ndarray, packed: jnp.ndarray, alpha: jnp.ndarray
) -> jnp.ndarray:
    """XLA golden for the W2A8 kernel: same int8 rounding, exact integer
    math — the kernel must match this bit-for-bit."""
    xq, scale = quantize_activations_int8(x)
    w = unpack_planar(packed).astype(jnp.int8)
    acc = jnp.dot(
        xq.astype(jnp.int32), w.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * scale * alpha.astype(jnp.float32)


def int8_act_enabled() -> bool:
    """Trace-time routing flag for the packed serving path: when
    ONEBIT_PACKED_INT8_ACT=1 (set by `eval --int8_act`), QuantDense's
    packed branch uses the W2A8 kernel instead of the bf16-unpack kernel.
    Follows the repo's env-at-trace-time convention (ONEBIT_CTC_PALLAS,
    BENCH_FUSED...) to avoid threading a serving-only flag through every
    module signature."""
    import os

    return os.environ.get("ONEBIT_PACKED_INT8_ACT", "0") == "1"
