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


def _kernel(x0_ref, x1_ref, x2_ref, x3_ref, packed_ref, alpha_ref, out_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    u = pltpu.bitcast(packed_ref[:], jnp.uint8).astype(jnp.int32)
    for j, x_ref in enumerate((x0_ref, x1_ref, x2_ref, x3_ref)):
        w = (((u >> (2 * j)) & 0x3) - 1).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(
            x_ref[:], w, preferred_element_type=jnp.float32
        )

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * alpha_ref[0, 0]).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k4", "interpret"),
)
def ternary_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    packed: jnp.ndarray,  # [K//4, N] int8 planar (pack_planar)
    alpha: jnp.ndarray,  # scalar scale
    block_m: int = 256,
    block_n: int = 512,
    block_k4: int = 512,  # packed rows per block (= K/4 granularity)
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (alpha * unpack_planar(packed)) with in-kernel unpacking → f32."""
    M, K = x.shape
    K4, N = packed.shape
    if K4 * 4 != K:
        raise ValueError(f"packed K {K4 * 4} != x K {K}")
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k4 = min(block_k4, K4)
    if M % block_m or N % block_n or K4 % block_k4:
        raise ValueError(
            f"shapes M={M},K4={K4},N={N} not divisible by blocks "
            f"({block_m},{block_k4},{block_n})"
        )
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    nk4 = K4 // block_k4  # number of K-blocks

    # plane j, K-chunk k of x = columns [j*K4 + k*block_k4, +block_k4)
    def x_spec(j):
        return pl.BlockSpec(
            (block_m, block_k4),
            lambda i, n, k, j=j: (i, (j * K4) // block_k4 + k),
            memory_space=pltpu.VMEM,
        )

    grid = (M // block_m, N // block_n, nk4)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            x_spec(0),
            x_spec(1),
            x_spec(2),
            x_spec(3),
            pl.BlockSpec(
                (block_k4, block_n), lambda i, n, k: (k, n),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, n, k: (i, n),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + K * N // 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*([x.astype(jnp.bfloat16)] * 4), packed, alpha2d)


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
