"""Packed-ternary matmul — Pallas TPU kernel + XLA fallback.

Inference/serving path (BASELINE.json config 4/5): ternary weights live in
HBM as packed int8 — four 2-bit weights per byte (see ops/quant.py
pack_ternary) — and are unpacked to bf16 tiles in VMEM on the fly, so HBM
weight traffic is 8x smaller than bf16 and 4x smaller than int8. For the
memory-bound regimes that dominate serving (small batch, large K·N) the
kernel's roofline is set by that traffic, making it up to ~8x faster than a
bf16 einsum; compute-bound shapes still ride the MXU at full rate.

Layout: weights [K, N] packed along K → packed [K//4, N] int8, byte k//4
holds weights 4·(k//4)..4·(k//4)+3 in its 2-bit slots (little-endian), each
slot storing (q+1) ∈ {0,1,2}.

The quantized TRAINING path deliberately stays with fake-quant einsum on
bf16 (quantize_weight + jnp.dot): the STE backward needs W/alpha anyway and
XLA already fuses the dequant elementwise into the matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onebit_asr_tpu.ops.quant import pack_ternary, unpack_ternary


def pack_for_matmul(q: jnp.ndarray) -> jnp.ndarray:
    """Ternary weights [K, N] → packed [K//4, N] int8 (packed along K)."""
    return pack_ternary(q.T).T


def _unpack_block(packed: jnp.ndarray, bk4: int, bn: int) -> jnp.ndarray:
    """[bk4, bn] int8 → [bk4*4, bn] bf16 in {-1, 0, +1}.

    Slot j of byte i is weight row 4i+j: expand bytes along a new sublane
    axis with shifts, then collapse — a pure VPU shuffle-free pattern.
    """
    u = pltpu.bitcast(packed, jnp.uint8)  # [bk4, bn]
    shifts = jax.lax.broadcasted_iota(jnp.uint8, (bk4, 4, bn), 1) * 2
    vals = (u[:, None, :] >> shifts) & 0x3  # [bk4, 4, bn]
    q = vals.astype(jnp.bfloat16) - 1.0
    return q.reshape(bk4 * 4, bn)


def _ternary_matmul_kernel(x_ref, packed_ref, alpha_ref, out_ref, acc_ref):
    """Grid (M/bm, N/bn, K/bk); K innermost so the f32 accumulator lives in
    VMEM scratch across the K loop."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk4 = packed_ref.shape[0]
    bn = packed_ref.shape[1]
    w = _unpack_block(packed_ref[:], bk4, bn)  # [bk, bn] bf16
    acc_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * alpha_ref[0, 0]).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret"),
)
def ternary_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    packed: jnp.ndarray,  # [K//4, N] int8 (pack_ternary of ternary [K, N])
    alpha: jnp.ndarray,  # scalar scale
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ (alpha * unpack(packed)) with in-kernel unpacking. Returns f32."""
    M, K = x.shape
    K4, N = packed.shape
    if K4 * 4 != K:
        raise ValueError(f"packed K {K4 * 4} != x K {K}")
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    if M % block_m or N % block_n or K % block_k or block_k % 4:
        raise ValueError(
            f"shapes ({M},{K})x({N}) not divisible by blocks "
            f"({block_m},{block_k},{block_n})"
        )
    alpha2d = jnp.reshape(alpha.astype(jnp.float32), (1, 1))

    grid = (M // block_m, N // block_n, K // block_k)
    return pl.pallas_call(
        _ternary_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_m, block_k), lambda i, j, k: (i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_k // 4, block_n), lambda i, j, k: (k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, k: (i, j),
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
    )(x.astype(jnp.bfloat16), packed, alpha2d)


def ternary_matmul_reference(
    x: jnp.ndarray, packed: jnp.ndarray, alpha: jnp.ndarray
) -> jnp.ndarray:
    """XLA fallback / golden: unpack to dense then einsum."""
    w = unpack_ternary(packed.T).T  # unpack along K (stored transposed)
    return (
        jnp.dot(
            x.astype(jnp.bfloat16),
            (w.astype(jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        )
        * alpha.astype(jnp.float32)
    )
