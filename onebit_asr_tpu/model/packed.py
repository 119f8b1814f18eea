"""Export trained QAT params → packed-ternary inference params.

BASELINE config 4 ("Conformer-L inference with packed-ternary Pallas
matmuls"): after QAT, every encoder QuantDense weight is projected onto
{-1,0,+1} (ternary) or {-1,+1} (binary) exactly as the training-time
quantizer forward does (ops/quant.py, mirroring reference quant.py:49-70),
then planar-packed to int8 (4 weights/byte). The resulting pytree drops
into `ConformerASR.from_config(cfg, packed=True)` — same module tree, with
`kernel` replaced by `packed_kernel`.

QuantDense subtrees are identified structurally: a dict holding both
"kernel" and "alpha" (full-precision `Dense` layers have no alpha).
Scanned block stacks ([L, K, N] kernels) pack via vmap.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from onebit_asr_tpu.ops.quant import ALPHA_EPS
from onebit_asr_tpu.ops.ternary_matmul import pack_planar


def _project(kernel: jnp.ndarray, alpha: jnp.ndarray, binary: bool) -> jnp.ndarray:
    """Training-forward projection (reference quant.py:49-60) → {-1,0,+1}."""
    a = jnp.abs(alpha.astype(jnp.float32)) + ALPHA_EPS
    # scanned stacks carry per-layer alpha [L] against kernel [L, K, N]
    a = a.reshape(a.shape + (1,) * (kernel.ndim - a.ndim))
    wa = jnp.clip(kernel.astype(jnp.float32) / a, -1.0, 1.0)
    if binary:
        return jnp.where(wa >= 0, 1.0, -1.0)
    return jnp.where(jnp.abs(wa) < 0.5, 0.0, jnp.sign(wa))


def export_packed_params(params: Any, precision: int = 2) -> Any:
    """params pytree (training) → packed pytree (inference).

    precision 2 → ternary, 1 → binary (packed in the same 2-bit planar
    format; binary simply never emits the 0 code)."""
    if precision not in (1, 2):
        raise ValueError(f"precision must be 1 or 2, got {precision}")
    binary = precision == 1

    def rec(node):
        if isinstance(node, dict):
            if "kernel" in node and "alpha" in node:
                kernel, alpha = node["kernel"], node["alpha"]
                if alpha.ndim and alpha.shape[-1] == kernel.shape[-1]:
                    raise NotImplementedError(
                        "packed export requires tensor-wise alpha; "
                        "per-channel scales need a vector-alpha kernel "
                        "(see ModelConfig.quant_per_channel docs)"
                    )
                q = _project(kernel, alpha, binary)
                if q.ndim == 3:  # scanned stack [L, K, N]
                    packed = jax.vmap(pack_planar)(q)
                else:
                    packed = pack_planar(q)
                out = {"packed_kernel": packed, "alpha": alpha}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(jax.tree.map(lambda x: x, params))  # copy structure
