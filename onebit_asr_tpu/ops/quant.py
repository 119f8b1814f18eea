"""Binary / ternary weight quantization with learnable tensor-wise scale.

Functional JAX re-design of the reference quantizer
(`/root/reference/onebit_asr/quant.py:38-96`):

forward  (quant.py:49-70):
    Wa  = W / alpha                      (alpha scalar, tensor-wise)
    Wac = clip(Wa, -1, 1)
    1-bit:  Q = sign(Wac), zeros -> +1
    2-bit:  Q = 0 where |Wac| < 0.5 else sign(Wac)   (ternary, "1.58-bit")
    W_hat = alpha * Q

backward (quant.py:81-91):
    dL/dW     = g * 1[|Wa| <= 1]                       (STE)
    dL/dalpha = sum( g * term ),  term = -Wa + Q   if |Wa| < 1
                                         sign(Wa)  otherwise      ("Eq. (3)")

TPU-first design decisions (vs. the torch original):

- The quantizer is a `jax.custom_vjp` over pure arrays — no mutable module
  state, so it composes with jit/vmap/pjit/remat.
- `binary` (1-bit vs ternary) can be a *traced* boolean, so a single compiled
  graph serves the stochastic-precision branch where each layer's bitwidth is
  sampled per step (reference resamples a Python list per step and re-traces
  nothing because torch is eager; under jit we must select, not branch).
- All scale math runs in float32 even when the surrounding network computes
  in bfloat16; together with the epsilon-floored |alpha| this removes the NaN
  blowups the reference README documents as an open defect (README.md:17-18).
"""

from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp

ALPHA_EPS = 1e-8  # matches reference quant.py:124
# Hard ceiling on |W/alpha| fed to the backward term. The reference leaves
# d/dalpha unbounded (quant.py:91); bounding the *inputs* (clip below) plus
# f32 accumulation makes alpha's gradient finite by construction.
_WA_CLIP_BWD = 4.0


def _sign_nonzero(x: jnp.ndarray) -> jnp.ndarray:
    """sign() with sign(0) := +1 (reference convention, quant.py:53-55)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _project(wa_clipped: jnp.ndarray, binary: jnp.ndarray) -> jnp.ndarray:
    """Project clipped W/alpha onto {-1,+1} (binary) or {-1,0,+1} (ternary)."""
    q_bin = _sign_nonzero(wa_clipped)
    q_ter = jnp.where(jnp.abs(wa_clipped) < 0.5, 0.0, jnp.sign(wa_clipped))
    return jnp.where(binary, q_bin, q_ter.astype(wa_clipped.dtype))


def _align_alpha(alpha: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Broadcast alpha against w: scalar () = tensor-wise (reference);
    trailing dim matching w's output dim = per-channel; a leading stacked
    [L] axis (scanned layers) is aligned from the left."""
    if alpha.ndim == 0:
        return alpha
    if alpha.shape[-1] == w.shape[-1]:
        # per-channel (possibly with leading stack dims): pad middle axes
        lead = alpha.shape[:-1]
        return alpha.reshape(lead + (1,) * (w.ndim - len(lead) - 1) + alpha.shape[-1:])
    # per-layer stack [L...] aligned left
    return alpha.reshape(alpha.shape + (1,) * (w.ndim - alpha.ndim))


@jax.custom_vjp
def quantize_ste(w: jnp.ndarray, alpha: jnp.ndarray, binary: jnp.ndarray) -> jnp.ndarray:
    """STE-quantize `w` with scale `alpha` (>0). `binary` selects 1-bit vs ternary.

    `alpha` is scalar (tensor-wise, reference semantics) or per-channel
    ([out_features], broadcast over the input dim). All three arguments may
    be traced; `binary` is a scalar bool array. Returns alpha * Q in float32.
    """
    w32 = w.astype(jnp.float32)
    a32 = _align_alpha(alpha.astype(jnp.float32), w32)
    wa = w32 / a32
    q = _project(jnp.clip(wa, -1.0, 1.0), binary)
    return a32 * q


def _quantize_fwd(w, alpha, binary):
    w32 = w.astype(jnp.float32)
    a32 = _align_alpha(alpha.astype(jnp.float32), w32)
    wa = w32 / a32
    q = _project(jnp.clip(wa, -1.0, 1.0), binary)
    return a32 * q, (wa, binary, alpha.shape)


def _quantize_bwd(res, g):
    wa, binary, alpha_shape = res
    g = g.astype(jnp.float32)
    wa = jnp.clip(wa, -_WA_CLIP_BWD, _WA_CLIP_BWD)  # bound Eq.(3) inputs
    # STE: pass-through inside the clip range (reference quant.py:81-82).
    grad_w = g * (jnp.abs(wa) <= 1.0).astype(jnp.float32)
    # d/dalpha "Eq. (3)" (reference quant.py:84-91). Note the reference
    # backward uses plain sign() (0 -> 0) for the binary projection here,
    # unlike the forward's zeros->+1; we mirror that exactly.
    q_bwd = jnp.where(binary,
                      jnp.sign(wa),
                      jnp.where(jnp.abs(wa) >= 0.5, jnp.sign(wa), 0.0))
    term = jnp.where(jnp.abs(wa) < 1.0, -wa + q_bwd, jnp.sign(wa))
    full = g * term
    if len(alpha_shape) == 0:
        grad_alpha = jnp.sum(full)
    else:
        # reduce every broadcast axis, keep alpha's own axes
        aligned = _align_alpha(jnp.zeros(alpha_shape), wa)
        axes = tuple(
            i for i in range(full.ndim)
            if aligned.shape[i] == 1 and full.shape[i] != 1
        )
        grad_alpha = jnp.sum(full, axis=axes).reshape(alpha_shape)
    return grad_w, grad_alpha, None


quantize_ste.defvjp(_quantize_fwd, _quantize_bwd)


BitSpec = Union[int, jnp.ndarray]
#   int 1 / 2 / 32             -> static bitwidth (compile-time branch)
#   bool array (traced scalar) -> True = 1-bit, False = ternary; lets the
#                                 stochastic-precision branch pick per layer
#                                 inside one compiled graph.


def quantize_weight(w: jnp.ndarray, alpha: jnp.ndarray, bits: BitSpec) -> jnp.ndarray:
    """Quantize a weight tensor per `bits`; 32 is a full-precision passthrough.

    `alpha` is used as |alpha| + eps so the scale can never hit zero
    (reference quant.py:124), with gradients flowing through the abs.
    Scalar alpha = tensor-wise (reference); [out_features] = per-channel.
    """
    if isinstance(bits, int):
        if bits == 32:
            return w
        if bits not in (1, 2):
            raise ValueError(f"bits must be 1, 2 or 32, got {bits}")
        binary = jnp.asarray(bits == 1)
    else:
        binary = bits
    alpha_safe = jnp.abs(alpha.astype(jnp.float32)) + ALPHA_EPS
    return quantize_ste(w, alpha_safe, binary).astype(w.dtype)


@partial(jax.jit, static_argnames=("block",))
def pack_ternary(q: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """Pack a ternary {-1,0,+1} matrix into int8, 4 weights per byte (2 bits each).

    Storage/shipping format for inference and for replicating weights across a
    mesh cheaply (BASELINE.json config 5). Each 2-bit slot stores (q+1) in
    {0,1,2}, little-endian within the byte along the last axis. Last axis
    length must be a multiple of `block`.
    """
    if q.shape[-1] % block:
        raise ValueError(f"last dim {q.shape[-1]} not a multiple of {block}")
    u = (q.astype(jnp.int8) + 1).astype(jnp.uint8)  # {0,1,2}
    u = u.reshape(*q.shape[:-1], q.shape[-1] // block, block)
    shifts = jnp.arange(block, dtype=jnp.uint8) * 2
    packed = jnp.sum(u << shifts, axis=-1).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(packed, jnp.int8)


@partial(jax.jit, static_argnames=("block",))
def unpack_ternary(packed: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """Inverse of `pack_ternary`; returns float32 {-1,0,+1}."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    shifts = jnp.arange(block, dtype=jnp.uint8) * 2
    vals = (u[..., None] >> shifts) & 0x3  # [..., n//block, block]
    q = vals.astype(jnp.float32) - 1.0
    return q.reshape(*packed.shape[:-1], packed.shape[-1] * block)
