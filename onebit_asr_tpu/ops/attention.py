"""Fused relative-position attention — Pallas TPU kernel with custom VJP.

The XLA path of `RelPosMHSA` (model/conformer.py) materializes a chain of
[B,H,T,*] tensors in HBM per layer: the [T,2T-1] position-score einsum, its
rel-shift (a misaligned pad-reshape-slice relayout — measured ~16 ms/step
across the 12-layer 3-branch encoder on v5e), content scores, their f32
sum, softmax, dropout — each written and re-read, plus reverse-mode
counterparts. Component-removal ablation put attention at ~60% of encoder
step time.

This kernel runs the WHOLE Transformer-XL attention per (head, batch) grid
cell in VMEM:

    qu = q + u;  qv = q + v_bias
    ac   = qu @ k^T                      (MXU)
    braw = qv @ p^T            [T, 2T-1] (MXU)
    bd   = rel_shift(braw)       [T, T]  (log-roll skew, see below)
    out  = dropout(softmax((ac + bd) * scale, mask)) @ v

HBM sees q/k/v/p reads and the [T,dh] output write — no [T,T]-or-wider
tensor ever leaves the chip. ASR T after 4x subsampling is a few hundred,
so every tile fits VMEM comfortably.

rel_shift without a relayout: row t of the shifted output needs
braw[t, T-1-t+s]. A per-row roll by t is decomposed into log2(T) uniform
`pltpu.roll`s gated by the bits of t (rows with bit k set take the version
rolled by 2^k) — pure VPU lane shifts on a VMEM tile, no HBM traffic.

The backward pass is flash-style: nothing is saved from the forward;
the VJP recomputes scores/softmax (reseeding the same in-kernel TPU PRNG
for an identical dropout mask) and emits dq (content+position combined),
dk, dv, and accumulated dp/du/dvb in one kernel. Grid order is (head,
batch) so the per-head dp/du/dvb accumulator blocks stay VMEM-resident
while the batch dimension iterates (TPU grids run serially).

Sharding note: pallas_call has no GSPMD partitioning rule; the model uses
this kernel on the single-device path and the XLA attention under CPU
(tests exercise the kernel in interpret mode with dropout off — the TPU
PRNG primitives are compiled-mode only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_mask(seed, shape, rate):
    pltpu.prng_seed(seed)
    bits = pltpu.prng_random_bits(shape)  # uint32
    thresh = jnp.uint32(rate * 4294967295.0)
    return bits >= thresh


def _roll(x, shift, axis):
    shift %= x.shape[axis]  # pltpu.roll requires a non-negative shift
    if _use_interpret():
        return jnp.roll(x, shift, axis=axis)  # interpret mode: no Mosaic op
    return pltpu.roll(x, shift, axis)


def _skew(braw, T):
    """[T, P=2T-1] -> [T, T]: out[t, s] = braw[t, T-1-t+s].

    Per-row right-roll by t via binary decomposition of t into uniform
    rolls, then one aligned column slice."""
    row = jax.lax.broadcasted_iota(jnp.int32, braw.shape, 0)
    x = braw
    b = 1
    while b < T:
        x = jnp.where((row & b) != 0, _roll(x, b, 1), x)
        b <<= 1
    return x[:, T - 1 : 2 * T - 1]


def _unskew(dbd, T, P):
    """Adjoint of `_skew`: [T, T] -> [T, P]. (Concatenate, not .at[].set —
    scatter has no Mosaic lowering.)"""
    zeros = jnp.zeros(dbd.shape[:-1] + (T - 1,), dbd.dtype)
    y = jnp.concatenate([zeros, dbd], axis=-1)  # [T, P] with P = 2T-1
    row = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    b = 1
    while b < T:
        y = jnp.where((row & b) != 0, _roll(y, -b, 1), y)
        b <<= 1
    return y


def _scores(q_ref, k_ref, p_ref, u_ref, vb_ref, mask_ref, scale):
    q = q_ref[...]  # [T, dh]
    k = k_ref[...]
    p = p_ref[...]  # [P, dh]
    T = q.shape[0]
    qu = q + u_ref[...]  # [1, dh] broadcasts
    qv = q + vb_ref[...]
    ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
    braw = jnp.dot(qv, p.T, preferred_element_type=jnp.float32)  # [T, P]
    s = (ac + _skew(braw, T)) * scale
    return jnp.where(mask_ref[0] > 0.0, s, NEG)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref,
                mask_ref, out_ref, *, scale, dropout_rate):
    s = _scores(q_ref, k_ref, p_ref, u_ref, vb_ref, mask_ref, scale)
    attn = _softmax_rows(s)  # f32 [T, T]
    if dropout_rate > 0.0:
        keep = _dropout_mask(seed_ref[0, 0], attn.shape, dropout_rate)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    v = v_ref[...]
    out_ref[...] = jnp.dot(
        attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, bpos_ref, q_ref, k_ref, v_ref, p_ref, u_ref,
                vb_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref, dp_ref,
                du_ref, dvb_ref, *, scale, dropout_rate):
    # Grid is (head, batch): batch iterates fastest so the per-head
    # dp/du/dvb accumulators stay resident in VMEM. The batch position
    # comes from an SMEM operand rather than pl.program_id: under jax.vmap
    # the batching rule PREPENDS a grid dimension, which would silently
    # shift program_id indices — an operand's index map is rewritten
    # correctly instead.
    b = bpos_ref[0, 0]
    s = _scores(q_ref, k_ref, p_ref, u_ref, vb_ref, mask_ref, scale)
    attn = _softmax_rows(s)
    if dropout_rate > 0.0:
        keep = _dropout_mask(seed_ref[0, 0], attn.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        attn_d = jnp.where(keep, attn * inv, 0.0)
    else:
        attn_d = attn
    g = g_ref[...]  # [T, dh]
    v = v_ref[...]
    dv_ref[...] = jnp.dot(
        attn_d.astype(g.dtype).T, g, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dattn = jnp.dot(g, v.T.astype(g.dtype), preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dattn = jnp.where(keep, dattn * inv, 0.0)
    rowdot = jnp.sum(dattn * attn, axis=-1, keepdims=True)
    ds = attn * (dattn - rowdot) * scale  # f32 [T, T]; masked cols are 0

    q = q_ref[...]
    k = k_ref[...]
    p = p_ref[...]
    T, dh = q.shape
    P = p.shape[0]
    qu = q + u_ref[...]
    qv = q + vb_ref[...]
    ds_c = ds.astype(q.dtype)
    dbraw = _unskew(ds, T, P).astype(q.dtype)  # [T, P]
    dqu = jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
    dqv = jnp.dot(dbraw, p, preferred_element_type=jnp.float32)
    dq_ref[...] = (dqu + dqv).astype(dq_ref.dtype)
    dk_ref[...] = jnp.dot(
        ds_c.T, qu, preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)

    dp_c = jnp.dot(dbraw.T, qv, preferred_element_type=jnp.float32)  # [P, dh]
    du_c = jnp.sum(dqu, axis=0, keepdims=True)  # [1, dh]
    dvb_c = jnp.sum(dqv, axis=0, keepdims=True)

    @pl.when(b == 0)
    def _():
        dp_ref[...] = dp_c.astype(dp_ref.dtype)
        du_ref[...] = du_c.astype(du_ref.dtype)
        dvb_ref[...] = dvb_c.astype(dvb_ref.dtype)

    @pl.when(b != 0)
    def _():
        dp_ref[...] = dp_ref[...] + dp_c.astype(dp_ref.dtype)
        du_ref[...] = du_ref[...] + du_c.astype(du_ref.dtype)
        dvb_ref[...] = dvb_ref[...] + dvb_c.astype(dvb_ref.dtype)


def _mk_specs(T, P, dh):
    # Grid is (head, batch). None entries SQUEEZE dims so the Mosaic
    # (sublane, lane) tiling lands on the real minor dims, which must be
    # 8/128-divisible or span the whole array dimension.
    tile = pl.BlockSpec((None, None, T, dh), lambda h, b: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)  # q/k/v/g: [B, H, T, dh]
    pos = pl.BlockSpec((None, P, dh), lambda h, b: (h, 0, 0),
                       memory_space=pltpu.VMEM)  # p: [H, P, dh]
    bias = pl.BlockSpec((None, 1, dh), lambda h, b: (h, 0, 0),
                        memory_space=pltpu.VMEM)  # u/vb: [H, 1, dh]
    mask = pl.BlockSpec((None, 1, T), lambda h, b: (b, 0, 0),
                        memory_space=pltpu.VMEM)  # [B, 1, T]
    seed = pl.BlockSpec((None, None, 1, 1), lambda h, b: (b, h, 0, 0),
                        memory_space=pltpu.SMEM)  # [B, H, 1, 1]
    bpos = pl.BlockSpec((None, 1, 1), lambda h, b: (b, 0, 0),
                        memory_space=pltpu.SMEM)  # [B, 1, 1] = arange(B)
    return tile, pos, bias, mask, seed, bpos


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_relpos_attention(q, k, v, p, u, vb, key_mask, seeds, scale,
                           dropout_rate):
    """Full rel-pos attention: dropout(softmax(((q+u)k^T +
    skew((q+vb)p^T)) * scale, masked)) @ v — one VMEM-resident kernel per
    (head, batch) cell.

    q/k/v: [B, H, T, dh]; p: [H, 2T-1, dh] (per-head projected positions);
    u/vb: [H, dh] biases; key_mask: [B, T] float (1.0 = valid); seeds:
    [B, H] int32 per-cell dropout seeds (ignored when dropout_rate == 0).
    Returns [B, H, T, dh] in v.dtype.
    """
    out, _ = _fa_fwd(q, k, v, p, u, vb, key_mask, seeds, scale, dropout_rate)
    return out


def _fa_fwd(q, k, v, p, u, vb, key_mask, seeds, scale, dropout_rate):
    B, H, T, dh = q.shape
    P = p.shape[1]
    tile, pos, bias, mask, seed, _ = _mk_specs(T, P, dh)
    out = pl.pallas_call(
        partial(_fwd_kernel, scale=scale, dropout_rate=dropout_rate),
        grid=(H, B),
        in_specs=[seed, tile, tile, tile, pos, bias, bias, mask],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * T * (2 * T + P) * dh,
            bytes_accessed=B * H * T * dh * 2 * 4 + H * P * dh * 2,
            transcendentals=B * H * T * T,
        ),
        interpret=_use_interpret(),
    )(seeds.reshape(B, H, 1, 1), q, k, v, p, u.reshape(H, 1, dh),
      vb.reshape(H, 1, dh), key_mask.reshape(B, 1, T))
    return out, (q, k, v, p, u, vb, key_mask, seeds)


def _fa_bwd(scale, dropout_rate, res, g):
    q, k, v, p, u, vb, key_mask, seeds = res
    B, H, T, dh = q.shape
    P = p.shape[1]
    tile, pos, bias, mask, seed, bpos = _mk_specs(T, P, dh)
    dq, dk, dv, dp, du, dvb = pl.pallas_call(
        partial(_bwd_kernel, scale=scale, dropout_rate=dropout_rate),
        grid=(H, B),
        in_specs=[seed, bpos, tile, tile, tile, pos, bias, bias, mask, tile],
        out_specs=(tile, tile, tile, pos, bias, bias),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, dh), k.dtype),
            jax.ShapeDtypeStruct((B, H, T, dh), v.dtype),
            jax.ShapeDtypeStruct((H, P, dh), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, dh), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, dh), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * T * (2 * T + P) * dh,
            bytes_accessed=B * H * T * dh * 2 * 6 + H * P * dh * 2 * 2,
            transcendentals=B * H * T * T,
        ),
        interpret=_use_interpret(),
    )(seeds.reshape(B, H, 1, 1), jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1),
      q, k, v, p, u.reshape(H, 1, dh),
      vb.reshape(H, 1, dh), key_mask.reshape(B, 1, T), g)
    return (dq, dk, dv, dp.astype(p.dtype), du.reshape(H, dh).astype(u.dtype),
            dvb.reshape(H, dh).astype(vb.dtype), None, None)


fused_relpos_attention.defvjp(_fa_fwd, _fa_bwd)
