"""Fused relative-position attention — Pallas TPU kernel with custom VJP.

The XLA path of `RelPosMHSA` (model/conformer.py) materializes a chain of
[B,H,T,*] tensors in HBM per layer: the [T,2T-1] position-score einsum, its
rel-shift (a misaligned pad-reshape-slice relayout — measured ~16 ms/step
across the 12-layer 3-branch encoder on v5e), content scores, their f32
sum, softmax, dropout — each written and re-read, plus reverse-mode
counterparts. Component-removal ablation put attention at ~60% of encoder
step time.

This kernel runs the WHOLE Transformer-XL attention per batch-row grid
cell in VMEM, looping the (static, small) head dimension inside the cell:

    per head h:
      qu = q + u;  qv = q + v_bias
      ac   = qu @ k^T                      (MXU, f32)
      braw = qv @ p^T            [T, 2T-1] (MXU, input dtype)
      bd   = rel_shift(braw)       [T, T]  (log-roll skew, see below)
      out  = dropout(softmax((ac + bd) * scale, mask)) @ v

HBM sees q/k/v/p reads and the [T,dh] output writes — no [T,T]-or-wider
tensor ever leaves the chip. ASR T after 4x subsampling is a few hundred,
so every tile fits VMEM comfortably.

Cell shape rationale (v2): the first version gridded (head, batch) — at
ASR scale each cell held ~50 µs of compute behind 4 small DMAs, and the
measured kernel lost to XLA's fat batched einsums (5.2 vs 3.9 ms/layer
fwd+bwd, ARCHITECTURE.md §7c). Gridding over batch alone quarters the
cell count, turns 4 head-sized DMAs into one head-batched DMA per operand,
and keeps the MXU fed across the in-cell head loop while Mosaic's
pipeline overlaps the next cell's loads.

rel_shift without a relayout: row t of the shifted output needs
braw[t, T-1-t+s]. A per-row roll by t is decomposed into log2(T) uniform
`pltpu.roll`s gated by the bits of t (rows with bit k set take the version
rolled by 2^k) — pure VPU lane shifts on a VMEM tile, no HBM traffic.
The chain runs in f32 regardless of input dtype: Mosaic has no bf16
lowering for tpu.dynamic_rotate (and rejects 16-bit matmul accumulators
for the braw matmul that feeds it).

Dropout consumes PRECOMPUTED uint8 draws (an operand), not an in-kernel
PRNG: the v2 kernel drew its own [T, T] bits per head per cell with
`pltpu.prng_random_bits` and lost 5x to the XLA path from PRNG time
alone (32.5 vs 166 utt/s on the bench of record; 214.9 with dropout off
pinned the attribution). XLA's rng-bit-generator measures ~19 Gwords/s
on v5e. The caller draws bytes with the same word-split trick as
`layers.FastDropout` (keep iff byte >= k, k = round(rate*256), scale by
256/(256-k)), so kernel and XLA paths have bit-identical dropout
semantics, and the draws carry the "dropout_bits" checkpoint name so
remat policies save them instead of regenerating.

The backward pass is flash-style: only the kernel INPUTS (incl. the
dropout bytes) are residuals; the VJP recomputes scores/softmax and
emits dq (content+position combined), dk, dv, and accumulated dp/du/dvb
in one kernel. The per-head dp/du/dvb accumulator blocks stay
VMEM-resident while the batch grid iterates (TPU grids run serially).

Sharding note: pallas_call has no GSPMD partitioning rule; the model uses
this kernel on the single-device path and inside shard_map for the SPMD
train path (train/step.py make_sharded_train_step). Tests exercise the
kernel in interpret mode, including dropout (the uint8 draws are a plain
operand, so interpret mode covers them).
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


def drop_threshold(dropout_rate: float) -> int:
    """FastDropout's quantized drop threshold: drop iff byte < k."""
    return int(round(dropout_rate * 256))


def _roll(x, shift, axis):
    shift %= x.shape[axis]  # pltpu.roll requires a non-negative shift
    if _use_interpret():
        return jnp.roll(x, shift, axis=axis)  # interpret mode: no Mosaic op
    return pltpu.roll(x, shift, axis)


def _skew(braw, T):
    """[T, P=2T-1] -> [T, T]: out[t, s] = braw[t, T-1-t+s].

    Per-row right-roll by t via binary decomposition of t into uniform
    rolls, then one aligned column slice. Runs in braw's dtype."""
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


def _scores_h(q, k, p, u_row, vb_row, maskvec, scale):
    """One head's masked scores [T, T] (f32). q/k [T,dh], p [P,dh] in the
    input dtype; the position chain stays in that dtype until the f32 sum."""
    T = q.shape[0]
    qu = q + u_row  # [1, dh] broadcasts
    qv = q + vb_row
    ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
    # The position chain runs in f32 end-to-end: Mosaic rejects 16-bit
    # matmul accumulators AND has no bf16 lowering for the skew's
    # tpu.dynamic_rotate, so an in-dtype (bf16) skew cannot compile.
    braw = jnp.dot(qv, p.T, preferred_element_type=jnp.float32)  # [T, P]
    s = (ac + _skew(braw, T)) * scale
    return jnp.where(maskvec > 0.0, s, NEG)


def _fwd_kernel(*refs, scale, drop_k, n_heads):
    if drop_k > 0:
        (m8_ref, q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref,
         mask_ref, out_ref) = refs
    else:
        q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref, mask_ref, out_ref = refs
        m8_ref = None
    maskvec = mask_ref[0]  # [1, T] broadcasts over rows
    inv = 256.0 / (256 - drop_k)
    for h in range(n_heads):  # static unroll: H is 4-8
        s = _scores_h(q_ref[h], k_ref[h], p_ref[h], u_ref[h], vb_ref[h],
                      maskvec, scale)
        attn = _softmax_rows(s)  # f32 [T, T]
        if drop_k > 0:
            # precomputed uint8 draws: keep iff byte >= k (FastDropout).
            # i32 compare — Mosaic has no 8-bit vector cmpi lowering.
            attn = jnp.where(m8_ref[h].astype(jnp.int32) >= drop_k,
                             attn * inv, 0.0)
        v = v_ref[h]
        out_ref[h] = jnp.dot(
            attn.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _bwd_kernel(*refs, scale, drop_k, n_heads):
    # Grid is (batch,): the per-head dp/du/dvb accumulators stay resident
    # in VMEM across the serial batch iteration. The batch position comes
    # from an operand rather than pl.program_id: under jax.vmap the
    # batching rule PREPENDS a grid dimension, which would silently shift
    # program_id indices — an operand's index map is rewritten correctly
    # instead.
    if drop_k > 0:
        (m8_ref, bpos_ref, q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref,
         mask_ref, g_ref, dq_ref, dk_ref, dv_ref, dp_ref, du_ref,
         dvb_ref) = refs
    else:
        (bpos_ref, q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref, mask_ref,
         g_ref, dq_ref, dk_ref, dv_ref, dp_ref, du_ref, dvb_ref) = refs
        m8_ref = None
    b = bpos_ref[0, 0]
    maskvec = mask_ref[0]
    inv = 256.0 / (256 - drop_k)
    for h in range(n_heads):
        q, k, v, p = q_ref[h], k_ref[h], v_ref[h], p_ref[h]
        T, dh = q.shape
        P = p.shape[0]
        s = _scores_h(q, k, p, u_ref[h], vb_ref[h], maskvec, scale)
        attn = _softmax_rows(s)
        if drop_k > 0:
            # i32 compare — Mosaic has no 8-bit vector cmpi lowering
            keep = m8_ref[h].astype(jnp.int32) >= drop_k
            attn_d = jnp.where(keep, attn * inv, 0.0)
        else:
            attn_d = attn
        g = g_ref[h]  # [T, dh]
        dv_ref[h] = jnp.dot(
            attn_d.astype(g.dtype).T, g, preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        dattn = jnp.dot(g, v.T.astype(g.dtype),
                        preferred_element_type=jnp.float32)
        if drop_k > 0:
            dattn = jnp.where(keep, dattn * inv, 0.0)
        rowdot = jnp.sum(dattn * attn, axis=-1, keepdims=True)
        ds = attn * (dattn - rowdot) * scale  # f32 [T, T]; masked cols are 0

        qu = q + u_ref[h]
        qv = q + vb_ref[h]
        ds_c = ds.astype(q.dtype)
        # unskew in f32: Mosaic has no bf16 lowering for its rotates
        dbraw = _unskew(ds, T, P).astype(q.dtype)  # [T, P]
        dqu = jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
        dqv = jnp.dot(dbraw, p, preferred_element_type=jnp.float32)
        dq_ref[h] = (dqu + dqv).astype(dq_ref.dtype)
        dk_ref[h] = jnp.dot(
            ds_c.T, qu, preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)

        dp_c = jnp.dot(dbraw.T, qv, preferred_element_type=jnp.float32)
        du_c = jnp.sum(dqu, axis=0, keepdims=True)  # [1, dh]
        dvb_c = jnp.sum(dqv, axis=0, keepdims=True)

        @pl.when(b == 0)
        def _():
            dp_ref[h] = dp_c.astype(dp_ref.dtype)
            du_ref[h] = du_c.astype(du_ref.dtype)
            dvb_ref[h] = dvb_c.astype(dvb_ref.dtype)

        @pl.when(b != 0)
        def _():
            dp_ref[h] = dp_ref[h] + dp_c.astype(dp_ref.dtype)
            du_ref[h] = du_ref[h] + du_c.astype(du_ref.dtype)
            dvb_ref[h] = dvb_ref[h] + dvb_c.astype(dvb_ref.dtype)


def _mk_specs(H, T, P, dh):
    # Grid is (batch,). None entries SQUEEZE dims so the Mosaic
    # (sublane, lane) tiling lands on the real minor dims, which must be
    # 8/128-divisible or span the whole array dimension.
    tile = pl.BlockSpec((None, H, T, dh), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)  # q/k/v/g: [B, H, T, dh]
    pos = pl.BlockSpec((H, P, dh), lambda b: (0, 0, 0),
                       memory_space=pltpu.VMEM)  # p: [H, P, dh]
    bias = pl.BlockSpec((H, 1, dh), lambda b: (0, 0, 0),
                        memory_space=pltpu.VMEM)  # u/vb: [H, 1, dh]
    mask = pl.BlockSpec((None, 1, T), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)  # [B, 1, T]
    # Per-row scalars ride VMEM, not SMEM: Mosaic applies the (8, 128)
    # tile-divisibility check to BLOCKED SMEM operands too (jax 0.9), but
    # a VMEM block whose last two dims EQUAL the array's passes, and
    # scalar reads from VMEM lower fine.
    drop8 = pl.BlockSpec((None, H, T, T), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)  # [B, H, T, T] uint8
    bpos = pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)  # [B, 1, 1] = arange(B)
    return tile, pos, bias, mask, drop8, bpos


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_relpos_attention(q, k, v, p, u, vb, key_mask, drop8, scale,
                           dropout_rate):
    """Full rel-pos attention: dropout(softmax(((q+u)k^T +
    skew((q+vb)p^T)) * scale, masked)) @ v — one VMEM-resident kernel per
    batch-row cell, heads looped in-cell.

    q/k/v: [B, H, T, dh]; p: [H, 2T-1, dh] (per-head projected positions);
    u/vb: [H, dh] biases; key_mask: [B, T] float (1.0 = valid); drop8:
    [B, H, T, T] uint8 uniform draws (FastDropout convention: keep iff
    byte >= round(rate*256)); ignored — pass any 1-element uint8 array —
    when dropout_rate == 0. Returns [B, H, T, dh] in v.dtype.
    """
    out, _ = _fa_fwd(q, k, v, p, u, vb, key_mask, drop8, scale, dropout_rate)
    return out


def _fa_fwd(q, k, v, p, u, vb, key_mask, drop8, scale, dropout_rate):
    B, H, T, dh = q.shape
    P = p.shape[1]
    drop_k = drop_threshold(dropout_rate)
    tile, pos, bias, mask, d8spec, _ = _mk_specs(H, T, P, dh)
    lead = [d8spec] if drop_k > 0 else []
    out = pl.pallas_call(
        partial(_fwd_kernel, scale=scale, drop_k=drop_k, n_heads=H),
        grid=(B,),
        in_specs=lead + [tile, tile, tile, pos, bias, bias, mask],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * T * (2 * T + P) * dh,
            bytes_accessed=B * H * T * dh * 2 * 4 + H * P * dh * 2,
            transcendentals=B * H * T * T,
        ),
        interpret=_use_interpret(),
    )(*(([drop8] if drop_k > 0 else [])
        + [q, k, v, p, u.reshape(H, 1, dh),
           vb.reshape(H, 1, dh), key_mask.reshape(B, 1, T)]))
    return out, (q, k, v, p, u, vb, key_mask, drop8)


def _fa_bwd(scale, dropout_rate, res, g):
    q, k, v, p, u, vb, key_mask, drop8 = res
    B, H, T, dh = q.shape
    P = p.shape[1]
    drop_k = drop_threshold(dropout_rate)
    tile, pos, bias, mask, d8spec, bpos = _mk_specs(H, T, P, dh)
    lead = [d8spec] if drop_k > 0 else []
    dq, dk, dv, dp, du, dvb = pl.pallas_call(
        partial(_bwd_kernel, scale=scale, drop_k=drop_k, n_heads=H),
        grid=(B,),
        in_specs=lead + [bpos, tile, tile, tile, pos, bias, bias, mask,
                         tile],
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
    )(*(([drop8] if drop_k > 0 else [])
        + [jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1),
           q, k, v, p, u.reshape(H, 1, dh),
           vb.reshape(H, 1, dh), key_mask.reshape(B, 1, T), g]))
    return (dq, dk, dv, dp.astype(p.dtype), du.reshape(H, dh).astype(u.dtype),
            dvb.reshape(H, dh).astype(vb.dtype), None, None)


fused_relpos_attention.defvjp(_fa_fwd, _fa_bwd)
