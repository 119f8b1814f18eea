"""Fused Conv2dSubsampling — Pallas TPU kernel with custom VJP (opt-in).

The reference subsampler is two 3x3 stride-2 VALID convs with ReLU
(conformer.py:170-208). On the XLA path the conv1 output
[B, (T-1)//2, (F-1)//2, C] is the single largest activation of the whole
step — at the bench config (3x16 batch-branches, T=1024, C=256) it is
~490 MB bf16, written by conv1, re-read by conv2, and touched again by
both convs' backward: ~2.5 GB/step of HBM traffic that exists only to
carry an intermediate between two fuse-able ops.

This kernel computes conv1 -> ReLU -> conv2 -> ReLU per batch row with the
intermediate living ONLY in VMEM, in output-row blocks:

  conv1 (C_in=1): 9 stride-2 slices of the input window, each a [R1, F1]
      plane, times a [C] weight row — 9 broadcast FMAs on the VPU (the
      K=9 matmul form would fill 7% of the MXU).
  conv2: im2col of the VMEM-resident conv1 block -> [R2*F2, 9*C] @ [9*C, C]
      on the MXU (K=2304).

The flatten + Dense projection after conv2 stays in XLA (a clean matmul).

Backward (flash-style; forward saves nothing): recompute the conv1 block,
then per block
  dW2  += im2col(c1)^T @ dy          (VMEM-resident [9C, C] accumulator)
  dc1   = overlap-add of dy @ W2^T   (stride-2 interleave, ReLU-masked)
  dW1  += per-tap reductions of dc1 against the input planes
  dx    = overlap-add over taps of dc1 . W1
all in one kernel; weight-gradient accumulators stay VMEM-resident across
the serial batch grid. Stride-2 gathers/scatters use reshape-interleave
(no strided memory ops, no Mosaic scatter). Time blocks run under a
`fori_loop` (compact Mosaic program, no unrolling) with the block size
chosen by a VMEM-budget model (_pick_r2). Gradients match the XLA conv
path exactly (tests/test_fused_subsampler.py, interpret mode).

Enable with ModelConfig.fused_subsampler (single-device/shard_map paths,
like fused_attention; no GSPMD partitioning rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prec(dtype):
    """f32 operands: HIGHEST, recovering the bf16-MXU-pass rounding that
    the XLA conv reference does not have. bf16 operands: DEFAULT — Mosaic
    rejects an fp32 contract_precision on bf16 inputs ("Bad lhs type"),
    and single-pass bf16 products are already exact."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else None)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def out_len(n: int) -> int:
    """VALID 3-wide stride-2 conv output length."""
    return (n - 1) // 2


def _take_stride2(x, n, off, axis):
    """out[..r..] = x[..2r+off..] along `axis`, r < n (static shapes).

    Lane (last) axis: a 0/1 selection matmul — Mosaic has no lowering for
    reshapes that split the lane dim, but x @ S with S[2r+off, r] = 1 is
    BIT-EXACT (each output sums exactly one nonzero product) and a tiny
    MXU op. Other axes: slice + sublane/leading-dim split reshape +
    middle-dim index, all of which Mosaic lowers."""
    m = x.shape[axis]
    if axis == x.ndim - 1 or axis == -1:
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
        sel = (rows == 2 * cols + off).astype(x.dtype)
        # HIGHEST (f32): default-precision f32 MXU passes round x to
        # bf16, breaking the exactness of the 0/1 selection. f32
        # accumulation always: Mosaic rejects 16-bit matmul accumulators.
        return jnp.dot(x, sel, preferred_element_type=jnp.float32,
                       precision=_prec(x.dtype)).astype(x.dtype)
    xo = jax.lax.slice_in_dim(x, off, m, axis=axis)
    k = xo.shape[axis] // 2
    pairs = jax.lax.slice_in_dim(xo, 0, 2 * k, axis=axis)
    shp = list(xo.shape)
    shp[axis : axis + 1] = [k, 2]
    evens = jax.lax.index_in_dim(
        pairs.reshape(shp), 0, axis=axis + 1, keepdims=False
    )
    if n > k:  # odd tail: element 2k+off is an even-offset pick
        tail = jax.lax.slice_in_dim(xo, 2 * k, 2 * k + 1, axis=axis)
        evens = jnp.concatenate([evens, tail], axis=axis)
    return jax.lax.slice_in_dim(evens, 0, n, axis=axis)


def _put_matrix(n, m, off, dtype):
    """[n, m] 0/1 matrix P with P[r, 2r+off] = 1 (the adjoint of the
    stride-2 take): contracting a length-n axis against P scatters it to
    2r+off positions of a length-m axis, zeros elsewhere."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return (cols == 2 * rows + off).astype(dtype)


def _put_stride2(plane, m, off, axis):
    """Adjoint of _take_stride2: out[..2r+off..] = plane[..r..], zeros
    elsewhere; output length m along `axis`.

    Every case is ONE 0/1-matrix contraction (bit-exact at HIGHEST
    precision; see _take_stride2). The earlier pad/stack/reshape
    interleave had no Mosaic lowering on lane or sublane axes AND kept
    several row-block temporaries live per tap, blowing the kernel's
    scoped-VMEM stack."""
    n = plane.shape[axis]
    ax = axis % plane.ndim
    assert off // 2 + n <= (m + 1 - (off % 2)) // 2, (m, n, off)
    P = _put_matrix(n, m, off, plane.dtype)
    hi = _prec(plane.dtype)
    f32 = jnp.float32  # Mosaic rejects 16-bit matmul accumulators
    if ax == plane.ndim - 1:
        out = jnp.dot(plane, P, preferred_element_type=f32, precision=hi)
    elif plane.ndim == 2 and ax == 0:
        out = jnp.einsum("rf,rm->mf", plane, P,
                         preferred_element_type=f32, precision=hi)
    elif plane.ndim == 3 and ax == 1:
        out = jnp.einsum("tfc,fm->tmc", plane, P,
                         preferred_element_type=f32, precision=hi)
    elif plane.ndim == 3 and ax == 0:
        out = jnp.einsum("tfc,tm->mfc", plane, P,
                         preferred_element_type=f32, precision=hi)
    else:
        raise NotImplementedError((plane.ndim, ax))
    return out.astype(plane.dtype)


def _conv1_block(x_win, w1, b1):
    """x_win [R_in, F] f32 -> conv1 PRE-ACTIVATION block [R1, F1, C] f32,
    R1 = (R_in-1)//2, F1 = (F-1)//2; w1 [3,3,C], b1 [C]."""
    R_in, F = x_win.shape
    R1, F1 = out_len(R_in), out_len(F)
    acc = jnp.broadcast_to(b1[None, None, :], (R1, F1, w1.shape[-1]))
    for i in range(3):
        rows = _take_stride2(x_win, R1, i, 0)  # [R1, F]
        for j in range(3):
            plane = _take_stride2(rows, F1, j, 1)  # [R1, F1]
            acc = acc + plane[:, :, None] * w1[i, j][None, None, :]
    return acc


def _im2col2(c1, R2, F2):
    """c1 [R1, F1, C] -> [R2*F2, 9C] patches, (i,j) major / C minor."""
    C = c1.shape[-1]
    groups = []
    for i in range(3):
        rows = _take_stride2(c1, R2, i, 0)  # [R2, F1, C]
        for j in range(3):
            groups.append(_take_stride2(rows, F2, j, 1).reshape(R2 * F2, C))
    return jnp.concatenate(groups, axis=-1)


def _grid_blocks(T2, R2):
    """(r2, n_blocks): uniform starts i*r2 with the LAST start clamped to
    T2-r2 (overlap recomputes; forward writes are idempotent, backward
    masks already-counted rows)."""
    r2 = min(R2, T2)
    return r2, -(-T2 // r2)


_MIB = 1 << 20


def _pick_r2(T, F, C, cd_bytes, backward, limit=None):
    """Largest time-block size fitting v5e's 16 MiB scoped-VMEM stack, or
    None when no block size fits (caller falls back to XLA convs).

    Mosaic's stack allocator reserves roughly the SUM of the loop body's
    vector temporaries (little cross-statement reuse), so the model is an
    affine fit `base + r2 * per_unit` CALIBRATED against measured compiles
    at T=1024, F=80, C=256:
        fwd f32:  fits @ r2=16, 24.50M @ r2=32, 46.78M @ r2=64
        fwd bf16: 21.01M @ r2=32, 40.47M @ r2=64
        bwd f32:  21.39M @ r2=2, 22.40M @ r2=4, 30.22M @ r2=8 (never fits)
        bwd bf16: fits @ r2=8 standalone but 18.98M INSIDE a larger jit
                  (scoped vmem is shared with XLA's own fusions there),
                  21.51M @ r2=16
    The α=3.5 inflation on the nominal per-iteration temporaries and the
    ref-traffic base term reproduce the standalone points; the backward
    limit is dropped to 11 MiB so in-jit sharing still fits (bf16 bench
    shapes land on r2=4)."""
    if limit is None:
        limit = (11 if backward else 15) * _MIB
    F1, F2 = out_len(F), out_len(out_len(F))
    T2 = out_len(out_len(T))
    if _use_interpret():  # no VMEM on the interpreter
        return min(64, max(T2, 1))
    gb = T2 * F2 * C * cd_bytes  # y block fwd / cotangent block bwd
    w2b = 9 * C * C * cd_bytes
    if backward:
        per_unit = 3.5 * (3 * F1 * C * 4 + 2 * F2 * 9 * C * cd_bytes
                          + 2 * F2 * C * 4)
        base = max(0.0, 2.7 * (gb + w2b) - 5.2 * _MIB)
    else:
        # fwd body: c1 + im2col groups/pat + y accumulator (measured fit:
        # f32 r2=16 compiles at these shapes).
        per_unit = 2.0 * (F1 * C * 4 + 2 * F2 * 9 * C * cd_bytes
                          + F2 * C * 4)
        base = w2b + T * F * 4
    for r2 in (64, 32, 16, 8, 4, 2):
        if base + r2 * per_unit <= limit:
            return min(r2, max(T2, 1))
    return None


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *,
                T, F, R2, compute_dtype):
    T2, F2 = out_len(out_len(T)), out_len(out_len(F))
    w1 = w1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32).reshape(-1)
    w2 = w2_ref[...]  # [9C, C] compute dtype
    b2 = b2_ref[...].astype(jnp.float32).reshape(1, -1)
    r2, n_blocks = _grid_blocks(T2, R2)

    def body(i, carry):
        # conv2 rows [t0, t0+r2) <- conv1 rows [2t0, 2t0+2r2+1)
        #                        <- input rows [4t0, 4t0+4r2+3)
        # Windows are sliced at the REF level (pl.ds): Mosaic lowers
        # dynamic-start VMEM loads, but not dynamic_slice on a loaded value.
        t0 = jnp.minimum(i * r2, T2 - r2)
        x_win = x_ref[0, pl.ds(4 * t0, 4 * r2 + 3)]
        c1 = jnp.maximum(_conv1_block(x_win, w1, b1), 0.0)
        pat = _im2col2(c1.astype(compute_dtype), r2, F2)
        y = jnp.dot(pat, w2, preferred_element_type=jnp.float32,
                    precision=_prec(compute_dtype)) + b2
        y = jnp.maximum(y, 0.0)
        y_ref[0, pl.ds(t0, r2)] = y.reshape(r2, F2, -1).astype(y_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_blocks, body, 0, unroll=False)


def _bwd_kernel(bpos_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                T, F, R2, compute_dtype):
    b = bpos_ref[0, 0]
    F1 = out_len(F)
    T2, F2 = out_len(out_len(T)), out_len(F1)
    C = w1_ref.shape[-1]
    w1 = w1_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32).reshape(-1)
    w2 = w2_ref[...]
    b2 = b2_ref[...].astype(jnp.float32).reshape(1, -1)

    r2, n_blocks = _grid_blocks(T2, R2)
    R1 = 2 * r2 + 1

    # dx accumulates IN the output ref (read-modify-write per window) —
    # a [T, F] fori_loop carry would need dynamic_slice on a value, which
    # has no Mosaic lowering. The batch grid is serial and each grid step
    # owns its own dx row, so the RMW is race-free. dw2 also accumulates
    # in-ref (its [9C, C] f32 carry copy would double its VMEM cost).
    dx_ref[0] = jnp.zeros((T, F), dx_ref.dtype)

    @pl.when(b == 0)
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    def body(i, carry):
        dw1, db1, db2 = carry
        t0 = jnp.minimum(i * r2, T2 - r2)
        x_win = x_ref[0, pl.ds(4 * t0, 4 * r2 + 3)]
        c1_pre = _conv1_block(x_win, w1, b1)  # [R1, F1, C]
        c1 = jnp.maximum(c1_pre, 0.0)
        pat = _im2col2(c1.astype(compute_dtype), r2, F2)
        y_pre = jnp.dot(pat, w2, preferred_element_type=jnp.float32,
                        precision=_prec(compute_dtype)) + b2
        g = g_ref[0, pl.ds(t0, r2)]
        g = g.astype(jnp.float32).reshape(r2 * F2, -1)
        # clamped last block: rows < i*r2 were counted by earlier blocks.
        # Built directly at [r2*F2, 1] — reshaping a [r2, F2] mask would
        # merge the lane dim, which Mosaic cannot shape-cast.
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (r2 * F2, 1), 0
        ) // F2 + t0
        fresh = row_ids >= i * r2
        g = jnp.where((y_pre > 0.0) & fresh, g, 0.0)
        gc = g.astype(compute_dtype)
        dw2_ref[...] = dw2_ref[...] + jnp.dot(
            pat.T, gc, preferred_element_type=jnp.float32,
            precision=_prec(compute_dtype),
        ).astype(dw2_ref.dtype)
        db2 = db2 + jnp.sum(g, axis=0, keepdims=True)
        # dpat in compute dtype: MXU accumulates f32 either way, and the
        # unfused path's conv dgrad cotangent is compute-dtype too
        dpat = jnp.dot(gc, w2.T, preferred_element_type=jnp.float32,
                       precision=_prec(compute_dtype)).astype(compute_dtype)
        # Per-tap planes via STATIC lane slices of the [r2*F2, 9C] dpat —
        # reshape(r2, F2, 9, C) would split the lane dim, which Mosaic
        # cannot shape-cast; [.., tC:(t+1)C] + a leading-dim split can.
        dc1 = jnp.zeros((R1, F1, C), jnp.float32)
        for i_t in range(3):
            for j_t in range(3):
                t = 3 * i_t + j_t
                dplane = dpat[:, t * C : (t + 1) * C].reshape(
                    r2, F2, C
                ).astype(jnp.float32)
                dc1 = dc1 + _put_stride2(
                    _put_stride2(dplane, F1, j_t, 1), R1, i_t, 0
                )
        dc1 = jnp.where(c1_pre > 0.0, dc1, 0.0)
        db1 = db1 + jnp.sum(dc1, axis=(0, 1))[None, :]
        dxw = jnp.zeros((4 * r2 + 3, F), jnp.float32)
        dw1_rows = []  # no Mosaic scatter-add: collect rows, concat below
        for i_t in range(3):
            rows = _take_stride2(x_win, R1, i_t, 0)  # [R1, F]
            for j_t in range(3):
                plane = _take_stride2(rows, F1, j_t, 1)  # [R1, F1]
                dw1_rows.append(
                    jnp.sum(plane[:, :, None] * dc1, axis=(0, 1))[None, :]
                )
                contrib = jnp.sum(
                    dc1 * w1[i_t, j_t][None, None, :], axis=-1
                )  # [R1, F1]
                dxw = dxw + _put_stride2(
                    _put_stride2(contrib, F, j_t, 1), 4 * r2 + 3, i_t, 0
                )
        dw1 = dw1 + jnp.concatenate(dw1_rows, axis=0)  # [9, C]
        sl = (0, pl.ds(4 * t0, 4 * r2 + 3))
        dx_ref[sl] = dx_ref[sl] + dxw.astype(dx_ref.dtype)
        return dw1, db1, db2

    dw1, db1, db2 = jax.lax.fori_loop(
        0, n_blocks, body,
        (
            jnp.zeros((9, C), jnp.float32),  # taps (i,j)-major
            jnp.zeros((1, C), jnp.float32),
            jnp.zeros((1, C), jnp.float32),
        ),
        unroll=False,
    )

    dw1 = dw1.reshape(3, 3, C)

    @pl.when(b == 0)
    def _():
        dw1_ref[...] = dw1.astype(dw1_ref.dtype)
        db1_ref[...] = db1.astype(db1_ref.dtype)
        db2_ref[...] = db2.astype(db2_ref.dtype)

    @pl.when(b != 0)
    def _():
        dw1_ref[...] = dw1_ref[...] + dw1.astype(dw1_ref.dtype)
        db1_ref[...] = db1_ref[...] + db1.astype(db1_ref.dtype)
        db2_ref[...] = db2_ref[...] + db2.astype(db2_ref.dtype)


def _specs(T, F, C):
    xin = pl.BlockSpec((1, T, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((3, 3, C), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
    b1s = pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    w2s = pl.BlockSpec((9 * C, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    b2s = pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return xin, w1s, b1s, w2s, b2s


def subsample_fusable(T, F, C, compute_dtype) -> bool:
    """Can the Pallas kernel (fwd AND bwd) compile for these shapes?

    False when C is not lane-aligned (the selection-matmul puts lower
    through reshapes that need a 128-multiple lane) or when no time-block
    size fits the bwd kernel's scoped-VMEM budget (e.g. f32 compute at
    bench shapes). Interpret mode (CPU) has neither constraint."""
    if _use_interpret():
        return True
    if C % 128 != 0:
        return False
    cd = jnp.dtype(compute_dtype).itemsize
    return (_pick_r2(T, F, C, cd, backward=False) is not None
            and _pick_r2(T, F, C, cd, backward=True) is not None)


def _xla_subsample(x, w1, b1, w2, b2, compute_dtype):
    """Fallback with the kernel's exact parameter layout/math, on XLA."""
    C = w1.shape[-1]
    y = jax.lax.conv_general_dilated(
        x[..., None].astype(compute_dtype),
        w1[:, :, None, :].astype(compute_dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1
    y = jnp.maximum(y, 0.0).astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        y, w2.reshape(3, 3, C, C).astype(compute_dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2
    return jnp.maximum(y, 0.0).astype(compute_dtype)


def fused_subsample(x, w1, b1, w2, b2, compute_dtype=jnp.bfloat16):
    """conv1(3x3 s2 VALID, C_in=1) -> ReLU -> conv2(3x3 s2 VALID) -> ReLU,
    fused per batch row; the conv1 intermediate never touches HBM.

    x [B, T, F] f32; w1 [3, 3, C] (conv1 HWIO kernel squeezed); b1 [C];
    w2 [9*C, C] (conv2 HWIO kernel reshaped — (i, j) major, C_in minor);
    b2 [C]. Returns [B, T2, F2, C] in compute_dtype. Shapes the kernel
    cannot compile for (see subsample_fusable) fall back to XLA convs
    with identical parameters and semantics."""
    _, T, F = x.shape
    if not subsample_fusable(T, F, w1.shape[-1], compute_dtype):
        return _xla_subsample(x, w1, b1, w2, b2, compute_dtype)
    return _fused_subsample_impl(x, w1, b1, w2, b2, compute_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_subsample_impl(x, w1, b1, w2, b2, compute_dtype):
    out, _ = _fs_fwd(x, w1, b1, w2, b2, compute_dtype)
    return out


def _fs_fwd(x, w1, b1, w2, b2, compute_dtype):
    B, T, F = x.shape
    C = w1.shape[-1]
    T2, F2 = out_len(out_len(T)), out_len(out_len(F))
    R2 = _pick_r2(T, F, C, jnp.dtype(compute_dtype).itemsize, backward=False)
    assert R2 is not None, "gated by subsample_fusable"
    xin, w1s, b1s, w2s, b2s = _specs(T, F, C)
    yspec = pl.BlockSpec((1, T2, F2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_fwd_kernel, T=T, F=F, R2=R2, compute_dtype=compute_dtype),
        grid=(B,),
        in_specs=[xin, w1s, b1s, w2s, b2s],
        out_specs=yspec,
        out_shape=jax.ShapeDtypeStruct((B, T2, F2, C), compute_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (out_len(T) * out_len(F) * C * 9
                           + T2 * F2 * C * 9 * C),
            bytes_accessed=B * (T * F * 4 + T2 * F2 * C * 2) + 9 * C * C * 2,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(x, w1, b1.reshape(1, C), w2.astype(compute_dtype), b2.reshape(1, C))
    return out, (x, w1, b1, w2, b2)


def _fs_bwd(compute_dtype, res, g):
    x, w1, b1, w2, b2 = res
    B, T, F = x.shape
    C = w1.shape[-1]
    T2, F2 = out_len(out_len(T)), out_len(out_len(F))
    R2 = _pick_r2(T, F, C, jnp.dtype(compute_dtype).itemsize, backward=True)
    assert R2 is not None, "gated by subsample_fusable"
    xin, w1s, b1s, w2s, b2s = _specs(T, F, C)
    gspec = pl.BlockSpec((1, T2, F2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    # VMEM, not SMEM: blocked SMEM operands hit Mosaic's (8, 128)
    # tile-divisibility check (jax 0.9); a VMEM block spanning the array's
    # minor dims passes, and scalar reads from VMEM lower fine.
    bpos = pl.BlockSpec((None, 1, 1), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        partial(_bwd_kernel, T=T, F=F, R2=R2, compute_dtype=compute_dtype),
        grid=(B,),
        in_specs=[bpos, xin, w1s, b1s, w2s, b2s, gspec],
        out_specs=(xin, w1s, b1s, w2s, b2s),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, F), x.dtype),
            jax.ShapeDtypeStruct((3, 3, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * (out_len(T) * out_len(F) * C * 9
                           + T2 * F2 * C * 9 * C),
            bytes_accessed=B * (T * F * 8 + T2 * F2 * C * 2) + 9 * C * C * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(jnp.arange(B, dtype=jnp.int32).reshape(B, 1, 1),
      x, w1, b1.reshape(1, C), w2.astype(compute_dtype), b2.reshape(1, C), g)
    return (dx, dw1.astype(w1.dtype), db1.reshape(C).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(C).astype(b2.dtype))


_fused_subsample_impl.defvjp(_fs_fwd, _fs_bwd)
