"""CTC alpha/beta recursions as single Pallas kernels.

The XLA `lax.scan` form of the CTC forward/backward recursions executes T
(≈255) sequential loop iterations whose bodies are tiny [B, S≈2U+1] vector
ops — pure loop-dispatch latency on TPU (~18 ms of the 3-branch train step
at Conformer-M scale). Here each recursion is ONE kernel: the emission
tensor sits in VMEM (a few MB at ASR shapes) and a `fori_loop` runs the
whole recursion on-chip — per-iteration cost is a handful of VPU ops on a
[B, S] tile instead of an XLA loop step.

These kernels are pure functions of the pre-gathered emissions
(losses/ctc.py `_emissions`); they are called INSIDE that module's
custom-VJP (alpha in the forward, beta in the backward), so no autodiff
ever traces through them. Numerics are identical to the scan form: same
log-semiring updates, same length-freeze rule — losses' golden tests
against torch CTC (values + gradients) cover both paths, and
tests/test_ctc_pallas.py pins kernel == scan.

Layout: emissions arrive [T, B, S] so the recursion state [B, S] lands on
the (sublane, lane) tile; S pads to the lane width once for the whole
kernel. The label-dependent skip mask and per-utterance lengths live in
VMEM alongside.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Conservative per-core VMEM budget for the lattice tiles (v5e has ~16 MiB
# more is available on v4/v5p, but sizing for the smallest target keeps the
# kernel portable). The grid pipeline double-buffers each operand, so the
# working set per grid step is ~2x(emit block + lattice block).
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_SUBLANE = 8
_LANE = 128


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_bytes(T: int, bb: int, S: int) -> int:
    # emit block + lattice block, double-buffered, f32
    s_pad = _round_up(S, _LANE)
    return 2 * (2 * T * bb * s_pad * 4)


def batch_block(T: int, B: int, S: int) -> int | None:
    """Largest sublane-aligned batch block whose double-buffered lattice
    tiles fit VMEM_BUDGET_BYTES; None if even an 8-row block does not fit
    (caller must fall back to the lax.scan recursion)."""
    cap = min(_round_up(B, _SUBLANE), 512)
    bb = 512
    while bb >= _SUBLANE:
        if bb <= cap and _block_bytes(T, bb, S) <= VMEM_BUDGET_BYTES:
            return bb
        bb //= 2
    return None


def fits_vmem(T: int, B: int, S: int) -> bool:
    return batch_block(T, B, S) is not None


def _shift_right(x, cols, fill):
    """[B, S] -> value shifted right along lanes by `cols`, filled with
    `fill` on the left (lane roll + iota mask — no relayout)."""
    S = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if _use_interpret():
        rolled = jnp.roll(x, cols, axis=1)
    else:
        rolled = pltpu.roll(x, cols, 1)
    return jnp.where(col >= cols, rolled, fill)


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    out = m + jnp.log(
        jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m)
    )
    # keep the -inf-like identity exact when all three are the log-zero
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def _alpha_kernel(emit_ref, lens_ref, skip_ref, alpha0_ref, alphas_ref):
    T = emit_ref.shape[0]
    skip_ok = skip_ref[...]  # [B, S] 1.0 = may skip from s-2
    lens = lens_ref[...]  # [B, 1] f32 logit lengths
    alpha = alpha0_ref[...]
    alphas_ref[0] = alpha

    def body(t, alpha):
        a_prev = _shift_right(alpha, 1, NEG_INF)
        a_skip = jnp.where(
            skip_ok > 0.0, _shift_right(alpha, 2, NEG_INF), NEG_INF
        )
        new_alpha = _logaddexp3(alpha, a_prev, a_skip) + emit_ref[t]
        new_alpha = jnp.where(t < lens, new_alpha, alpha)
        alphas_ref[t] = new_alpha
        return new_alpha

    jax.lax.fori_loop(1, T, body, alpha, unroll=False)


def _beta_kernel(emit_ref, lens_ref, skip_ref, binit_ref, betas_ref):
    T = emit_ref.shape[0]
    lens = lens_ref[...]  # [B, 1]
    beta_init = binit_ref[...]  # [B, S] end-state indicator
    # skip into s+2 allowed when skip_ref at s+2 (shift the mask left)
    S = beta_init.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, beta_init.shape, 1)
    if _use_interpret():
        skip_from = jnp.roll(skip_ref[...], -2, axis=1)
    else:
        skip_from = pltpu.roll(skip_ref[...], S - 2, 1)
    skip_from = jnp.where(col < S - 2, skip_from, 0.0)

    betas_ref[T - 1] = beta_init

    def body(i, beta_next):
        t = T - 2 - i
        y = emit_ref[t + 1] + beta_next  # [B, S]
        y_stay = y
        # from s+1 / s+2: shift LEFT along lanes
        def left(x, cols):
            if _use_interpret():
                rolled = jnp.roll(x, -cols, axis=1)
            else:
                rolled = pltpu.roll(x, S - cols, 1)
            return jnp.where(col < S - cols, rolled, NEG_INF)

        y_next = left(y, 1)
        y_skip = jnp.where(skip_from > 0.0, left(y, 2), NEG_INF)
        merged = _logaddexp3(y_stay, y_next, y_skip)
        beta_t = jnp.where(t <= lens - 2.0, merged, beta_init)
        betas_ref[t] = beta_t
        return beta_t

    jax.lax.fori_loop(0, T - 1, body, beta_init, unroll=False)


def _grid_lattice_call(kernel, emit_tbs, logit_lens, can_skip, init_bs):
    """Run a lattice-recursion kernel gridded over the batch axis so each
    grid step's VMEM working set stays under VMEM_BUDGET_BYTES. The batch is
    padded up to a whole number of blocks; padded rows carry length 0 (the
    recursion freezes them at the init row) and are sliced away."""
    T, B, S = emit_tbs.shape
    bb = batch_block(T, B, S)
    if bb is None:
        raise ValueError(
            f"CTC lattice [T={T}, B={B}, S={S}] exceeds the VMEM budget even "
            "at an 8-row batch block; use the lax.scan path (fits_vmem())."
        )
    lens = logit_lens.astype(jnp.float32).reshape(B, 1)
    skip = can_skip.astype(jnp.float32)
    b_pad = _round_up(B, bb)
    if b_pad != B:
        pad = b_pad - B
        emit_tbs = jnp.pad(emit_tbs, ((0, 0), (0, pad), (0, 0)))
        lens = jnp.pad(lens, ((0, pad), (0, 0)))  # len 0 → row frozen at init
        skip = jnp.pad(skip, ((0, pad), (0, 0)))
        init_bs = jnp.pad(init_bs, ((0, pad), (0, 0)), constant_values=NEG_INF)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((T, bb, S), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, bb, S), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, b_pad, S), jnp.float32),
        interpret=_use_interpret(),
    )(emit_tbs, lens, skip, init_bs)
    return out[:, :B] if b_pad != B else out


@partial(jax.jit, static_argnames=())
def ctc_alpha_pallas(emit_tbs, logit_lens, can_skip, alpha0):
    """emit [T,B,S] f32, lens [B], can_skip [B,S] bool, alpha0 [B,S]
    -> alphas [T,B,S] (the full forward-lattice)."""
    return _grid_lattice_call(_alpha_kernel, emit_tbs, logit_lens, can_skip, alpha0)


@partial(jax.jit, static_argnames=())
def ctc_beta_pallas(emit_tbs, logit_lens, can_skip, beta_init):
    """emit [T,B,S] f32, lens [B], can_skip [B,S] bool, beta_init [B,S]
    -> betas [T,B,S] (the full backward-lattice)."""
    return _grid_lattice_call(_beta_kernel, emit_tbs, logit_lens, can_skip, beta_init)
