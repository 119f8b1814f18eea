"""On-chip step-time attribution by component removal (measurement tool).

The XProf plugin is broken in this environment and per-kernel
microbenchmarks are unreliable through the relay (ARCHITECTURE.md §10), so
attribution works by REMOVING one component at a time from the full
3-branch QAT bench step and re-timing: the delta is that component's
marginal cost (including its backward and remat recompute). Removal is by
monkeypatching the module/loss symbol to a cheap stand-in; parameters stay
in the TrainState (flax ignores unused entries), so the optimizer's cost
is held constant across configs.

Usage:  python scripts/bench_attribution.py            (writes JSONL to stdout)
Env:    BENCH_BATCH/BENCH_FRAMES/BENCH_TOKENS/BENCH_STEPS as bench.py;
        ATTR_CONFIGS=comma,list to subset.

NOT part of the bench of record — a diagnostic harness. One TPU job at a
time (never run concurrently with bench.py).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_DEFAULT_PRNG_IMPL", "rbg")

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@contextlib.contextmanager
def patched(obj, name, repl):
    orig = getattr(obj, name)
    setattr(obj, name, repl)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def _zero_call_returning_input_shape(self, x, *a, **k):
    return x * 0.0


def _build_and_time(tag, patches, B, T, U, steps):
    """Build model/state/step under `patches` (list of (obj, attr, repl))
    and time `steps` donated steps."""
    from onebit_asr_tpu.model.asr import ConformerASR
    from onebit_asr_tpu.train import create_train_state, make_optimizer, make_train_step
    from onebit_asr_tpu.utils.config import (
        LossConfig,
        ModelConfig,
        OptimConfig,
        SpecialTokens,
    )

    cfg = ModelConfig(
        remat_policy=os.environ.get("BENCH_REMAT_POLICY", "attn_ffn"),
        dropout=float(os.environ.get("BENCH_DROPOUT", 0.1)),
        fused_attention=os.environ.get("BENCH_FUSED", "0") == "1",
        scan_unroll=int(os.environ.get("BENCH_SCAN_UNROLL", 0)),
    )
    if os.environ.get("BENCH_PRESET"):
        from onebit_asr_tpu.model.presets import apply_preset

        cfg = apply_preset(cfg, os.environ["BENCH_PRESET"])
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((B, T, cfg.input_dim)), jnp.float32),
        "feat_lens": jnp.asarray(rng.integers(T // 2, T + 1, size=B).astype(np.int32)),
        "tokens": jnp.asarray(rng.integers(4, cfg.vocab_size, size=(B, U)).astype(np.int32)),
        "token_lens": jnp.asarray(rng.integers(U // 2, U + 1, size=B).astype(np.int32)),
    }
    with contextlib.ExitStack() as stack:
        for obj, attr, repl in patches:
            stack.enter_context(patched(obj, attr, repl))
        model = ConformerASR.from_config(cfg, deterministic=False)
        optimizer = make_optimizer(OptimConfig(), total_steps=100_000)
        # state from the UNPATCHED model shape? No: created inside the patch
        # scope so init matches what apply uses; optimizer state then covers
        # only the surviving params — the optimizer-cost delta is reported
        # as params_m so it can be discounted.
        state = create_train_state(model, optimizer, jax.random.PRNGKey(0), batch, cfg.enc_layers)
        from onebit_asr_tpu.train.state import param_count

        pm = param_count(state.params) / 1e6
        step_fn = jax.jit(
            make_train_step(model, optimizer, LossConfig(), SpecialTokens(), cfg.enc_layers),
            donate_argnums=(0,),
        )
        t0 = time.time()
        state, aux = step_fn(state, batch)
        jax.block_until_ready(aux["loss"])
        compile_s = time.time() - t0
        state, aux = step_fn(state, batch)
        jax.block_until_ready(aux["loss"])
        t0 = time.time()
        for _ in range(steps):
            state, aux = step_fn(state, batch)
        loss = float(aux["loss"])  # true value readback ends the timed region
        dt = (time.time() - t0) / steps
    rec = {
        "config": tag,
        "ms_per_step": round(dt * 1e3, 2),
        "utt_per_sec": round(B / dt, 2),
        "params_m": round(pm, 2),
        "loss": round(loss, 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import onebit_asr_tpu.model.conformer as conformer_mod
    import onebit_asr_tpu.model.layers as layers_mod
    import onebit_asr_tpu.train.step as step_mod

    B = int(os.environ.get("BENCH_BATCH", 16))
    T = int(os.environ.get("BENCH_FRAMES", 1024))
    U = int(os.environ.get("BENCH_TOKENS", 48))
    steps = int(os.environ.get("BENCH_STEPS", 8))

    # pure constants: XLA then DCEs the removed loss's entire forward AND
    # backward (e.g. the CTC head matmul + gather + recursions for no_ctc)
    zero_ctc = lambda logits, lens, tok, tl, blank, axis_name=None: jnp.float32(0.0)
    zero_att = lambda logits, tgt, valid, ls, axis_name=None: jnp.float32(0.0)
    zero_kl = lambda a, b, valid, axis_name=None: jnp.float32(0.0)

    def no_subsample(self, feats):
        # cheap feats-derived stand-in (NOT zeros: a constant would let XLA
        # fold downstream work and NaN the CTC on degenerate frames)
        B_, T_, F_ = feats.shape
        T2 = ((T_ - 1) // 2 - 1) // 2
        x = feats[:, 2 : 2 + 4 * T2 : 4, :]
        reps = -(-self.d_model // F_)
        return jnp.tile(x, (1, 1, reps))[..., : self.d_model].astype(
            self.compute_dtype
        )

    configs = {
        # full step, as the bench of record runs it
        "baseline": [],
        # losses removed one at a time: XLA DCEs the removed branch's whole
        # forward+backward (dec_logits feeding only a constant dies too)
        "no_ctc_loss": [(step_mod, "ctc_loss", zero_ctc)],
        "no_att_ce": [(step_mod, "att_ce_loss", zero_att)],
        "no_kl": [(step_mod, "kl_logits", zero_kl)],
        "no_decoder": [(step_mod, "att_ce_loss", zero_att), (step_mod, "kl_logits", zero_kl)],
        # encoder components
        "no_attention": [(conformer_mod.RelPosMHSA, "__call__", _zero_call_returning_input_shape)],
        "no_conv_module": [(conformer_mod.ConvModule, "__call__", _zero_call_returning_input_shape)],
        "no_ff": [(conformer_mod.FeedForward, "__call__", _zero_call_returning_input_shape)],
        "no_subsampler": [(conformer_mod.Conv2dSubsampling, "__call__", no_subsample)],
        # attention internals (XLA path). pos_scores_dce returns zeros from
        # rel_shift, so XLA dead-code-eliminates the whole position term
        # (the [B,H,T,2T-1] einsum AND the shift) — its delta vs baseline is
        # the full pos-term marginal. rel_shift_slice keeps the einsum but
        # replaces the reshape-shift with a plain slice (wrong math, same
        # shapes/dtypes) — its delta isolates the reshape-shift cost alone
        # (the former pad/concat was folded into the position table, so only
        # the shift remains in rel_shift_padded's hot path).
        "pos_scores_dce": [(
            conformer_mod, "rel_shift_padded",
            lambda x: jnp.zeros_like(x[..., : x.shape[-2]]),
        )],
        "rel_shift_slice": [(
            conformer_mod, "rel_shift_padded",
            lambda x: x[..., : x.shape[-2]],
        )],
        # dropout attribution (round 3). Dropout is semantics-bound
        # (reference drops at every site) but its cost splits by site:
        # "no_dropout" kills every FastDropout (equals BENCH_DROPOUT=0 but
        # composable with other patches); "no_prob_dropout" kills ONLY the
        # 4-D attention-probability sites ([B,H,T,T]/[B,H,U,U] — every
        # other site is 3-D), isolating the widest masks' marginal.
        "no_dropout": [(
            layers_mod.FastDropout, "__call__", lambda self, x: x,
        )],
        "no_prob_dropout": [(
            layers_mod.FastDropout, "__call__",
            (lambda orig: lambda self, x: (
                x if x.ndim == 4 else orig(self, x)
            ))(layers_mod.FastDropout.__call__),
        )],
    }
    subset = os.environ.get("ATTR_CONFIGS", "")
    if subset:
        keep = set(s.strip() for s in subset.split(","))
        configs = {k: v for k, v in configs.items() if k in keep}
    log(f"devices: {jax.devices()}  configs: {list(configs)}")
    for tag, patches in configs.items():
        try:
            _build_and_time(tag, patches, B, T, U, steps)
        except Exception as e:  # keep sweeping; report the failure
            print(json.dumps({"config": tag, "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)


if __name__ == "__main__":
    main()
