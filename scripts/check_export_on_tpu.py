"""On-chip validation of jax.export serving artifacts.

The pytest suite round-trips artifacts on CPU (tests/test_export.py); this
script is the real-device counterpart: it serializes each artifact kind on
the TPU backend — where the packed path embeds an actual Mosaic
`tpu_custom_call` (on the jax.export guaranteed-stable custom-call list) —
deserializes from bytes, and asserts parity with the live model.

Usage:  python scripts/check_export_on_tpu.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from onebit_asr_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _report(name, ok, detail=""):
    print(f"[{'ok' if ok else 'FAIL'}] {name} {detail}", flush=True)
    return ok


def main():
    from onebit_asr_tpu.export import (
        artifact_meta,
        build_offline_forward,
        build_streaming_step,
        export_offline,
        export_streaming,
        load_artifact,
        save_artifact,
    )
    from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
    from onebit_asr_tpu.utils.config import ModelConfig

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    cfg = ModelConfig(
        input_dim=80, vocab_size=256, enc_d_model=128, enc_layers=3,
        enc_heads=2, enc_d_ff=256, enc_conv_kernel=15, dec_layers=1,
        dec_heads=2, dec_d_ff=256, dropout=0.0,
    )
    model = ConformerASR.from_config(cfg, deterministic=True)
    feats0 = jnp.zeros((1, 64, cfg.input_dim), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), feats0, jnp.full((1,), 64, jnp.int32),
        precision_to_binary_mask(2, cfg.enc_layers),
    )["params"]

    rng = np.random.default_rng(1)
    B, T = 4, 256
    feats = jnp.asarray(rng.standard_normal((B, T, cfg.input_dim)), jnp.float32)
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)

    ok = True
    with tempfile.TemporaryDirectory() as td:
        # 1. offline fake-quant artifact, serialized bytes -> deserialized call
        live = jax.jit(build_offline_forward(cfg, params, 2, emit="both"))
        ids_l, lens_l, lp_l, el_l = live(feats, lens)
        exp = export_offline(cfg, params, 2, num_frames=T, batch_size=B,
                             emit="both")
        path = os.path.join(td, "offline")
        save_artifact(exp, path, artifact_meta(cfg, 2, "offline", "both"))
        fn, _ = load_artifact(path)
        ids_a, lens_a, lp_a, el_a = fn(feats, lens)
        d = float(jnp.max(jnp.abs(lp_l - lp_a)))
        ok &= _report(
            "offline artifact == live (ids/lens/logprobs)",
            bool(jnp.all(ids_l == ids_a)) and bool(jnp.all(lens_l == lens_a))
            and bool(jnp.all(el_l == el_a)) and d < 1e-5,
            f"max|Δlogp|={d:.2e} "
            f"size={os.path.getsize(os.path.join(path, 'module.jexp'))//1024}KiB",
        )

        # 2. packed artifact: real Pallas ternary matmul inside the module.
        # Parity target is the LIVE packed forward (same math): greedy ids
        # vs the fake-quant path are only comparable on trained weights —
        # random-init logits are near-uniform, so the kernel-vs-XLA bf16
        # accumulation difference flips argmaxes (the trained-checkpoint
        # packed==fake-quant parity lives in tests/test_packed_inference.py
        # and the capstone eval, docs/RESULTS.md).
        live_p = jax.jit(
            build_offline_forward(cfg, params, 2, packed=True, emit="greedy"))
        ids_lp, lens_lp = live_p(feats, lens)
        exp_p = export_offline(cfg, params, 2, num_frames=T, batch_size=B,
                               packed=True, emit="greedy")
        path_p = os.path.join(td, "packed")
        save_artifact(exp_p, path_p,
                      artifact_meta(cfg, 2, "offline", packed=True))
        fn_p, _ = load_artifact(path_p)
        ids_p, lens_p = fn_p(feats, lens)
        has_cc = b"tpu_custom_call" in exp_p.mlir_module_serialized
        ok &= _report(
            "packed artifact == live packed forward (bit-parity)",
            bool(jnp.all(ids_lp == ids_p)) and bool(jnp.all(lens_lp == lens_p))
            and has_cc,
            f"embeds tpu_custom_call={has_cc} "
            f"size={os.path.getsize(os.path.join(path_p, 'module.jexp'))//1024}KiB",
        )

        # 3. streaming chunk-step artifact carries caches identically
        scfg = dataclasses.replace(
            cfg, causal_conv=True, conv_norm="layer_norm",
            attn_chunk_size=8, attn_left_chunks=2,
        )
        smodel = ConformerASR.from_config(scfg, deterministic=True)
        sparams = smodel.init(
            jax.random.PRNGKey(0), feats0, jnp.full((1,), 64, jnp.int32),
            precision_to_binary_mask(2, scfg.enc_layers),
        )["params"]
        from onebit_asr_tpu.model.streaming import (
            raw_window_size,
            streaming_cache_chunks,
        )

        cs = int(scfg.attn_chunk_size)
        W = raw_window_size(cs)
        C = streaming_cache_chunks(
            scfg.enc_conv_kernel, cs, scfg.attn_left_chunks) * cs
        exp_s = export_streaming(scfg, sparams, 2)
        path_s = os.path.join(td, "stream")
        save_artifact(exp_s, path_s, artifact_meta(scfg, 2, "streaming"))
        fn_s, _ = load_artifact(path_s)
        live_s = jax.jit(build_streaming_step(scfg, sparams, 2))
        ca = cl = jnp.zeros((scfg.enc_layers, 1, C, scfg.enc_d_model),
                            jnp.bfloat16)
        cv = jnp.int32(0)
        worst = 0.0
        agree = True
        for _ in range(3):
            w = jnp.asarray(
                rng.standard_normal((1, W, scfg.input_dim)), jnp.float32)
            la, ca = fn_s(w, ca, cv, jnp.int32(cs))
            ll, cl = live_s(w, cl, cv, jnp.int32(cs))
            worst = max(worst, float(jnp.max(jnp.abs(la - ll))))
            agree &= bool(jnp.all(ca == cl))
            cv = jnp.int32(min(int(cv) + cs, C))
        ok &= _report("streaming artifact: 3 chained steps == live",
                      agree and worst < 1e-5, f"max|Δlogits|={worst:.2e}")

    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
