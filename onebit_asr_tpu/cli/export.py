"""Export CLI — `python -m onebit_asr_tpu.cli.export {offline,streaming,run}`.

Serializes a trained checkpoint into a self-contained StableHLO serving
artifact (see onebit_asr_tpu/export.py), and can run such an artifact
standalone (`run`) to prove it needs nothing but jax.

The reference has no export path — deployment means unpickling the torch
checkpoint into the full source tree (/root/reference/eval.py:220-283).

Examples:
    python -m onebit_asr_tpu.cli.export offline --checkpoint runs/exp1 \
        --precision 2 --batch 16 --frames 1024 --out exp1.export
    python -m onebit_asr_tpu.cli.export offline --checkpoint runs/exp1 \
        --symbolic_batch --emit logprobs --out exp1_anyB.export
    python -m onebit_asr_tpu.cli.export streaming --checkpoint runs/stream1 \
        --precision 2 --out stream1.export
    python -m onebit_asr_tpu.cli.export run --artifact exp1.export \
        --features feats.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _restore(run_dir: str):
    """(cfg, params) from a cli.train run directory."""
    import jax
    import jax.numpy as jnp

    from onebit_asr_tpu.model.asr import ConformerASR
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.utils.checkpoint import (
        CheckpointManager,
        abstract_like,
        load_config,
    )

    cfg = load_config(run_dir)
    if cfg is None:
        raise SystemExit(f"no config.json in {run_dir}")
    model = ConformerASR.from_config(cfg.model, deterministic=True)
    sample = {
        "feats": jnp.zeros((1, 64, cfg.model.input_dim), jnp.float32),
        "feat_lens": jnp.full((1,), 64, jnp.int32),
        "tokens": jnp.zeros((1, 8), jnp.int32),
        "token_lens": jnp.ones((1,), jnp.int32),
    }
    state = create_train_state(
        model, make_optimizer(cfg.optim, total_steps=1),
        jax.random.PRNGKey(0), sample, cfg.model.enc_layers,
    )
    mgr = CheckpointManager(f"{run_dir}/ckpt")
    state = mgr.restore(abstract_like(state))
    mgr.close()
    print(f"restored step {int(state.step)} from {run_dir}")
    return cfg, state.params


def _cmd_offline(args) -> int:
    from onebit_asr_tpu.export import (
        artifact_meta,
        export_offline,
        save_artifact,
    )

    cfg, params = _restore(args.checkpoint)
    batch = None if args.symbolic_batch else args.batch
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    decode_kwargs = {}
    if args.emit == "beam":
        lm = None
        if args.lm:
            from onebit_asr_tpu.decode.lm import NGramLM
            from onebit_asr_tpu.decode.lm_device import DeviceLM

            lm = DeviceLM.pack(NGramLM.load(args.lm))
            print(f"baking n-gram LM tables from {args.lm} into the artifact")
        decode_kwargs = dict(
            beam_size=args.beam_size, lm=lm, lm_weight=args.lm_weight,
            length_bonus=args.length_bonus,
        )
    exported = export_offline(
        cfg.model, params, args.precision, args.frames, batch,
        packed=args.packed, emit=args.emit, platforms=platforms,
        **decode_kwargs,
    )
    meta = artifact_meta(
        cfg.model, args.precision, "offline", emit=args.emit,
        packed=args.packed,
        extra={"num_frames": args.frames,
               "batch_size": batch if batch is not None else "symbolic",
               **({"beam_size": args.beam_size, "lm": bool(args.lm),
                   "lm_weight": args.lm_weight,
                   "length_bonus": args.length_bonus}
                  if args.emit == "beam" else {})},
    )
    save_artifact(exported, args.out, meta)
    print(f"wrote {args.out} (platforms {list(exported.platforms)}, "
          f"in {[str(a) for a in exported.in_avals]})")
    return 0


def _cmd_streaming(args) -> int:
    from onebit_asr_tpu.export import (
        artifact_meta,
        export_streaming,
        save_artifact,
    )
    from onebit_asr_tpu.model.streaming import (
        raw_window_size,
        streaming_cache_chunks,
    )

    cfg, params = _restore(args.checkpoint)
    m = cfg.model
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    exported = export_streaming(m, params, args.precision,
                                n_streams=args.n_streams,
                                platforms=platforms)
    cs = int(m.attn_chunk_size)
    meta = artifact_meta(
        m, args.precision, "streaming",
        extra={
            "chunk_size": cs,
            "window_raw": raw_window_size(cs),
            "hop_raw": 4 * cs,
            "cache_frames": streaming_cache_chunks(
                m.enc_conv_kernel, cs, m.attn_left_chunks) * cs,
            "n_streams": args.n_streams,
        },
    )
    save_artifact(exported, args.out, meta)
    print(f"wrote {args.out} (platforms {list(exported.platforms)})")
    return 0


def _cmd_run(args) -> int:
    """Load an artifact and decode features with it — imports ONLY jax on
    the hot path (the point of an export)."""
    from onebit_asr_tpu.export import greedy_ids_to_lists, load_artifact

    fn, meta = load_artifact(args.artifact)
    if meta["kind"] != "offline":
        raise SystemExit("run supports offline artifacts (the streaming "
                         "step needs the session driver's state protocol)")
    T = int(meta["num_frames"])
    F = int(meta["model"]["input_dim"])
    if args.features:
        data = np.load(args.features)
        feats_in = data["feats"].astype(np.float32)
        lens_in = data.get("feat_lens")
        if feats_in.ndim == 2:
            feats_in = feats_in[None]
        if lens_in is None:
            lens_in = np.array([feats_in.shape[1]] * len(feats_in))
    else:
        rng = np.random.default_rng(0)
        feats_in = rng.standard_normal((2, T // 2, F)).astype(np.float32)
        lens_in = np.array([T // 2, T // 3])
        print("no --features given; decoding random noise as a smoke test")
    B_art = meta["batch_size"]
    B = len(feats_in) if B_art == "symbolic" else int(B_art)
    feats = np.zeros((B, T, F), np.float32)
    lens = np.zeros((B,), np.int32)
    n = min(len(feats_in), B)
    for i in range(n):
        t = min(feats_in.shape[1], T, int(lens_in[i]))
        feats[i, :t] = feats_in[i, :t]
        lens[i] = t
    out = fn(feats, lens)
    emit = meta.get("emit", "greedy")
    if emit == "logprobs":
        log_probs, enc_lens = out
        print(f"log_probs {log_probs.shape}, enc_lens "
              f"{np.asarray(enc_lens)[:n].tolist()}")
        return 0
    ids, lens_out = out[0], out[1]
    for i, hyp in enumerate(greedy_ids_to_lists(ids, lens_out)[:n]):
        print(f"utt {i}: {hyp}")
    return 0


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import (
        respect_jax_platforms_env,
        set_default_prng_impl,
    )
    respect_jax_platforms_env()
    set_default_prng_impl()
    from onebit_asr_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    po = sub.add_parser("offline", help="export the batch forward")
    po.add_argument("--checkpoint", required=True, help="cli.train run dir")
    po.add_argument("--out", required=True, help="artifact directory to write")
    po.add_argument("--precision", type=int, default=2, choices=(1, 2, 32))
    po.add_argument("--batch", type=int, default=8)
    po.add_argument("--symbolic_batch", action="store_true",
                    help="export a symbolic batch dim (any B, one artifact)")
    po.add_argument("--frames", type=int, default=1024,
                    help="static padded frame count T")
    po.add_argument("--packed", action="store_true",
                    help="planar-packed 2-bit weights via the Pallas ternary "
                         "matmul (TPU-only artifact)")
    po.add_argument("--emit", default="greedy",
                    choices=("greedy", "logprobs", "both", "beam"))
    po.add_argument("--beam_size", type=int, default=10)
    po.add_argument("--lm", default="",
                    help="with --emit beam: n-gram LM (.npz from `prepare "
                         "lm`) packed + baked into the artifact")
    po.add_argument("--lm_weight", type=float, default=0.3)
    po.add_argument("--length_bonus", type=float, default=0.0)
    po.add_argument("--platforms", default="",
                    help="comma list, e.g. 'tpu,cpu' (default: current)")

    ps = sub.add_parser("streaming", help="export one streaming chunk step")
    ps.add_argument("--checkpoint", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--precision", type=int, default=2, choices=(1, 2, 32))
    ps.add_argument("--n_streams", type=int, default=1,
                    help=">1: export the StreamingServer's multiplexed "
                         "batched chunk step (serve N concurrent streams "
                         "from the artifact; see export.py "
                         "streaming_server_from_artifact)")
    ps.add_argument("--platforms", default="")

    pr = sub.add_parser("run", help="decode with a saved artifact")
    pr.add_argument("--artifact", required=True)
    pr.add_argument("--features", default="",
                    help="npz with feats [B,T,F] (+ optional feat_lens [B])")

    args = p.parse_args(argv)
    if args.cmd == "offline":
        return _cmd_offline(args)
    if args.cmd == "streaming":
        return _cmd_streaming(args)
    return _cmd_run(args)


if __name__ == "__main__":
    sys.exit(main())
