"""Training CLI — `python -m onebit_asr_tpu.cli.train`.

Flag parity with the reference driver (/root/reference/onebit_asr/train.py:
186-211): data_dir, save_dir, epochs, batch_size, lr, warmup_steps, model
dims, dropout, beam_size, gamma_ctc, lambda1, lambda2, resume — plus
TPU-native additions: --dummy_data (fake backend), --compute_dtype,
--no_remat, --steps_per_epoch (cap for smoke runs), --wandb.

Differences by design:
- the whole 3-branch QAT step is one jitted program; data parallelism over
  all visible devices is automatic (mesh 'data' axis);
- checkpoints are Orbax full-train-state with TRUE resume (params, opt
  state, step, RNG — the reference's --resume resumes only a wandb id);
- wandb optional; every run writes metrics.jsonl (utils/metrics_logger.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import jax
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="1.58-bit QAT Conformer ASR training (TPU)")
    # reference flags (train.py:186-211)
    p.add_argument("--preset", type=str, default="",
                   help="model family: s / m / l (overrides enc_* dims)")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--save_dir", type=str, default="./checkpoints")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup_steps", type=int, default=4000)
    p.add_argument("--input_dim", type=int, default=80)
    p.add_argument("--enc_d_model", type=int, default=256)
    p.add_argument("--enc_layers", type=int, default=12)
    p.add_argument("--enc_heads", type=int, default=4)
    p.add_argument("--enc_d_ff", type=int, default=1024)
    p.add_argument("--enc_conv_kernel", type=int, default=31)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--dec_layers", type=int, default=2)
    p.add_argument("--dec_heads", type=int, default=4)
    p.add_argument("--dec_d_ff", type=int, default=1024)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--gamma_ctc", type=float, default=0.2)
    p.add_argument("--lambda1", type=float, default=0.5)
    p.add_argument("--lambda2", type=float, default=1.0)
    p.add_argument("--resume", action="store_true", help="resume from save_dir")
    p.add_argument("--seed", type=int, default=0)
    # TPU-native additions
    p.add_argument("--dummy_data", action="store_true", help="synthetic fake backend")
    p.add_argument("--dummy_frames", type=int, default=160,
                   help="fake-backend utterance length (frames); raise "
                        "to 1024 for LibriSpeech-realistic smoke runs")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batches per optimizer step (memory/batch trade)")
    p.add_argument("--num_buckets", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=1600)
    p.add_argument("--scan_unroll", type=int, default=0,
                   help="encoder block-stack lax.scan unroll: 0 = FULL "
                        "unroll (fastest steps, biggest compile), 1 = one "
                        "compiled body (fastest compile — use when the "
                        "remote compile service struggles with the "
                        "fully-unrolled program), N = partial")
    p.add_argument("--no_spec_augment", action="store_true",
                   help="disable SpecAugment entirely. Needed for narrowband"
                        " corpora (e.g. the --hard synthetic tones): a "
                        "<=27-bin frequency mask can delete a pure tone's "
                        "only spectral evidence, making training examples "
                        "unsolvable rather than merely augmented")
    p.add_argument("--time_mask_ratio", type=float, default=0.3,
                   help="cap each SpecAugment time mask at ratio*length "
                        "(reference parity = 1.0, uncapped; the 0.3 default "
                        "is the documented NaN fix, ops/specaugment.py)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--quant_per_channel", action="store_true",
                   help="per-output-channel quantizer scales (default: "
                        "tensor-wise, reference semantics)")
    p.add_argument("--conv_norm", type=str, default="batch_norm",
                   choices=["batch_norm", "group_norm", "layer_norm"],
                   help="conv-module norm; group_norm avoids per-layer "
                        "cross-batch collectives under data parallelism; "
                        "layer_norm is per-frame (required for streaming)")
    p.add_argument("--attn_chunk_size", type=int, default=0,
                   help="U2-style chunked attention (subsampled frames); "
                        "0 = full context. With --causal_conv and "
                        "--conv_norm layer_norm the checkpoint is servable "
                        "by the streaming runtime (decode/streaming.py)")
    p.add_argument("--attn_left_chunks", type=int, default=-1,
                   help="history chunks visible to attention (-1 = all)")
    p.add_argument("--causal_conv", action="store_true",
                   help="left-only depthwise conv (streaming encoders)")
    p.add_argument("--time_pad_multiple", type=int, default=128,
                   help="lane-align the subsampled time axis to a multiple "
                        "of this (mask-correct; measured +13%% step "
                        "throughput at the canonical T'=255->256); 1 "
                        "disables")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--remat_policy", type=str, default="attn_ffn",
                   choices=["masks", "full", "attn", "attn_ffn", "dots",
                            "fused"],
                   help="what remat saves across blocks (config.py "
                        "ModelConfig.remat_policy): masks=+9%% step "
                        "throughput, full=minimum memory (Conformer-L "
                        "batch 64), attn=fastest with headroom, "
                        "attn_ffn=attn + saved FF hidden pre-activations "
                        "(skips the d->d_ff matmul recomputes, "
                        "~B*T*d_ff*2 bytes x2 per layer extra), "
                        "fused=masks + the fused attention kernel's output")
    p.add_argument("--quant_decoder", action="store_true",
                   help="quantize the AED decoder projections too, at each "
                        "branch's base precision (reference: decoder fp)")
    p.add_argument("--reference_decoder", action="store_true",
                   help="reference-exact decoder semantics for controlled "
                        "head-to-heads: position-blind post-LN stock-torch "
                        "decoder + eps/(V-1) label smoothing (undoes the "
                        "two documented deviations, "
                        "docs/REFERENCE_HEAD_TO_HEAD.md §3)")
    p.add_argument("--fused_attention", action="store_true",
                   help="Pallas fused rel-pos attention kernel (TPU; "
                        "pairs with --remat_policy fused)")
    p.add_argument("--fused_subsampler", action="store_true",
                   help="Pallas fused conv1→ReLU→conv2→ReLU subsampler "
                        "(TPU; the conv1 intermediate stays in VMEM)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-style sharding: split params + AdamW moments "
                        "over the data axis (GSPMD gathers weights on use); "
                        "cuts per-chip state memory ~Nx at Conformer-L")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help=">1: Megatron-style tensor parallelism — shard the "
                        "QuantDense hidden dims (column/row parallel) and "
                        "their AdamW moments over a 'model' mesh axis of "
                        "this size; composes with data parallelism over "
                        "the remaining devices and with --grad_accum "
                        "(parallel/sharding_rules.py)")
    p.add_argument("--pipeline_stages", type=int, default=1,
                   help=">1: GPipe pipeline parallelism — shard the encoder "
                        "block stack over a 'stage' mesh axis of this size "
                        "(must divide enc_layers and the device count; "
                        "requires --conv_norm group_norm/layer_norm)")
    p.add_argument("--pipeline_microbatches", type=int, default=2,
                   help="microbatches per pipeline step (bubble fraction "
                        "(S-1)/(M+S-1); must divide the per-data-shard batch)")
    p.add_argument("--steps_per_epoch", type=int, default=0, help="0 = full epoch")
    p.add_argument("--multistep", type=int, default=1,
                   help=">1: run K optimizer steps per compiled dispatch "
                        "(lax.scan over K same-bucket batches) — "
                        "amortizes host dispatch latency on single-chip/"
                        "tunneled setups; identical math to K steps")
    p.add_argument("--eval_batches", type=int, default=0, help="0 = all")
    p.add_argument("--eval_beam", action="store_true", help="beam search in eval")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--run_name", type=str, default="")
    p.add_argument("--summary", action="store_true",
                   help="print a per-module parameter table before training "
                        "(reference torchinfo summary parity)")
    p.add_argument("--debug_nans", action="store_true",
                   help="raise on first NaN inside jit (jax_debug_nans)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture an XProf trace of epoch 0 to this dir")
    p.add_argument("--fp32_control", action="store_true",
                   help="no-QAT control run: train ONE full-precision "
                        "branch with the plain CTC+attention loss (no "
                        "student/SP/KL) on the identical architecture and "
                        "schedule — quantifies the QAT gap next to the "
                        "2-bit/1-bit rows (fp32-only eval each epoch)")
    p.add_argument("--prefetch_depth", type=int, default=4,
                   help="host->device prefetch queue depth (batches built "
                        "ahead on the background thread); each epoch logs "
                        "input_wait_frac — the fraction of wall time the "
                        "consumer blocked on the host pipeline")
    return p


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import (
        enable_persistent_compile_cache,
        respect_jax_platforms_env,
    )
    respect_jax_platforms_env()
    enable_persistent_compile_cache()
    args = build_argparser().parse_args(argv)

    # rbg PRNG: hardware-friendly dropout mask generation (threefry costs
    # ~18% of the 3-branch step on v5e); counter-based and reproducible,
    # just a different stream than the default. Shared with eval/transcribe
    # (the rng key SHAPE must match across save/restore).
    from onebit_asr_tpu.utils.platform import set_default_prng_impl

    set_default_prng_impl()

    if args.debug_nans:
        from onebit_asr_tpu.utils.profiling import debug_nans

        debug_nans(True)

    from onebit_asr_tpu.data import DummyDataModule
    from onebit_asr_tpu.eval import evaluate_stream
    from onebit_asr_tpu.eval.evaluate import build_eval_steps
    from onebit_asr_tpu.model.asr import ConformerASR
    from onebit_asr_tpu.parallel import make_mesh, replicate, shard_batch
    from onebit_asr_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from onebit_asr_tpu.utils.checkpoint import (
        CheckpointManager,
        abstract_like,
        save_config,
    )
    from onebit_asr_tpu.utils.config import (
        DataConfig,
        FrontendConfig,
        LossConfig,
        ModelConfig,
        OptimConfig,
        SpecialTokens,
        TrainConfig,
    )
    from onebit_asr_tpu.utils.metrics_logger import MetricsLogger

    specials = SpecialTokens()
    tokenizer = None

    if args.dummy_data:
        dm = DummyDataModule(
            batch_size=args.batch_size, max_frames=args.dummy_frames
        )
        vocab_size = dm.vocab_size()
        get_train = lambda epoch: dm.train_batches(epoch)
        get_valid = lambda: dm.valid_batches()
    else:
        from onebit_asr_tpu.data.librispeech import LibriSpeechDataModule
        from onebit_asr_tpu.data.text import AsrTokenizer

        try:
            # accepts tokenizer.json OR a reference SPM tokenizer.model
            tokenizer = AsrTokenizer.find_and_load(args.data_dir, specials)
        except FileNotFoundError:
            print(
                f"no tokenizer artifact in {args.data_dir}; run "
                f"`python -m onebit_asr_tpu.cli.prepare` first "
                f"(reference main.py:30-39 equivalent)",
                file=sys.stderr,
            )
            return 2
        dm = LibriSpeechDataModule(
            args.data_dir,
            tokenizer,
            DataConfig(
                data_dir=args.data_dir,
                batch_size=args.batch_size,
                num_buckets=args.num_buckets,
                max_frames=args.max_frames,
            ),
            seed=args.seed,
            frontend_cfg=FrontendConfig(
                time_mask_ratio=args.time_mask_ratio,
                spec_augment=not args.no_spec_augment,
            ),
        )
        vocab_size = dm.vocab_size()
        key = jax.random.PRNGKey(args.seed)
        get_train = lambda epoch: dm.featurized_batches(
            "train", epoch, augment=True, key=jax.random.fold_in(key, epoch)
        )
        get_valid = lambda: dm.featurized_batches("dev", augment=False)

    if args.preset:
        from onebit_asr_tpu.model.presets import PRESETS

        for k, v in PRESETS[args.preset].items():
            setattr(args, k, v)
    model_cfg = ModelConfig(
        input_dim=args.input_dim,
        vocab_size=vocab_size,
        enc_d_model=args.enc_d_model,
        enc_layers=args.enc_layers,
        enc_heads=args.enc_heads,
        enc_d_ff=args.enc_d_ff,
        enc_conv_kernel=args.enc_conv_kernel,
        dropout=args.dropout,
        dec_layers=args.dec_layers,
        dec_heads=args.dec_heads,
        dec_d_ff=args.dec_d_ff,
        specials=specials,
        compute_dtype=args.compute_dtype,
        remat_blocks=not args.no_remat,
        remat_policy=args.remat_policy,
        conv_norm=args.conv_norm,
        quant_per_channel=args.quant_per_channel,
        quant_decoder=args.quant_decoder,
        reference_decoder=args.reference_decoder,
        causal_conv=args.causal_conv,
        attn_chunk_size=args.attn_chunk_size or None,
        attn_left_chunks=args.attn_left_chunks,
        time_pad_multiple=args.time_pad_multiple,
        fused_attention=args.fused_attention,
        fused_subsampler=args.fused_subsampler,
        scan_unroll=args.scan_unroll,
        # explicit TP plumbing: under a 'model' mesh axis the split-QKV
        # MHSA layout avoids the partitioner's per-boundary
        # collective-permutes (see RelPosMHSA); plumbed here rather than
        # relying on the ambient-mesh fallback probe
        split_qkv=args.tensor_parallel > 1,
    )
    loss_cfg = LossConfig(
        gamma_ctc=args.gamma_ctc, lambda1=args.lambda1, lambda2=args.lambda2,
        reference_smoothing=args.reference_decoder,
    )
    optim_cfg = OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps)

    # steps for the schedule: like the reference, epochs * steps_per_epoch
    first_epoch = list(get_train(0)) if args.dummy_data else None
    if args.dummy_data:
        steps_per_epoch = len(first_epoch)
    else:
        steps_per_epoch = max(1, dm.num_utts("train") // args.batch_size)
    if args.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
    total_steps = args.epochs * steps_per_epoch

    train_cfg = TrainConfig(
        model=model_cfg,
        loss=loss_cfg,
        data=DataConfig(data_dir=args.data_dir, batch_size=args.batch_size),
        optim=optim_cfg,
        epochs=args.epochs,
        seed=args.seed,
        save_dir=args.save_dir,
        beam_size=args.beam_size,
    )

    run_name = args.run_name or f"run-{int(time.time())}"
    run_dir = os.path.join(args.save_dir, run_name)
    os.makedirs(run_dir, exist_ok=True)
    save_config(run_dir, train_cfg)
    logger = MetricsLogger(
        run_dir, use_wandb=args.wandb,
        config=dataclasses.asdict(train_cfg),
    )

    model = ConformerASR.from_config(model_cfg, deterministic=False)
    eval_model = ConformerASR.from_config(model_cfg, deterministic=True)
    optimizer = make_optimizer(optim_cfg, total_steps)

    sample = next(iter(first_epoch)) if args.dummy_data else next(get_train(0))
    t0 = time.time()
    state = create_train_state(
        model, optimizer, jax.random.PRNGKey(args.seed), sample, args.enc_layers
    )
    from onebit_asr_tpu.train.state import param_count

    print(
        f"model: {param_count(state.params)/1e6:.2f}M params, "
        f"vocab {vocab_size}, init {time.time()-t0:.1f}s, "
        f"devices {jax.device_count()}"
    )
    if args.time_mask_ratio != 1.0:
        # deliberate deviation from reference SpecAugment (uncapped time
        # masks = ratio 1.0); surface it so parity runs don't forget to
        # set --time_mask_ratio 1.0 (see ops/specaugment.py NaN note)
        print(
            f"SpecAugment time masks capped at {args.time_mask_ratio}x"
            "utterance length (reference parity needs --time_mask_ratio 1.0)"
        )
    if args.summary:
        # per-module parameter table (reference torchinfo parity,
        # conformer.py:325-367)
        import jax.numpy as jnp

        from onebit_asr_tpu.model.asr import precision_to_binary_mask

        print(
            __import__("flax.linen", fromlist=["tabulate"]).tabulate(
                eval_model,
                jax.random.PRNGKey(0),
                depth=3,
            )(
                jnp.asarray(sample["feats"]),
                jnp.asarray(sample["feat_lens"]),
                precision_to_binary_mask(2, args.enc_layers),
            )
        )

    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    ckpt_best = CheckpointManager(os.path.join(run_dir, "ckpt_best"), max_to_keep=1)
    start_epoch = 0
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(abstract_like(state))
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    if args.tensor_parallel > 1 and (args.pipeline_stages > 1 or args.fsdp):
        print("FATAL: --tensor_parallel composes with data parallelism and "
              "--grad_accum, not with --pipeline_stages/--fsdp (pick one "
              "model-axis strategy)")
        return 1

    if args.tensor_parallel > 1:
        # Megatron TP: 2-D (data x model) mesh; QuantDense hidden dims +
        # their AdamW moments shard over 'model'
        # (parallel/sharding_rules.py), batch over 'data'; the train step
        # is the SAME jitted GSPMD program — the partitioner inserts the
        # column->row activation collectives (dryrun mode 2 pins the loss
        # equal to the replicated layout at rtol 2e-4).
        from onebit_asr_tpu.parallel import shard_state_tp

        TP = args.tensor_parallel
        n_dev = len(jax.devices())
        if n_dev % TP:
            print(f"FATAL: {n_dev} devices not divisible by "
                  f"--tensor_parallel {TP}")
            return 1
        data_size = n_dev // TP
        if args.batch_size % data_size:
            print(f"FATAL: batch {args.batch_size} not divisible by "
                  f"data axis {data_size}")
            return 1
        mesh = make_mesh((data_size, TP), ("data", "model"))
        state = shard_state_tp(state, mesh)
        step_fn = jax.jit(
            make_train_step(
                model, optimizer, loss_cfg, specials, args.enc_layers,
                grad_accum=args.grad_accum,
            ),
            donate_argnums=(0,),
        )
        print(f"tensor parallelism: {TP}-way model axis x {data_size} data")
    elif args.pipeline_stages > 1:
        # GPipe: 2-D (data x stage) mesh; block params + moments shard over
        # 'stage', batch over 'data' (parallel/pipeline.py)
        from onebit_asr_tpu.parallel import (
            make_pipeline_train_step,
            shard_state_pipeline,
        )

        if args.grad_accum > 1:
            print("FATAL: --grad_accum is not supported with "
                  "--pipeline_stages (microbatches already split the batch)")
            return 1
        S = args.pipeline_stages
        n_dev = len(jax.devices())
        if n_dev % S:
            print(f"FATAL: {n_dev} devices not divisible by {S} stages")
            return 1
        data_size = n_dev // S
        if args.batch_size % data_size:
            print(f"FATAL: batch {args.batch_size} not divisible by "
                  f"data axis {data_size}")
            return 1
        mesh = make_mesh((data_size, S), ("data", "stage"))
        state = shard_state_pipeline(state, mesh)
        step_fn = make_pipeline_train_step(
            model, optimizer, loss_cfg, specials, args.enc_layers, mesh,
            microbatches=args.pipeline_microbatches,
            grad_clip_norm=optim_cfg.grad_clip_norm,
        )
        print(f"pipeline parallelism: {S} stages x {data_size} data, "
              f"{args.pipeline_microbatches} microbatches")
    else:
        # data mesh over the largest device count that divides the batch
        n_dev = len(jax.devices())
        while args.batch_size % n_dev:
            n_dev -= 1
        mesh = make_mesh(devices=jax.devices()[:n_dev])
        if n_dev < len(jax.devices()):
            print(f"using {n_dev}/{len(jax.devices())} devices (batch divisibility)")
        if args.fsdp:
            if args.fp32_control:
                print("FATAL: --fsdp does not compose with --fp32_control "
                      "(the control run is a single-branch diagnostic)")
                return 1
            from onebit_asr_tpu.parallel import (
                make_fsdp_train_step,
                shard_state_fsdp,
            )

            # ZeRO-2 with explicit collectives: params + AdamW moments
            # stored sharded, weights all-gathered at use, gradients
            # combined with psum_scatter (reduce-scatter — 1/N bytes per
            # chip), distributed global-norm clip (parallel/fsdp.py
            # make_fsdp_train_step)
            step_fn = make_fsdp_train_step(
                model, optimizer, loss_cfg, specials, args.enc_layers,
                mesh, state, grad_accum=args.grad_accum,
                optim_cfg=optim_cfg,
            )
            state = shard_state_fsdp(state, mesh)
            print(f"FSDP/ZeRO-2: params + moments sharded over {n_dev} "
                  f"devices, gradients reduce-scattered")
        elif args.fp32_control:
            state = jax.device_put(state, replicate(mesh))
            from onebit_asr_tpu.train import make_fp32_train_step

            step_fn = jax.jit(
                make_fp32_train_step(
                    model, optimizer, loss_cfg, specials, args.enc_layers,
                    grad_accum=args.grad_accum,
                ),
                donate_argnums=(0,),
            )
            print("fp32 control: single full-precision branch, no QAT")
        else:
            state = jax.device_put(state, replicate(mesh))
            step_fn = jax.jit(
                make_train_step(
                    model, optimizer, loss_cfg, specials, args.enc_layers,
                    grad_accum=args.grad_accum,
                ),
                donate_argnums=(0,),
            )

    multi_step_fn = None
    if args.multistep > 1:
        # K steps per compiled dispatch (lax.scan over stacked same-bucket
        # batches): amortizes the per-launch host cost — +3% on the bench
        # of record through the tunneled device (319.2 -> 329.3 utt/s).
        # Same math as K separate steps. Single-data-device only: sharding
        # a stacked [K, B, ...] batch over 'data' would split the K steps,
        # not the batch — multi-chip setups amortize via DP instead.
        if args.fsdp or args.fp32_control or args.tensor_parallel > 1 or (
            args.pipeline_stages > 1
        ):
            print("FATAL: --multistep composes only with the plain QAT "
                  "path (not fsdp/tp/pp/fp32_control)")
            return 1
        if len(mesh.devices.flatten()) != 1:
            print("FATAL: --multistep is the single-chip dispatch-"
                  "amortization knob; use data parallelism on multi-chip")
            return 1
        from onebit_asr_tpu.train.step import make_multi_train_step

        multi_step_fn = jax.jit(
            make_multi_train_step(
                model, optimizer, loss_cfg, specials, args.enc_layers,
                grad_accum=args.grad_accum,
            ),
            donate_argnums=(0,),
        )

    # Activate the mesh context for the rest of main() so the model's
    # sharding anchors (parallel.mesh.constrain — e.g. the decoder's
    # batch-over-'data' layout hints) bind to this mesh inside jit.
    # Scoped with try/finally: a process-global set_mesh leaks into any
    # later jit in the same process (it broke 24 unrelated tests when
    # main() ran inside pytest).
    _mesh_ctx = jax.sharding.set_mesh(mesh)  # enters at construction
    try:

        eval_precisions = (32,) if args.fp32_control else (32, 2, 1)
        eval_steps = build_eval_steps(
            eval_model, loss_cfg, specials, args.enc_layers,
            precisions=eval_precisions,
        )
        best_val = float("inf")
        for epoch in range(start_epoch, args.epochs):
            t_ep = time.time()
            n_utts = 0
            losses = []
            batches = first_epoch if args.dummy_data else get_train(epoch)
            profile_ctx = None
            if args.profile_dir and epoch == start_epoch:
                from onebit_asr_tpu.utils.profiling import trace

                profile_ctx = trace(args.profile_dir)
                profile_ctx.__enter__()
            from onebit_asr_tpu.data.prefetch import prefetch

            def _cap(it):
                for i, b in enumerate(it):
                    if args.steps_per_epoch and i >= args.steps_per_epoch:
                        return
                    yield b

            pf_stats: dict = {}

            def _group_multistep(it, K):
                """Group same-shaped (same-bucket) batches into stacked
                [K, B, ...] pytrees for the multi-step dispatch; odd
                leftovers flush through the single-step path."""
                from onebit_asr_tpu.train.step import stack_batches

                buf: dict = {}
                for b in it:
                    k = tuple(np.shape(b["feats"]))
                    buf.setdefault(k, []).append(dict(b))
                    if len(buf[k]) == K:
                        yield stack_batches(buf.pop(k))
                for bs in buf.values():
                    yield from bs

            batch_iter = _cap(batches)
            if multi_step_fn is not None:
                batch_iter = _group_multistep(batch_iter, args.multistep)
            for batch in prefetch(
                batch_iter, transfer=lambda b: shard_batch(dict(b), mesh),
                depth=args.prefetch_depth, stats=pf_stats,
            ):
                stacked = batch["feats"].ndim == 4  # [K, B, T, F]
                if stacked:
                    state, aux = multi_step_fn(state, batch)
                else:
                    state, aux = step_fn(state, batch)
                losses.append(aux["loss"])
                n_utts += int(np.prod(batch["tokens"].shape[:-1]))
            if profile_ctx is not None:
                profile_ctx.__exit__(None, None, None)
            train_loss = float(np.mean([float(l) for l in losses]))
            dt = time.time() - t_ep
            if not np.isfinite(train_loss):
                print(f"FATAL: non-finite train loss at epoch {epoch}")
                return 1

            from onebit_asr_tpu.train.optim import make_schedule
            from onebit_asr_tpu.utils.profiling import host_rss_gb, malloc_trim

            # bound long-soak host RSS: the round-4 leak was glibc arena
            # retention on the device-client transfer path (flat device
            # buffers, RSS tracking transfer bytes); trim each epoch so the
            # telemetry below records the TRUE live set, and the 40-epoch
            # soak ends RSS-flat instead of OOM-killed at epoch 30
            malloc_trim()
            metrics = {
                "epoch": epoch,
                "train_loss": train_loss,
                "epoch_seconds": dt,
                "utt_per_sec": n_utts / dt,
                # long-run leak telemetry: host resident set + device
                # buffer count once per epoch (the round-4 capstone was
                # OOM-killed at epoch 30 by a ~4 GB/epoch host leak —
                # these two series say WHERE to look: host-only growth
                # with flat live_buffers = host allocator/relay,
                # growing live_buffers = python references pinning
                # device arrays)
                "host_rss_gb": host_rss_gb(),
                "live_buffers": len(jax.live_arrays()),
                # fraction of epoch wall time the consumer spent blocked on the
                # host input pipeline (0 = fully compute-bound, ~1 = input-bound)
                "input_wait_frac": pf_stats.get("wait_s", 0.0) / max(dt, 1e-9),
                "lr": float(make_schedule(optim_cfg, total_steps)(int(state.step))),
            }
            eval_metrics = evaluate_stream(
                eval_model,
                state.params,
                get_valid(),
                loss_cfg,
                specials,
                args.enc_layers,
                tokenizer=tokenizer,
                use_beam=args.eval_beam,
                beam_size=args.beam_size,
                max_batches=args.eval_batches or None,
                eval_steps=eval_steps,
                precisions=eval_precisions,
            )
            metrics.update(eval_metrics)
            logger.log(metrics, step=int(state.step))
            val_tag = "32bit" if args.fp32_control else "2bit"
            wers = "/".join(
                f"{eval_metrics[f'wer_{t}']:.3f}"
                for t in ("32bit", "2bit", "1bit")
                if f"wer_{t}" in eval_metrics
            )
            print(
                f"epoch {epoch}: train {train_loss:.3f} "
                f"val({val_tag}) "
                f"{eval_metrics.get(f'loss_{val_tag}', float('nan')):.3f} "
                f"wer {wers} ({n_utts/dt:.1f} utt/s)"
            )

            # last + best checkpoints (reference ckpt_last/best parity,
            # train.py:307-318 — but with full train-state resume)
            val_key = "loss_32bit" if args.fp32_control else "loss_2bit"
            ckpt.save(state, metrics={"val_loss": eval_metrics.get(val_key, 0.0)})
            if eval_metrics.get(val_key, float("inf")) < best_val:
                best_val = eval_metrics[val_key]
                ckpt_best.save(state, metrics={"val_loss": best_val})

        logger.close()
        ckpt.close()
        ckpt_best.close()
        return 0


    finally:
        _mesh_ctx.__exit__(None, None, None)

if __name__ == "__main__":
    raise SystemExit(main())
