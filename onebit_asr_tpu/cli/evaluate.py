"""Evaluation CLI — `python -m onebit_asr_tpu.cli.evaluate --checkpoint …`.

Parity with the reference's `eval.py` (/root/reference/eval.py:209-291):
loads a checkpoint (+ its config.json), rebuilds the model, evaluates WER at
fp32 / 2-bit / 1-bit on the requested splits with CTC prefix beam search
(beam 10) or on-device greedy decode, prints a summary table.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import (
        enable_persistent_compile_cache,
        respect_jax_platforms_env,
    )
    respect_jax_platforms_env()
    enable_persistent_compile_cache()
    from onebit_asr_tpu.utils.platform import set_default_prng_impl
    set_default_prng_impl()  # rng key shape must match train-time checkpoints
    p = argparse.ArgumentParser(description="multi-precision WER evaluation")
    p.add_argument("--checkpoint", type=str, default="",
                   help="run dir written by cli.train (contains config.json + ckpt/)")
    p.add_argument("--torch_checkpoint", type=str, default="",
                   help="a REFERENCE torch checkpoint (.pt, train.py:307-318 "
                        "payload or bare state_dict) — the reference's own "
                        "deployment flow (eval.py:209-291): hyperparams from "
                        "the payload's args + sibling/--config config.json, "
                        "weights mapped via utils/torch_import.py, WER at "
                        "--precisions")
    p.add_argument("--config", type=str, default="",
                   help="with --torch_checkpoint: reference config.json "
                        "(default: the .pt's sibling, as reference "
                        "eval.py:51-62)")
    p.add_argument("--spm", type=str, default="",
                   help="with --torch_checkpoint: reference SPM "
                        "tokenizer.model for text decoding (default: search "
                        "--data_dir)")
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--splits", type=str, default="dev")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--greedy", action="store_true", help="greedy decode instead of beam")
    p.add_argument("--precisions", type=str, default="32,2,1")
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--dummy_data", action="store_true")
    p.add_argument("--print_samples", type=int, default=0,
                   help="print the first N ref/hyp pairs (reference eval.py prints samples)")
    p.add_argument("--int8_act", action="store_true",
                   help="with --packed: int8 per-row activation quantization "
                        "onto the MXU integer path (W2A8; 2x bf16 peak; "
                        "lossy — compare WER against plain --packed)")
    p.add_argument("--packed", action="store_true",
                   help="serve the encoder from planar-packed 2-bit weights "
                        "via the Pallas ternary matmul (precisions 2/1 only)")
    p.add_argument("--lm", type=str, default="",
                   help="n-gram LM (.npz from `prepare lm`) for shallow "
                        "fusion in beam search")
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--length_bonus", type=float, default=0.0)
    p.add_argument("--no_fused_kernels", action="store_true",
                   help="evaluate with the XLA attention/subsampler paths "
                        "even if the checkpoint was trained with the fused "
                        "Pallas kernels (identical parameters; useful off-"
                        "TPU, where Pallas runs in slow interpret mode)")
    p.add_argument("--streaming", action="store_true",
                   help="decode through the incremental StreamingSession "
                        "(checkpoint must be chunked-causal; greedy CTC)")
    args = p.parse_args(argv)

    from onebit_asr_tpu.data import DummyDataModule
    from onebit_asr_tpu.eval import evaluate_stream
    from onebit_asr_tpu.model.asr import ConformerASR
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.utils.checkpoint import (
        CheckpointManager,
        abstract_like,
        load_config,
    )
    from onebit_asr_tpu.utils.config import DataConfig, SpecialTokens

    torch_mode = bool(args.torch_checkpoint)
    if not torch_mode and not args.checkpoint:
        p.error("one of --checkpoint / --torch_checkpoint is required")
    if torch_mode and args.streaming:
        p.error("--streaming needs a chunked-causal checkpoint trained by "
                "this framework; reference checkpoints are full-context")

    if torch_mode:
        import json

        from onebit_asr_tpu.utils.config import LossConfig, ModelConfig
        from onebit_asr_tpu.utils.torch_import import (
            import_reference_state_dict,
            load_reference_checkpoint,
        )

        sd, train_args = load_reference_checkpoint(args.torch_checkpoint)
        # sibling config.json overrides, exactly the reference's own lookup
        # (eval.py:51-62, 229-241)
        cfg_path = args.config or os.path.join(
            os.path.dirname(os.path.abspath(args.torch_checkpoint)),
            "config.json",
        )
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                overrides = json.load(f)
            for k in ("input_dim", "enc_d_model", "enc_layers", "enc_heads",
                      "enc_d_ff", "enc_conv_kernel", "dropout", "dec_layers",
                      "dec_heads", "dec_d_ff"):
                if k in overrides:
                    train_args[k] = overrides[k]
            print(f"config overrides from {cfg_path}")
        vocab_size = int(sd["ctc_head.weight"].shape[0])
        model_cfg = ModelConfig(
            input_dim=int(train_args.get("input_dim", 80)),
            vocab_size=vocab_size,
            enc_d_model=int(train_args.get("enc_d_model", 256)),
            enc_layers=int(train_args.get("enc_layers", 12)),
            enc_heads=int(train_args.get("enc_heads", 4)),
            enc_d_ff=int(train_args.get("enc_d_ff", 1024)),
            enc_conv_kernel=int(train_args.get("enc_conv_kernel", 31)),
            dropout=float(train_args.get("dropout", 0.1)),
            dec_layers=int(train_args.get("dec_layers", 2)),
            dec_heads=int(train_args.get("dec_heads", 4)),
            dec_d_ff=int(train_args.get("dec_d_ff", 1024)),
            # f32: scoring a reference-trained model is a parity surface,
            # not a throughput one (the reference evaluates in f32 too)
            compute_dtype="float32",
            conv_norm="batch_norm",
        )
        loss_cfg = LossConfig(
            gamma_ctc=float(train_args.get("gamma_ctc", 0.2)),
        )
        imported_params = import_reference_state_dict(
            sd, model_cfg.input_dim, model_cfg.enc_layers,
            model_cfg.dec_layers,
        )
        print(
            f"imported reference checkpoint {args.torch_checkpoint}: "
            f"{model_cfg.enc_layers}-layer d={model_cfg.enc_d_model} "
            f"encoder, vocab {vocab_size}"
        )
        cfg = None
        run_dir = ""
    else:
        run_dir = args.checkpoint
        cfg = load_config(run_dir)
        if cfg is None:
            print(f"no config.json in {run_dir}", file=sys.stderr)
            return 2
        model_cfg = cfg.model
        loss_cfg = cfg.loss
    if args.no_fused_kernels:
        import dataclasses

        model_cfg = dataclasses.replace(
            model_cfg, fused_attention=False, fused_subsampler=False
        )
    specials = model_cfg.specials
    tokenizer = None

    if args.dummy_data:
        dm = DummyDataModule(batch_size=args.batch_size)
        streams = {"dummy": lambda: dm.valid_batches()}
    else:
        from onebit_asr_tpu.data.librispeech import LibriSpeechDataModule
        from onebit_asr_tpu.data.text import AsrTokenizer

        data_dir = args.data_dir or (cfg.data.data_dir if cfg else "data")
        # accepts tokenizer.json OR a reference SPM tokenizer.model
        if args.spm:
            tokenizer = AsrTokenizer.load(args.spm, specials)
        else:
            tokenizer = AsrTokenizer.find_and_load(data_dir, specials)
        if tokenizer.vocab_size != model_cfg.vocab_size:
            print(
                f"warning: tokenizer vocab {tokenizer.vocab_size} != model "
                f"vocab {model_cfg.vocab_size}", file=sys.stderr,
            )
        dm = LibriSpeechDataModule(
            data_dir, tokenizer,
            DataConfig(data_dir=data_dir, batch_size=args.batch_size),
            splits=tuple(args.splits.split(",")),
        )
        streams = {
            s: (lambda s=s: dm.featurized_batches(s, augment=False,
                                                  batch_size=args.batch_size))
            for s in args.splits.split(",")
        }

    model = ConformerASR.from_config(model_cfg, deterministic=True)
    if torch_mode:
        ckpt = None
        eval_params = jax.device_put(imported_params)
    else:
        optimizer = make_optimizer(cfg.optim, total_steps=1)
        sample = next(iter(streams[next(iter(streams))]()))
        state = create_train_state(
            model, optimizer, jax.random.PRNGKey(0), sample,
            model_cfg.enc_layers,
        )
        ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
        state = ckpt.restore(abstract_like(state))
        print(f"restored step {int(state.step)} from {run_dir}")
        eval_params = state.params

    precisions = tuple(int(x) for x in args.precisions.split(","))

    if args.streaming:
        import numpy as np

        from onebit_asr_tpu.decode.streaming import streaming_greedy_decode
        from onebit_asr_tpu.decode.wer import compute_cer, compute_wer
        from onebit_asr_tpu.eval.evaluate import _ids_to_words

        precision = next((q for q in precisions if q != 32), 2)
        print(f"streaming greedy decode (precision {precision})")
        for split, stream in streams.items():
            refs, hyps = [], []
            for bi, batch in enumerate(stream()):
                if args.max_batches and bi >= args.max_batches:
                    break
                for i in range(batch["feats"].shape[0]):
                    T = int(batch["feat_lens"][i])
                    ids = streaming_greedy_decode(
                        model_cfg, eval_params,
                        np.asarray(batch["feats"][i, :T]), precision,
                    )
                    U = int(batch["token_lens"][i])
                    ref_ids = [int(x) for x in batch["tokens"][i, :U]]
                    hyps.append(_ids_to_words(ids, tokenizer, specials.offset))
                    refs.append(_ids_to_words(ref_ids, tokenizer, specials.offset))
                    if len(refs) <= args.print_samples:
                        print(f"  ref: {refs[-1]}\n  hyp: {hyps[-1]}")
            d, w = compute_wer(refs, hyps)
            dc, c = compute_cer(refs, hyps)
            print(
                f"== {split} ({len(refs)} utts, streaming) ==\n"
                f"  {precision}bit: WER {d/max(w,1)*100:.2f}%  "
                f"CER {dc/max(c,1)*100:.2f}%"
            )
        if ckpt is not None:
            ckpt.close()
        return 0
    if args.int8_act and not args.packed:
        print("--int8_act requires --packed (it selects the packed-path "
              "matmul kernel)")
        return 2
    if args.int8_act:
        import os as _os

        _os.environ["ONEBIT_PACKED_INT8_ACT"] = "1"  # trace-time routing
        print("packed serving: int8 activations (W2A8 integer MXU path)")
    if args.packed:
        from onebit_asr_tpu.model.packed import export_packed_params

        # packed weights are projected at export time for ONE precision;
        # default ternary, binary selectable via --precisions 1
        precisions = (next((p_ for p_ in precisions if p_ != 32), 2),)
        model = ConformerASR.from_config(model_cfg, deterministic=True, packed=True)
        eval_params = export_packed_params(eval_params, precisions[0])
        print(f"packed serving: 2-bit planar weights, precisions {precisions}")

    lm = None
    if args.lm:
        if args.greedy:
            raise SystemExit(
                "--lm requires beam search (shallow fusion is scored per "
                "prefix extension); drop --greedy or drop --lm."
            )
        from onebit_asr_tpu.decode.lm import NGramLM

        lm = NGramLM.load(args.lm)
        print(f"shallow fusion: {args.lm} (order {lm.order}, "
              f"weight {args.lm_weight})")
    split_metrics = {}
    for split, stream in streams.items():
        m = evaluate_stream(
            model, eval_params, stream(), loss_cfg, specials,
            model_cfg.enc_layers, precisions=precisions, tokenizer=tokenizer,
            use_beam=not args.greedy, beam_size=args.beam_size,
            max_batches=args.max_batches or None,
            print_samples=args.print_samples,
            lm=lm, lm_weight=args.lm_weight, length_bonus=args.length_bonus,
        )
        split_metrics[split] = m
        print(f"== {split} ({m['eval_utts']} utts) ==")
        for prec in precisions:
            tag = {32: "32bit", 2: "2bit", 1: "1bit"}[prec]
            print(
                f"  {tag:>6}: loss {m[f'loss_{tag}']:.3f}  "
                f"WER {m[f'wer_{tag}']*100:.2f}%  CER {m[f'cer_{tag}']*100:.2f}%"
            )
    if len(split_metrics) > 1:
        # final cross-split summary table, mirroring the reference's
        # test.clean/test.other x {fp32, 2bit, 1bit} block (eval.py:286-291)
        tags = [{32: "32bit", 2: "2bit", 1: "1bit"}[p_] for p_ in precisions]
        print("\n=== Summary (WER %) ===")
        print(f"{'split':<16}" + "".join(f"{t:>10}" for t in tags))
        for split, m in split_metrics.items():
            row = "".join(f"{m[f'wer_{t}']*100:>10.2f}" for t in tags)
            print(f"{split:<16}{row}")
    if ckpt is not None:
        ckpt.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
