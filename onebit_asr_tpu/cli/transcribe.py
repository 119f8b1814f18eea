"""`transcribe` — checkpoint + audio in, text out (the serving CLI).

The reference has no transcription entry point at all (its eval.py only
scores WER against references, /root/reference/eval.py:64-195); a serving
framework needs one. This CLI restores a trained run, featurizes audio
through the fused device frontend, runs the encoder at the requested
weight precision (optionally from planar-packed 2-bit weights), decodes
on-device (greedy or prefix beam, optional n-gram LM shallow fusion), and
prints `utt_id\ttext` lines.

Inputs: either `--data_dir` prepared by `prepare ingest` (uses a split's
manifest; no transcripts required for decoding) or `--wav_dir` with raw
16-bit PCM .wav files (featurized straight from disk, no ingest step).
"""

from __future__ import annotations

import os
import sys


def build_argparser():
    import argparse

    p = argparse.ArgumentParser(
        "python -m onebit_asr_tpu.transcribe", description=__doc__
    )
    p.add_argument("--checkpoint", type=str, required=True,
                   help="run dir written by cli.train (config.json + ckpt/)")
    p.add_argument("--wav_dir", type=str, default="",
                   help="directory tree of 16-bit PCM .wav files to "
                        "transcribe (overrides manifest input)")
    p.add_argument("--data_dir", type=str, default="",
                   help="prepared data dir: the tokenizer/CMVN artifacts, "
                        "and (without --wav_dir) the manifest to "
                        "transcribe; default: the checkpoint's training "
                        "data dir")
    p.add_argument("--split", type=str, default="test",
                   help="manifest split to transcribe (data-dir mode)")
    p.add_argument("--precision", type=int, default=2, choices=(32, 2, 1),
                   help="weight precision for the encoder")
    p.add_argument("--packed", action="store_true",
                   help="serve from planar-packed 2-bit weights (the "
                        "shipping format; precision must be 1 or 2)")
    p.add_argument("--beam_size", type=int, default=0,
                   help="prefix beam width; 0 = on-device greedy (default)")
    p.add_argument("--lm", type=str, default="",
                   help="n-gram LM (prepare lm output) for shallow fusion "
                        "(beam mode only)")
    p.add_argument("--lm_weight", type=float, default=0.3)
    p.add_argument("--length_bonus", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0, help="0 = all")
    p.add_argument("--longform", action="store_true",
                   help="arbitrarily long recordings via overlapped fixed "
                        "windows + stitched CTC (wav-dir mode, greedy; "
                        "bypasses the max_frames cap)")
    p.add_argument("--chunk_seconds", type=float, default=30.0,
                   help="longform window length")
    p.add_argument("--overlap_seconds", type=float, default=4.0,
                   help="longform window overlap (margins discarded)")
    p.add_argument("--out", type=str, default="",
                   help="write `utt_id\\ttext` lines here (default stdout)")
    p.add_argument("--no_fused_kernels", action="store_true",
                   help="force the XLA attention/subsampler paths")
    return p


def _iter_wavs(wav_dir, max_samples=None):
    """Yield (utt_id, waveform) for every .wav under `wav_dir`."""
    from onebit_asr_tpu.cli.prepare import _read_wav

    paths = []
    for root, _, files in os.walk(wav_dir):
        paths.extend(
            os.path.join(root, f) for f in files if f.endswith(".wav")
        )
    if not paths:
        raise FileNotFoundError(f"no .wav files under {wav_dir}")
    for path in sorted(paths):
        wav = _read_wav(path)
        if max_samples is not None:
            wav = wav[:max_samples]
        yield os.path.splitext(os.path.relpath(path, wav_dir))[0], wav


def _wav_dir_batches(wav_dir, batch_size, max_samples):
    """Raw-wav batches {wavs, wav_lens, utt_ids} from a directory tree,
    length-sorted so batch padding stays tight."""
    import numpy as np

    items = list(_iter_wavs(wav_dir, max_samples))
    items.sort(key=lambda kv: len(kv[1]))
    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        n = max(len(w) for _, w in chunk)
        wavs = np.zeros((len(chunk), n), np.float32)
        lens = np.zeros((len(chunk),), np.int32)
        for j, (_, w) in enumerate(chunk):
            wavs[j, : len(w)] = w
            lens[j] = len(w)
        yield {
            "wavs": wavs,
            "wav_lens": lens,
            "utt_ids": [uid for uid, _ in chunk],
        }


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    from onebit_asr_tpu.utils.platform import set_default_prng_impl
    set_default_prng_impl()
    from onebit_asr_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from onebit_asr_tpu.data.text import AsrTokenizer
    from onebit_asr_tpu.decode.greedy import greedy_ctc_decode
    from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
    from onebit_asr_tpu.ops.frontend import LogMelFrontend, apply_cmvn
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.utils.checkpoint import (
        CheckpointManager,
        abstract_like,
        load_config,
    )

    run_dir = args.checkpoint
    cfg = load_config(run_dir)
    if cfg is None:
        print(f"no config.json in {run_dir}", file=sys.stderr)
        return 2
    model_cfg = cfg.model
    if args.no_fused_kernels:
        import dataclasses

        model_cfg = dataclasses.replace(
            model_cfg, fused_attention=False, fused_subsampler=False
        )
    specials = model_cfg.specials

    data_dir = args.data_dir or cfg.data.data_dir
    try:
        tokenizer = AsrTokenizer.find_and_load(data_dir, specials)
    except FileNotFoundError:
        print(
            f"no tokenizer artifact in {data_dir} — pass --data_dir pointing "
            "at the dir the checkpoint was trained against",
            file=sys.stderr,
        )
        return 2

    frontend = LogMelFrontend(cfg.frontend)
    cmvn = None
    cmvn_path = os.path.join(data_dir, "cmvn_stats.npz")
    if os.path.exists(cmvn_path):
        stats = np.load(cmvn_path)
        cmvn = (
            np.asarray(stats["mean"], np.float32),
            np.asarray(stats["std"], np.float32),
        )
    else:
        print(f"warning: no cmvn_stats.npz in {data_dir}; "
              "features will mismatch training", file=sys.stderr)

    # restore parameters (shapes rebuilt from a probe batch)
    max_samples = frontend.frame_len + (
        (cfg.data.max_frames - 1) * frontend.frame_shift
    )
    if args.wav_dir:
        batches = lambda: _wav_dir_batches(
            args.wav_dir, args.batch_size, max_samples
        )
    else:
        from onebit_asr_tpu.data.librispeech import LibriSpeechDataModule
        from onebit_asr_tpu.utils.config import DataConfig

        dm = LibriSpeechDataModule(
            data_dir, tokenizer,
            DataConfig(data_dir=data_dir, batch_size=args.batch_size),
            splits=(args.split,),
            frontend_cfg=cfg.frontend,
        )
        if args.split not in dm.splits():
            print(f"split {args.split!r} has no manifest in {data_dir}",
                  file=sys.stderr)
            return 2
        batches = lambda: dm.wav_batches(
            args.split, shuffle=False, batch_size=args.batch_size
        )

    def featurize(wb):
        feats, feat_lens = frontend(wb["wavs"], wb["wav_lens"])
        if cmvn is not None:
            feats = apply_cmvn(feats, cmvn[0], cmvn[1])
        return feats, feat_lens

    probe = next(iter(batches()))
    feats, feat_lens = featurize(probe)
    sample = {
        "feats": feats, "feat_lens": feat_lens,
        "tokens": np.zeros((feats.shape[0], 4), np.int32),
        "token_lens": np.ones((feats.shape[0],), np.int32),
    }
    model = ConformerASR.from_config(model_cfg, deterministic=True)
    optimizer = make_optimizer(cfg.optim, total_steps=1)
    state = create_train_state(
        model, optimizer, jax.random.PRNGKey(0), sample, model_cfg.enc_layers
    )
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    state = ckpt.restore(abstract_like(state))
    print(f"restored step {int(state.step)} from {run_dir}", file=sys.stderr)
    params = state.params
    if args.packed:
        # restore happens against the fake-quant layout; packing is an
        # export-time projection for ONE precision (model/packed.py)
        from onebit_asr_tpu.model.packed import export_packed_params

        if args.precision not in (1, 2):
            print("--packed requires --precision 1 or 2", file=sys.stderr)
            return 2
        model = ConformerASR.from_config(model_cfg, deterministic=True, packed=True)
        params = export_packed_params(state.params, args.precision)

    bm = precision_to_binary_mask(args.precision, model_cfg.enc_layers)

    if args.longform:
        if not args.wav_dir:
            print("--longform needs --wav_dir (manifest utterances are "
                  "already capped at ingest)", file=sys.stderr)
            return 2
        if args.beam_size or args.lm:
            print("--longform is greedy-only (stitched CTC)", file=sys.stderr)
            return 2
        from onebit_asr_tpu.decode.longform import longform_greedy_decode

        fe = frontend
        chunk_frames = max(1, int(args.chunk_seconds * 16000) // fe.frame_shift)
        overlap_frames = max(0, int(args.overlap_seconds * 16000) // fe.frame_shift)
        # pad each wav to a multiple of one window's samples so the jitted
        # featurizer sees a bounded set of shapes
        chunk_samples = fe.frame_len + (chunk_frames - 1) * fe.frame_shift
        out_f = open(args.out, "w") if args.out else sys.stdout
        n_done = 0
        try:
            for uid, wav in _iter_wavs(args.wav_dir):
                n = len(wav)
                padded = chunk_samples * max(1, -(-n // chunk_samples))
                wavs = np.zeros((1, padded), np.float32)
                wavs[0, :n] = wav
                feats, feat_lens = frontend(wavs, np.asarray([n], np.int32))
                if cmvn is not None:
                    feats = apply_cmvn(feats, cmvn[0], cmvn[1])
                fv = np.asarray(feats[0, : int(feat_lens[0])])
                ids, k = longform_greedy_decode(
                    model, params, fv, bm, specials.blank_id,
                    chunk_frames=chunk_frames, overlap_frames=overlap_frames,
                )
                out_f.write(f"{uid}\t{tokenizer.ids_to_text(ids[:k])}\n")
                n_done += 1
                if args.max_batches and n_done >= args.max_batches:
                    break
            print(f"transcribed {n_done} recordings (longform)",
                  file=sys.stderr)
        finally:
            if args.out:
                out_f.close()
        return 0

    @jax.jit
    def forward(params, feats, feat_lens):
        _, enc_mask, logits = model.apply(
            {"params": params}, feats, feat_lens, bm
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return lp, jnp.sum(enc_mask, axis=-1)

    lm = None
    if args.lm:
        if not args.beam_size:
            print("--lm needs --beam_size > 0 (shallow fusion is a beam-"
                  "prefix extension); drop --lm or set --beam_size",
                  file=sys.stderr)
            return 2
        from onebit_asr_tpu.decode.lm import NGramLM
        from onebit_asr_tpu.decode.lm_device import DeviceLM

        lm = DeviceLM.pack(NGramLM.load(args.lm))

    if args.beam_size:
        from onebit_asr_tpu.decode.beam_device import beam_search_device

        def decode(lp, lens):
            return beam_search_device(
                lp, lens, blank_id=specials.blank_id,
                beam_size=args.beam_size, lm=lm,
                lm_weight=args.lm_weight if lm is not None else 0.0,
                length_bonus=args.length_bonus,
            )
    else:
        def decode(lp, lens):
            return greedy_ctc_decode(lp, lens, specials.blank_id)

    out_f = open(args.out, "w") if args.out else sys.stdout
    n_done = 0
    try:
        for i, wb in enumerate(batches()):
            if args.max_batches and i >= args.max_batches:
                break
            feats, feat_lens = featurize(wb)
            lp, enc_lens = forward(params, feats, feat_lens)
            ids, lens = decode(lp, enc_lens)
            ids, lens = np.asarray(ids), np.asarray(lens)
            for b, uid in enumerate(wb["utt_ids"]):
                text = tokenizer.ids_to_text(ids[b, : int(lens[b])])
                out_f.write(f"{uid}\t{text}\n")
                n_done += 1
        print(f"transcribed {n_done} utterances", file=sys.stderr)
    finally:
        if args.out:
            out_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
