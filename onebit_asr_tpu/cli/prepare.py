"""Data preparation CLI — `python -m onebit_asr_tpu.cli.prepare <cmd>`.

Covers the reference's three-stage prep (SURVEY §3.3):
  download_data.sh → src/data/tokenizer.py → main.py (CMVN)

Subcommands:
  ingest     HF-datasets dirs (reference download layout data/{split}_subset,
             /root/reference/utils/download_data.py:163) or wav dirs →
             npz waveform shards + JSONL manifests with cached lengths.
             `--synthetic N` fabricates seeded data for smoke tests.
  tokenizer  train BPE vocab 5000 on the train manifests' transcripts
             (reference tokenizer.py:29-89 equivalent).
  tokenize   fill each manifest row's model-side token ids.
  cmvn       global per-mel-bin mean/std over the first N train utts via the
             fused device frontend (reference dataset.py:276-345 +
             main.py:45-49; N defaults to 1000), saved as cmvn_stats.npz.
  features   prepare-time fbank cache: frontend(+CMVN) once per utterance,
             f16 npz shards + manifest stamps — training then skips the
             frontend entirely (opt-in; ONEBIT_NO_FEATURE_CACHE=1 forces
             the frontend path back on).
  all        ingest(synthetic) + tokenizer + tokenize + cmvn — one command
             to a trainable data dir.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List

import numpy as np

from onebit_asr_tpu.data.manifest import (
    Utterance,
    read_manifest,
    write_manifest,
)
from onebit_asr_tpu.data.text import AsrTokenizer
from onebit_asr_tpu.utils.config import FrontendConfig, SpecialTokens

SHARD_UTTS = 512  # waveforms per npz shard


def _write_shards(
    out_dir: str, split: str, items: List[tuple], start_shard: int = 0
) -> List[Utterance]:
    """items: [(utt_id, wav f32 np.ndarray, text)] → npz shards + utterances."""
    utts = []
    for s in range(0, len(items), SHARD_UTTS):
        chunk = items[s : s + SHARD_UTTS]
        shard_name = f"{split}_shard{start_shard + s // SHARD_UTTS:05d}.npz"
        np.savez(
            os.path.join(out_dir, shard_name),
            **{uid: wav for uid, wav, _ in chunk},
        )
        for i, (uid, wav, text) in enumerate(chunk):
            utts.append(
                Utterance(
                    utt_id=uid,
                    shard=shard_name,
                    index=i,
                    num_samples=len(wav),
                    text=text,
                    tokens=[],
                )
            )
    return utts


def _read_wav(path: str) -> np.ndarray:
    """Stdlib 16-bit PCM wav reader (no soundfile in this image); resamples
    to 16 kHz if needed."""
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"{path}: only 16-bit PCM wav supported, got width {width}")
    wav = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    if ch > 1:
        wav = wav.reshape(-1, ch).mean(axis=1)
    if sr != 16000:
        from onebit_asr_tpu.ops.frontend import resample_linear

        wav = resample_linear(wav, sr, 16000)
    return wav


def _ingest_wav_dir(args) -> int:
    """Ingest a directory tree of .wav files + LibriSpeech-style *.trans.txt
    transcript files (lines: `<utt_id> <TEXT>`); split by --dev_fraction."""
    trans = {}
    wavs = {}
    for root, _, files in os.walk(args.wav_dir):
        for fn in files:
            p = os.path.join(root, fn)
            if fn.endswith(".trans.txt"):
                with open(p) as f:
                    for line in f:
                        uid, _, text = line.strip().partition(" ")
                        if uid:
                            trans[uid] = text
            elif fn.endswith(".wav"):
                wavs[os.path.splitext(fn)[0]] = p
    ids = sorted(set(trans) & set(wavs))
    if not ids:
        print("no (wav, transcript) pairs found", file=sys.stderr)
        return 2
    n_dev = max(1, int(len(ids) * args.dev_fraction))
    splits = {"dev": ids[:n_dev], "train": ids[n_dev:]}
    for split, split_ids in splits.items():
        items = [(uid, _read_wav(wavs[uid]), trans[uid]) for uid in split_ids]
        utts = _write_shards(args.out_dir, split, items)
        write_manifest(os.path.join(args.out_dir, f"{split}_manifest.jsonl"), utts)
        print(f"{split}: {len(utts)} utterances from {args.wav_dir}")
    return 0


def _ingest_hard_synthetic(args) -> int:
    """`ingest --synthetic N --hard`: a synthetic corpus TUNED TO KEEP WER
    INFORMATIVE (VERDICT r4: every capstone surface converged to 0.00% on
    the 16-word corpus, so precisions and decode surfaces could not
    separate). Four mechanisms put converged WER in the 3-15% band instead
    of 0:

    - CONFUSABLE LEXICON: 64 words W00..W63 whose tone signatures sit on a
      24-step/octave grid (adjacent words ~2.9% apart in f0 — about one
      mel-bin at these frequencies), i.e. near-minimal pairs by
      construction rather than the default corpus's well-separated tones.
    - SPEAKER JITTER: each utterance scales all its frequencies by a
      random ±1.5% and each word's duration by ±20% — adjacent-word
      classes genuinely overlap, so some acoustic confusions are
      irreducible (a stable error floor, like real speech).
    - ADDITIVE NOISE (default sigma 0.05 vs ~0.3 RMS signal, ~14 dB SNR).
    - MARKOV TEXT: word sequences follow a sparse seeded bigram chain
      (each word has 4 likely successors at 0.85 total mass + 0.15
      uniform smoothing), so a fused n-gram LM has real signal to
      recover acoustically-confused words — greedy / beam / beam+LM
      decode surfaces separate instead of all reading 0.00%.

    Longer utterances than the default corpus (up to --max_seconds of
    0.24-0.36 s words) give each one many word transitions."""
    rng = np.random.default_rng(args.seed)
    n_words = 64
    words = [f"W{i:02d}" for i in range(n_words)]
    sr = 16000
    base_sec = 0.3
    # difficulty knobs, tuned by pilot (see docs/RESULTS.md round 5): the
    # first cut (grid 24/oct ≈ 2.9% spacing, sigma 0.08 ≈ 10 dB SNR) was
    # TOO hard — 100% WER with a barely-moving loss after 11 epochs at
    # Conformer-M; these defaults target the 3-15% converged band
    grid = float(getattr(args, "hard_grid", 16.0))  # steps per octave
    noise_sigma = float(getattr(args, "hard_noise", 0.05))

    # sparse bigram chain for text generation (shared across splits so
    # train statistics transfer to dev/test, like a real language)
    succ = np.stack([
        rng.choice(n_words, size=4, replace=False) for _ in range(n_words)
    ])  # [V, 4] likely successors

    def next_word(w: int) -> int:
        if rng.uniform() < 0.85:
            return int(succ[w][rng.integers(0, 4)])
        return int(rng.integers(0, n_words))

    def word_wav(widx: int, f_scale: float, dur_scale: float) -> np.ndarray:
        # `grid` steps/octave: adjacent indices differ by 2**(1/grid)
        f1 = 220.0 * (2 ** (widx / grid)) * f_scale
        f2 = 330.0 * (2 ** ((widx % 16) / 12.0)) * f_scale
        n = int(sr * base_sec * dur_scale)
        t = np.arange(n) / sr
        env = np.hanning(n).astype(np.float32)
        sig = 0.35 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(
            2 * np.pi * f2 * t
        )
        return (sig * env).astype(np.float32)

    max_words = max(4, int(args.max_seconds / base_sec) - 1)
    for split, n in (
        ("train", args.synthetic),
        ("dev", max(8, args.synthetic // 8)),
        ("test", max(8, args.synthetic // 8)),
    ):
        items = []
        for i in range(n):
            n_w = int(rng.integers(4, max_words + 1))
            w = int(rng.integers(0, n_words))
            word_ids = [w]
            for _ in range(n_w - 1):
                w = next_word(w)
                word_ids.append(w)
            text = " ".join(words[k] for k in word_ids)
            f_scale = float(2.0 ** (rng.uniform(-1, 1) / 48.0))  # ±1.5%
            wav = np.concatenate([
                word_wav(k, f_scale, float(rng.uniform(0.8, 1.2)))
                for k in word_ids
            ])
            wav = wav + rng.standard_normal(len(wav)).astype(
                np.float32
            ) * noise_sigma
            items.append((f"{split}-{i:06d}", wav, text))
        utts = _write_shards(args.out_dir, split, items)
        write_manifest(
            os.path.join(args.out_dir, f"{split}_manifest.jsonl"), utts
        )
        print(f"{split}: {len(utts)} HARD synthetic utterances "
              f"(64 confusable words, bigram text)")
    return 0


def cmd_ingest(args) -> int:
    os.makedirs(args.out_dir, exist_ok=True)
    if args.wav_dir:
        return _ingest_wav_dir(args)
    if args.synthetic and args.hard:
        return _ingest_hard_synthetic(args)
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        words = [
            "THE", "CAT", "SAT", "ON", "MAT", "DOG", "RAN", "FAST", "HELLO",
            "WORLD", "SPEECH", "MODEL", "SOUND", "VOICE", "DATA", "TRAIN",
        ]
        # Learnable synthetic speech: each word is a fixed two-tone signature
        # (~0.3 s) + noise, so transcripts are recoverable from audio and an
        # end-to-end training run demonstrably drives WER down. --noise_only
        # reverts to pure-noise audio (shape testing).
        sr = 16000
        word_sec = 0.3
        t_axis = np.arange(int(sr * word_sec)) / sr
        envelope = np.hanning(len(t_axis)).astype(np.float32)

        def word_wav(widx: int) -> np.ndarray:
            f1 = 220.0 * (2 ** (widx / 8.0))
            f2 = 330.0 * (2 ** ((widx % 7) / 5.0))
            sig = 0.35 * np.sin(2 * np.pi * f1 * t_axis) + 0.25 * np.sin(
                2 * np.pi * f2 * t_axis
            )
            return (sig * envelope).astype(np.float32)

        max_words = max(3, int(args.max_seconds / word_sec) - 1)
        for split, n in (
            ("train", args.synthetic),
            ("dev", max(8, args.synthetic // 8)),
            ("test", max(8, args.synthetic // 8)),
        ):
            items = []
            for i in range(n):
                n_words = int(rng.integers(3, max_words + 1))
                word_ids = rng.integers(0, len(words), n_words)
                text = " ".join(words[w] for w in word_ids)
                if args.noise_only:
                    sec = rng.uniform(1.0, args.max_seconds)
                    wav = rng.standard_normal(int(sr * sec)).astype(np.float32) * 0.1
                else:
                    wav = np.concatenate([word_wav(int(w)) for w in word_ids])
                    wav = wav + rng.standard_normal(len(wav)).astype(np.float32) * 0.02
                items.append((f"{split}-{i:06d}", wav, text))
            utts = _write_shards(args.out_dir, split, items)
            write_manifest(
                os.path.join(args.out_dir, f"{split}_manifest.jsonl"), utts
            )
            print(f"{split}: {len(utts)} synthetic utterances")
        return 0

    # HF-datasets layout (reference download_data.py:163 saves
    # data/{split}_subset dirs with audio arrays + text)
    try:
        from datasets import load_from_disk
    except ImportError:
        print("datasets not available and --synthetic not given", file=sys.stderr)
        return 2
    split_map = {
        "train": args.train_splits.split(","),
        "dev": args.dev_splits.split(","),
        "test": args.test_splits.split(","),
    }
    for split, sources in split_map.items():
        items = []
        for src in sources:
            path = os.path.join(args.in_dir, src)
            if not os.path.isdir(path):
                print(f"skipping missing {path}", file=sys.stderr)
                continue
            ds = load_from_disk(path)
            for row in ds:
                audio = row["audio"]
                wav = np.asarray(audio["array"], np.float32)
                sr = int(audio.get("sampling_rate", 16000))
                if sr != 16000:
                    from onebit_asr_tpu.ops.frontend import resample_linear

                    wav = resample_linear(wav, sr, 16000)
                items.append((row.get("id", f"{src}-{len(items)}"), wav, row["text"]))
        utts = _write_shards(args.out_dir, split, items)
        write_manifest(os.path.join(args.out_dir, f"{split}_manifest.jsonl"), utts)
        print(f"{split}: {len(utts)} utterances from {sources}")
    return 0


def cmd_tokenizer(args) -> int:
    manifest = os.path.join(args.out_dir, "train_manifest.jsonl")
    utts = read_manifest(manifest)
    tok = AsrTokenizer.train(
        (u.text for u in utts), vocab_size=args.vocab_size,
        specials=SpecialTokens(),
    )
    tok.save(os.path.join(args.out_dir, "tokenizer.json"))
    print(
        f"tokenizer: {tok.subword_vocab_size} subwords "
        f"(+4 specials = {tok.vocab_size} model vocab)"
    )
    return 0


def cmd_export_spm(args) -> int:
    """Convert the trained HF tokenizer.json to a SentencePiece-format
    tokenizer.model (data/spm.py exporter) so reference tooling
    (src/data/tokenizer.py artifact consumers) can use it. Piece sequences
    are identical; raw ids shift by +3 (spm reserves ids 0-3) — see
    data/spm.py module docstring."""
    from onebit_asr_tpu.data.spm import export_hf_to_spm

    tok = AsrTokenizer.load(os.path.join(args.out_dir, "tokenizer.json"))
    out = os.path.join(args.out_dir, "tokenizer.model")
    export_hf_to_spm(tok._tok, out)
    print(f"exported SPM model: {tok.subword_vocab_size} pieces + 4 specials -> {out}")
    return 0


def cmd_tokenize(args) -> int:
    tok = AsrTokenizer.find_and_load(args.out_dir)
    for split in ("train", "dev", "test"):
        path = os.path.join(args.out_dir, f"{split}_manifest.jsonl")
        if not os.path.exists(path):
            continue
        utts = read_manifest(path)
        for u in utts:
            u.tokens = tok.encode(u.text)
        write_manifest(path, utts)
        print(f"{split}: tokenized {len(utts)} rows")
    return 0


def cmd_cmvn(args) -> int:
    import jax.numpy as jnp

    from onebit_asr_tpu.data.manifest import ShardCache
    from onebit_asr_tpu.ops.frontend import (
        LogMelFrontend,
        accumulate_cmvn,
        finalize_cmvn,
    )

    utts = read_manifest(os.path.join(args.out_dir, "train_manifest.jsonl"))[
        : args.num_utts
    ]
    shards = ShardCache(args.out_dir)
    fe = LogMelFrontend(FrontendConfig())
    F = fe.cfg.num_mel_bins
    acc = (jnp.zeros((F,)), jnp.zeros((F,)), jnp.zeros(()))
    # batch utterances to a fixed pad length for a single compiled shape
    pad = max(u.num_samples for u in utts)
    pad = fe.frame_len + ((pad - fe.frame_len + fe.frame_shift - 1) // fe.frame_shift) * fe.frame_shift
    B = 16
    for s in range(0, len(utts), B):
        chunk = utts[s : s + B]
        wavs = np.zeros((B, pad), np.float32)
        lens = np.zeros((B,), np.int32)
        for i, u in enumerate(chunk):
            w = shards.wav(u)[:pad]
            wavs[i, : len(w)] = w
            lens[i] = len(w)
        feats, flens = fe(jnp.asarray(wavs), jnp.asarray(lens))
        acc = accumulate_cmvn(feats, flens, acc)
    mean, std = finalize_cmvn(acc)
    out = os.path.join(args.out_dir, "cmvn_stats.npz")
    np.savez(out, mean=np.asarray(mean), std=np.asarray(std))
    print(f"cmvn over {len(utts)} utts -> {out}")
    return 0


def cmd_features(args) -> int:
    """Prepare-time fbank cache: run the fused frontend (+CMVN) over every
    split ONCE, store the features as ONE [sum_T, F] float16 `.npy` per
    split (memory-mapped at train time — batch assembly becomes zero-copy
    slicing, which keeps even a 1-core host ahead of the device; per-utt
    npz members measured as the sustained bottleneck), and stamp
    `feat_shard`/`feat_index`/`num_frames` into the manifests. Training
    then skips the frontend entirely (closes the sustained-vs-bench gap,
    VERDICT r2 weakness 4; reference-equivalent of its worker-pool fbank
    overlap, src/data/dataset.py:532-539, moved to prepare time).

    CMVN is baked into the cache (reference applies it per item too,
    dataset.py:130-131); re-running `prepare cmvn` afterwards requires
    re-running `prepare features`."""
    import jax
    import jax.numpy as jnp

    from onebit_asr_tpu.data.manifest import ShardCache, bucket_boundaries
    from onebit_asr_tpu.ops.frontend import LogMelFrontend, apply_cmvn

    fe = LogMelFrontend(FrontendConfig())
    F = fe.cfg.num_mel_bins
    cmvn = None
    cmvn_path = os.path.join(args.out_dir, "cmvn_stats.npz")
    if os.path.exists(cmvn_path):
        stats = np.load(cmvn_path)
        cmvn = (np.asarray(stats["mean"], np.float32),
                np.asarray(stats["std"], np.float32))
    else:
        print("warning: no cmvn_stats.npz — caching un-normalized features")

    def pad_to_frame(n: int) -> int:
        n = max(int(n), fe.frame_len)
        return fe.frame_len + (
            (n - fe.frame_len + fe.frame_shift - 1) // fe.frame_shift
        ) * fe.frame_shift

    def frames_for(n: int, pad: int) -> int:
        n = min(int(n), pad)
        if n < fe.frame_len:
            return 0
        return 1 + (n - fe.frame_len) // fe.frame_shift

    done_any = False
    for split in ("train", "dev", "test"):
        mpath = os.path.join(args.out_dir, f"{split}_manifest.jsonl")
        if not os.path.exists(mpath):
            continue
        utts = read_manifest(mpath)
        shards = ShardCache(args.out_dir)
        # a few static pad lengths (quantile buckets) bound recompiles
        lens = np.asarray([u.num_samples for u in utts])
        bounds = bucket_boundaries(lens, min(8, max(1, len(utts))))
        pads = [pad_to_frame(b) for b in bounds]

        def bucket_pad(n: int) -> int:
            b = int(min(np.searchsorted(bounds, n), len(bounds) - 1))
            return pads[b]

        # exact frame counts are known up front (deterministic function of
        # wav length), so the memmap is sized before any compute
        n_frames = [frames_for(u.num_samples, bucket_pad(u.num_samples))
                    for u in utts]
        total = int(np.sum(n_frames))
        cache_name = f"{split}_feats.npy"
        mm = np.lib.format.open_memmap(
            os.path.join(args.out_dir, cache_name), mode="w+",
            dtype=np.float16, shape=(total, F),
        )
        offsets = np.concatenate([[0], np.cumsum(n_frames)]).astype(np.int64)
        order = np.argsort(lens, kind="stable")
        B = 16
        for s in range(0, len(order), B):
            idx = order[s : s + B]
            N = bucket_pad(int(lens[idx].max()))
            wavs = np.zeros((len(idx), N), np.float32)
            wlens = np.zeros((len(idx),), np.int32)
            for i, j in enumerate(idx):
                w = shards.wav(utts[int(j)])[:N]
                wavs[i, : len(w)] = w
                wlens[i] = len(w)
            feats, flens = fe(jnp.asarray(wavs), jnp.asarray(wlens))
            if cmvn is not None:
                feats = apply_cmvn(feats, cmvn[0], cmvn[1])
            feats = np.asarray(feats, np.float16)
            flens = np.asarray(flens)
            for i, j in enumerate(idx):
                u = utts[int(j)]
                T = int(flens[i])
                assert T == n_frames[int(j)], (u.utt_id, T, n_frames[int(j)])
                mm[offsets[int(j)] : offsets[int(j)] + T] = feats[i, :T]
                u.feat_shard = cache_name
                u.feat_index = int(offsets[int(j)])
                u.num_frames = T
        mm.flush()
        write_manifest(mpath, utts)
        shards.close()
        print(f"{split}: cached fbank for {len(utts)} utts "
              f"({total} frames -> {cache_name}, f16 memmap)")
        done_any = True
    if not done_any:
        print(f"no manifests in {args.out_dir} — run `prepare ingest` first")
        return 2
    return 0


def cmd_lm(args) -> int:
    """Train the shallow-fusion n-gram LM on the train manifest's token ids
    (see decode/lm.py; consumed by `eval --lm`)."""
    from onebit_asr_tpu.decode.lm import NGramLM

    path = os.path.join(args.out_dir, "train_manifest.jsonl")
    utts = read_manifest(path)
    seqs = [u.tokens for u in utts if u.tokens]
    if not seqs:
        print("train manifest has no token ids — run `prepare tokenize` first")
        return 2
    lm = NGramLM(order=args.lm_order).fit(seqs)
    out = os.path.join(args.out_dir, "lm.npz")
    lm.save(out)
    n = sum(len(c) for c in lm.counts)
    print(f"lm: order {args.lm_order}, {lm.total} tokens, {n} n-grams -> {out}")
    return 0


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    p = argparse.ArgumentParser(description="data preparation")
    p.add_argument("command",
                   choices=["ingest", "tokenizer", "tokenize", "cmvn", "lm",
                            "features", "export_spm", "all"])
    p.add_argument("--out_dir", type=str, default="data")
    p.add_argument("--in_dir", type=str, default="data")
    p.add_argument("--train_splits", type=str,
                   default="train.clean.100_subset,train.clean.360_subset,train.other.500_subset")
    p.add_argument("--dev_splits", type=str,
                   default="validation.clean_subset,validation.other_subset")
    p.add_argument("--test_splits", type=str,
                   default="test.clean_subset,test.other_subset")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic train utterances instead of ingesting")
    p.add_argument("--noise_only", action="store_true",
                   help="synthetic audio as pure noise (shape testing)")
    p.add_argument("--hard_grid", type=float, default=16.0,
                   help="with --hard: word-tone grid in steps/octave "
                        "(higher = closer near-minimal pairs = harder)")
    p.add_argument("--hard_noise", type=float, default=0.05,
                   help="with --hard: additive noise sigma (signal RMS "
                        "~0.3; 0.05 ~ 14 dB SNR)")
    p.add_argument("--hard", action="store_true",
                   help="with --synthetic: the WER-informative corpus — 64 "
                        "confusable near-minimal-pair words, speaker "
                        "jitter, additive noise, bigram-structured text (tuned "
                        "so converged WER lands 3-15%, separating "
                        "precisions and decode surfaces)")
    p.add_argument("--wav_dir", type=str, default="",
                   help="ingest a tree of .wav + LibriSpeech *.trans.txt files")
    p.add_argument("--dev_fraction", type=float, default=0.05)
    p.add_argument("--max_seconds", type=float, default=8.0)
    p.add_argument("--vocab_size", type=int, default=5000)
    p.add_argument("--num_utts", type=int, default=1000,
                   help="CMVN sample size (reference main.py:45-49)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lm_order", type=int, default=3,
                   help="n-gram order for `prepare lm`")
    args = p.parse_args(argv)

    if args.command == "all":
        for cmd in (cmd_ingest, cmd_tokenizer, cmd_tokenize, cmd_cmvn, cmd_lm):
            rc = cmd(args)
            if rc:
                return rc
        return 0
    return {
        "ingest": cmd_ingest,
        "tokenizer": cmd_tokenizer,
        "tokenize": cmd_tokenize,
        "cmvn": cmd_cmvn,
        "lm": cmd_lm,
        "features": cmd_features,
        "export_spm": cmd_export_spm,
    }[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
