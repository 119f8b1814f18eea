"""LibriSpeech data module: manifest → bucketed static batches → fused
device frontend.

Replaces the reference's L1/L2 stack (src/data/dataset.py get_dataloaders +
onebit_asr/dataloader_stub.py LibriSpeechDataModule) with the same batch
contract {feats [B,T,F], feat_lens, tokens [B,U], token_lens} but a
TPU-native dataflow:

  manifest (lengths cached)             — no startup fbank sweep
    → length buckets, static pads       — <= num_buckets compiled shapes
      → host gather of raw waveforms    — one npz read per shard
        → ONE fused jitted frontend op  — framing/FFT/mel/log/CMVN on device
          → SpecAugment (train only)    — keyed device op

The reference instead computes fbank per utterance in DataLoader worker
processes (dataset.py:106-147) and pads dynamically per batch
(dataset.py:227-273).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from onebit_asr_tpu.data.manifest import (
    ShardCache,
    Utterance,
    bucket_boundaries,
    bucketed_batches,
    read_manifest,
)
from onebit_asr_tpu.ops.frontend import LogMelFrontend, apply_cmvn
from onebit_asr_tpu.ops.specaugment import (
    spec_augment_from_config,
    spec_augment_indexed_from_config,
)
from onebit_asr_tpu.utils.config import DataConfig, FrontendConfig


class LibriSpeechDataModule:
    """Bucketed, statically-shaped batches from a prepared data dir.

    `data_dir` must contain `{split}_manifest.jsonl` + npz shards (written
    by `prepare ingest`), `tokenizer.json`, and optionally
    `cmvn_stats.npz`; splits without a manifest are simply absent.
    """

    def __init__(
        self,
        data_dir: str,
        tokenizer,
        cfg: Optional[DataConfig] = None,
        seed: int = 0,
        splits: Tuple[str, ...] = ("train", "dev", "test"),
        frontend_cfg: Optional[FrontendConfig] = None,
    ):
        self.data_dir = data_dir
        self.tokenizer = tokenizer
        self.cfg = cfg or DataConfig(data_dir=data_dir)
        self.seed = seed
        self.frontend = LogMelFrontend(frontend_cfg or FrontendConfig())
        self.shards = ShardCache(data_dir)
        self._manifests: Dict[str, List[Utterance]] = {}
        for s in splits:
            path = os.path.join(data_dir, f"{s}_manifest.jsonl")
            if os.path.exists(path):
                self._manifests[s] = read_manifest(path)

        cmvn_path = os.path.join(data_dir, "cmvn_stats.npz")
        if os.path.exists(cmvn_path):
            stats = np.load(cmvn_path)
            self._cmvn = (
                np.asarray(stats["mean"], np.float32),
                np.asarray(stats["std"], np.float32),
            )
        else:
            self._cmvn = None

        # sample-count ceiling implied by the static frame budget
        fe = self.frontend
        self._max_samples = fe.frame_len + (self.cfg.max_frames - 1) * fe.frame_shift

    # -- surface (reference dataloader_stub.py:157-233) ------------------

    def vocab_size(self) -> int:
        return self.tokenizer.vocab_size

    def special_ids(self) -> Dict[str, int]:
        return self.tokenizer.specials.as_dict()

    def num_utts(self, split: str) -> int:
        return len(self._manifests[split])

    def splits(self) -> Tuple[str, ...]:
        return tuple(self._manifests)

    # -- batch assembly ---------------------------------------------------

    def _pad_samples_for(self, max_len: int) -> int:
        """Round a bucket's max sample count up to a frame boundary so the
        frontend sees one static wav length per bucket."""
        fe = self.frontend
        n = min(int(max_len), self._max_samples)
        n = max(n, fe.frame_len)
        return fe.frame_len + (
            (n - fe.frame_len + fe.frame_shift - 1) // fe.frame_shift
        ) * fe.frame_shift

    def wav_batches(
        self,
        split: str,
        epoch: int = 0,
        batch_size: Optional[int] = None,
        shuffle: Optional[bool] = None,
    ) -> Iterator[Dict]:
        """Raw-waveform batches (host numpy): {wavs [B,N], wav_lens,
        tokens [B,U], token_lens, utt_ids}. N is static per bucket."""
        utts = self._manifests[split]
        B = batch_size or self.cfg.batch_size
        U = self.cfg.max_tokens
        lengths = np.asarray([min(u.num_samples, self._max_samples) for u in utts])
        n_buckets = max(1, min(self.cfg.num_buckets, len(utts) // max(B, 1)))
        bounds = bucket_boundaries(lengths, n_buckets)
        pad_for_bucket = [self._pad_samples_for(b) for b in bounds]
        train_like = shuffle if shuffle is not None else (split == "train")
        rng = (
            np.random.default_rng((self.seed, epoch)) if train_like else None
        )
        for idx in bucketed_batches(
            lengths, bounds, B, rng, drop_last=train_like
        ):
            bucket = int(
                np.minimum(
                    np.searchsorted(bounds, lengths[idx]).max(), len(bounds) - 1
                )
            )
            N = pad_for_bucket[bucket]
            n = len(idx)
            wavs = np.zeros((n, N), np.float32)
            wav_lens = np.zeros((n,), np.int32)
            tokens = np.zeros((n, U), np.int32)
            token_lens = np.zeros((n,), np.int32)
            utt_ids = []
            for i, j in enumerate(idx):
                u = utts[int(j)]
                w = self.shards.wav(u)[:N]
                wavs[i, : len(w)] = w
                wav_lens[i] = len(w)
                ids = u.tokens or self.tokenizer.encode(u.text)
                ids = ids[:U]
                tokens[i, : len(ids)] = ids
                token_lens[i] = len(ids)
                utt_ids.append(u.utt_id)
            yield {
                "wavs": wavs,
                "wav_lens": wav_lens,
                "tokens": tokens,
                "token_lens": token_lens,
                "utt_ids": utt_ids,
            }

    def featurized_batches(
        self,
        split: str,
        epoch: int = 0,
        augment: bool = False,
        key: Optional[jax.Array] = None,
        batch_size: Optional[int] = None,
    ) -> Iterator[Dict]:
        """Device-featurized batches with the training contract
        {feats, feat_lens, tokens, token_lens} (+utt_ids on host).

        If `prepare features` stamped a fbank cache into the manifest
        (Utterance.feat_shard), batches assemble straight from the cached
        f16 features and the frontend never runs — set
        ONEBIT_NO_FEATURE_CACHE=1 to force the frontend path."""
        if augment and key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        utts_ = self._manifests[split]
        if (
            utts_
            and all(u.feat_shard for u in utts_)
            and not os.environ.get("ONEBIT_NO_FEATURE_CACHE")
        ):
            yield from self._cached_feature_batches(
                split, epoch, augment, key, batch_size
            )
            return
        fe = self.frontend
        dither_key = None
        for i, wb in enumerate(
            self.wav_batches(split, epoch, batch_size=batch_size)
        ):
            if key is not None:
                bkey = jax.random.fold_in(key, i)
                if fe.cfg.dither > 0.0:
                    bkey, dither_key = jax.random.split(bkey)
            feats, feat_lens = fe(
                wb["wavs"], wb["wav_lens"], dither_key=dither_key
            )
            if self._cmvn is not None:
                feats = apply_cmvn(feats, self._cmvn[0], self._cmvn[1])
            if augment and fe.cfg.spec_augment:
                feats = spec_augment_from_config(bkey, feats, feat_lens, fe.cfg)
            yield {
                "feats": feats,
                "feat_lens": feat_lens,
                "tokens": wb["tokens"],
                "token_lens": wb["token_lens"],
            }

    def _cached_feature_batches(
        self,
        split: str,
        epoch: int = 0,
        augment: bool = False,
        key: Optional[jax.Array] = None,
        batch_size: Optional[int] = None,
    ) -> Iterator[Dict]:
        """Batches from the prepare-time fbank cache: bucket by FRAME
        length, static [B, T_bucket, F] pads, no frontend work at train
        time (CMVN is baked in by `prepare features`). SpecAugment still
        runs on device per batch — augmentation must stay per-epoch random,
        so it can never be cached."""
        utts = self._manifests[split]
        B = batch_size or self.cfg.batch_size
        U = self.cfg.max_tokens
        F = self.frontend.cfg.num_mel_bins
        max_T = self.cfg.max_frames
        lengths = np.asarray([min(u.num_frames, max_T) for u in utts])
        n_buckets = max(1, min(self.cfg.num_buckets, len(utts) // max(B, 1)))
        bounds = bucket_boundaries(lengths, n_buckets)
        train_like = split == "train"
        rng = (
            np.random.default_rng((self.seed, epoch)) if train_like else None
        )
        for i, idx in enumerate(
            bucketed_batches(lengths, bounds, B, rng, drop_last=train_like)
        ):
            bucket = int(
                np.minimum(
                    np.searchsorted(bounds, lengths[idx]).max(),
                    len(bounds) - 1,
                )
            )
            T = int(bounds[bucket])
            n = len(idx)
            # f16 batch assembly + H2D transfer: the cache shards are f16,
            # so the f32 host array round-4 built here was an exact
            # up-conversion — shipping f16 over the device link is LOSSLESS
            # and halves the transfer bytes (the round-4 host-RSS leak grew
            # with relay transfer volume; this is mitigation #1, see
            # docs/RESULTS.md round 5). The model upcasts at entry
            # (conformer casts feats to compute_dtype). ONEBIT_F32_FEATS=1
            # restores f32 transfers for A/B measurement.
            feat_dtype = (
                np.float32 if os.environ.get("ONEBIT_F32_FEATS") else np.float16
            )
            feats = np.zeros((n, T, F), feat_dtype)
            feat_lens = np.zeros((n,), np.int32)
            tokens = np.zeros((n, U), np.int32)
            token_lens = np.zeros((n,), np.int32)
            for r, j in enumerate(idx):
                u = utts[int(j)]
                f = self.shards.feats(u)[:T]
                feats[r, : len(f)] = f
                feat_lens[r] = len(f)
                ids = (u.tokens or self.tokenizer.encode(u.text))[:U]
                tokens[r, : len(ids)] = ids
                token_lens[r] = len(ids)
            out = {
                "feats": feats,
                "feat_lens": feat_lens,
                "tokens": tokens,
                "token_lens": token_lens,
            }
            if augment and self.frontend.cfg.spec_augment and key is not None:
                # one async jitted dispatch per batch (key fold-in happens
                # inside the jit) — the eager fold_in + device_put chain
                # here measured 473 ms/batch through the tunneled device
                # and made the whole pipeline input-bound (input_wait_frac
                # 0.93); see ops/specaugment.spec_augment_indexed_from_config
                out["feats"] = spec_augment_indexed_from_config(
                    key, i, feats, feat_lens, self.frontend.cfg
                )
            yield out

    def close(self) -> None:
        self.shards.close()
