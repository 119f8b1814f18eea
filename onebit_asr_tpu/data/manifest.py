"""Utterance manifests, waveform shards, and length bucketing.

The reference discovers utterance lengths by materializing the fbank of
EVERY training item at startup (reference src/data/dataset.py:509-521 — the
comment there admits it is expensive) and then pads each batch dynamically
to its own max (dataset.py:227-273), which on TPU would recompile per batch
shape. Here:

- `prepare ingest` writes waveforms into npz shards and a JSONL manifest
  row per utterance with `num_samples` cached — batch assembly is
  metadata-only, audio is never touched until a batch is actually built;
- `bucket_boundaries`/`bucketed_batches` implement length bucketing with
  per-bucket STATIC pad lengths: at most `num_buckets` compiled shapes for
  the whole training run (the TPU-native replacement for the reference's
  `LengthAwareBatchSampler`, dataset.py:359-441).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np


@dataclass
class Utterance:
    """One manifest row. `shard`/`index` locate the waveform; `num_samples`
    is cached so batching never reads audio; `tokens` are model-side ids
    (already +offset-shifted) filled by `prepare tokenize`.

    `feat_shard`/`num_frames` are filled by `prepare features` (the
    prepare-time fbank cache): when present, training skips the frontend
    entirely and assembles batches straight from cached log-mel features —
    the reference-equivalent of its worker-pool fbank overlap
    (src/data/dataset.py:532-539), moved to prepare time."""

    utt_id: str
    shard: str
    index: int
    num_samples: int
    text: str
    tokens: List[int] = field(default_factory=list)
    feat_shard: str = ""  # cached-fbank locator ("" = none): an .npy file
    # (one [sum_T, F] float16 memmap per split — assembly is pure slicing)
    # or a legacy npz shard keyed by utt_id
    feat_index: int = -1  # row offset into the .npy memmap (npz: unused)
    num_frames: int = 0  # cached frontend output length (frames)


def read_manifest(path: str) -> List[Utterance]:
    utts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                utts.append(Utterance(**json.loads(line)))
    return utts


def write_manifest(path: str, utts: List[Utterance]) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for u in utts:
            f.write(json.dumps(asdict(u)) + "\n")
    os.replace(tmp, path)


class ShardCache:
    """Lazy npz shard reader with a small keep-alive cache.

    Shards are written by `prepare ingest` (cli/prepare.py _write_shards) as
    one npz per ~512 utterances keyed by utt_id. Training touches shards in
    bucket order, so caching a handful of open shards covers the access
    pattern without holding the corpus in RAM.
    """

    def __init__(self, data_dir: str, max_open: int = 4):
        self.data_dir = data_dir
        self.max_open = max_open
        self._open: Dict[str, "np.lib.npyio.NpzFile"] = {}
        self._mmaps: Dict[str, np.ndarray] = {}  # .npy feat caches

    def _shard(self, name: str):
        if name not in self._open:
            if len(self._open) >= self.max_open:
                oldest = next(iter(self._open))
                self._open.pop(oldest).close()
            self._open[name] = np.load(os.path.join(self.data_dir, name))
        return self._open[name]

    def wav(self, utt: Utterance) -> np.ndarray:
        return np.asarray(self._shard(utt.shard)[utt.utt_id], np.float32)

    def feats(self, utt: Utterance) -> np.ndarray:
        """Cached log-mel features [T, F] (stored float16 by `prepare
        features`; upcast here — log-mel dynamic range fits f16 easily).

        `.npy` feat caches are one [sum_T, F] float16 memmap per split —
        a read is a zero-copy slice, which is what lets a 1-core host keep
        a v5e fed at batch 64 (npz per-utterance member reads measured as
        the sustained-throughput bottleneck, input_wait_frac 0.65+)."""
        if utt.feat_shard.endswith(".npy"):
            if utt.feat_shard not in self._mmaps:
                self._mmaps[utt.feat_shard] = np.load(
                    os.path.join(self.data_dir, utt.feat_shard),
                    mmap_mode="r",
                )
            m = self._mmaps[utt.feat_shard]
            return np.asarray(
                m[utt.feat_index : utt.feat_index + utt.num_frames],
                np.float32,
            )
        return np.asarray(self._shard(utt.feat_shard)[utt.utt_id], np.float32)

    def close(self) -> None:
        for f in self._open.values():
            f.close()
        self._open.clear()
        self._mmaps.clear()


def bucket_boundaries(lengths: np.ndarray, num_buckets: int) -> np.ndarray:
    """Quantile bucket upper bounds (ascending, last == max(lengths)).

    An utterance of length L belongs to bucket
    `min(searchsorted(bounds, L), num_buckets - 1)` — i.e. the first bound
    >= L. Quantile spacing balances utterances per bucket, which balances
    steps per compiled shape.
    """
    lengths = np.asarray(lengths)
    qs = np.quantile(lengths, (np.arange(num_buckets) + 1) / num_buckets)
    bounds = np.ceil(qs).astype(np.int64)
    bounds[-1] = lengths.max()
    return np.maximum.accumulate(bounds)


def bucketed_batches(
    lengths: np.ndarray,
    bounds: np.ndarray,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Yield index arrays: each batch drawn from ONE bucket (so every batch
    of a bucket pads to the same static length). With `rng`, shuffles within
    buckets and the global batch order; without, yields deterministically in
    length order (eval). `drop_last=False` emits the per-bucket remainders
    as final smaller batches (at most `num_buckets` extra compiled shapes)."""
    lengths = np.asarray(lengths)
    bucket_ids = np.minimum(np.searchsorted(bounds, lengths), len(bounds) - 1)
    batches = []
    for b in range(len(bounds)):
        idx = np.nonzero(bucket_ids == b)[0]
        if rng is not None:
            idx = rng.permutation(idx)
        n_full = len(idx) // batch_size
        for s in range(n_full):
            batches.append(idx[s * batch_size : (s + 1) * batch_size])
        if not drop_last and len(idx) % batch_size:
            batches.append(idx[n_full * batch_size :])
    if rng is not None:
        order = rng.permutation(len(batches))
        batches = [batches[i] for i in order]
    yield from batches
