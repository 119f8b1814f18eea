"""LibriSpeech downloader — `python -m onebit_asr_tpu.cli.download`.

Parity with the reference's `utils/download_data.py` (+ download_data.sh):
streams HuggingFace `librispeech_asr` per split, optionally keeping only a
percentage subset, and saves each to `data/{split}_subset` with
`Dataset.save_to_disk` — the exact layout `prepare ingest` consumes
(reference: utils/download_data.py:42-178, documented 1% invocation at
download_data.sh:1).

Network-gated: in zero-egress environments this module still imports and
`--help` works; the actual download raises a clear error. Use
`prepare ingest --synthetic N` or `--wav_dir` there instead.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

# split sizes for percentage subsets (reference download_data.py:99-107)
SPLIT_SIZES = {
    "train.clean.100": 28539,
    "train.clean.360": 104014,
    "train.other.500": 148688,
    "validation.clean": 2703,
    "validation.other": 2864,
    "test.clean": 2620,
    "test.other": 2939,
}


def download_librispeech(
    splits,
    subset_percentage: float = 1.0,
    cache_dir: str = "data",
) -> None:
    from datasets import Dataset, load_dataset

    for split in splits:
        n_total = SPLIT_SIZES.get(split)
        take = (
            max(1, math.ceil(n_total * subset_percentage))
            if (n_total and subset_percentage < 1.0)
            else None
        )
        print(f"downloading {split}" + (f" (first {take})" if take else ""))
        ds = load_dataset(
            "librispeech_asr", split=split.replace("validation.", "validation."),
            streaming=True, trust_remote_code=True,
        )
        rows = []
        for i, row in enumerate(ds):
            if take is not None and i >= take:
                break
            rows.append(row)
        out = os.path.join(cache_dir, f"{split}_subset")
        Dataset.from_list(rows).save_to_disk(out)
        print(f"saved {len(rows)} rows -> {out}")


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    p = argparse.ArgumentParser(description="download LibriSpeech from HF hub")
    p.add_argument(
        "--splits", type=str,
        default=",".join(SPLIT_SIZES.keys()),
    )
    p.add_argument("--subset", type=float, default=0.01,
                   help="fraction per split (reference download_data.sh uses 0.01)")
    p.add_argument("--cache-dir", "--cache_dir", type=str, default="data")
    args = p.parse_args(argv)
    try:
        download_librispeech(
            args.splits.split(","), args.subset, args.cache_dir
        )
    except Exception as e:
        print(
            f"download failed ({e}); in zero-egress environments use "
            f"`python -m onebit_asr_tpu.prepare ingest --synthetic N` or "
            f"`--wav_dir <corpus>`",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
