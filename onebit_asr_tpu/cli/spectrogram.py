"""Spectrogram visualization — `python -m onebit_asr_tpu.cli.spectrogram`.

Parity with the reference's `test/test_spectrogram.py` (renders one
utterance's log-mel fbank to a PNG, /root/reference/test/test_spectrogram.py:
13-102), but through the fused device frontend: pulls an utterance from a
prepared data dir (or synthesizes one), runs LogMelFrontend (+CMVN if stats
exist), saves a PNG heatmap.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    p = argparse.ArgumentParser(description="render one utterance's fbank to PNG")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--split", type=str, default="dev")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", type=str, default="spectrogram.png")
    p.add_argument("--synthetic", action="store_true",
                   help="render a synthetic chirp instead of dataset audio")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from onebit_asr_tpu.ops.frontend import LogMelFrontend, apply_cmvn
    from onebit_asr_tpu.utils.config import FrontendConfig

    fe = LogMelFrontend(FrontendConfig())
    title = "synthetic chirp"
    if args.synthetic:
        t = np.linspace(0, 3.0, 48000, endpoint=False)
        wav = np.sin(2 * np.pi * (200 + 800 * t) * t).astype(np.float32)
    else:
        from onebit_asr_tpu.data.manifest import ShardCache, read_manifest

        utts = read_manifest(
            os.path.join(args.data_dir, f"{args.split}_manifest.jsonl")
        )
        u = utts[args.index]
        wav = ShardCache(args.data_dir).wav(u)
        title = f"{u.utt_id}: {u.text[:60]}"

    feats, lens = fe(jnp.asarray(wav)[None, :], jnp.asarray([len(wav)]))
    cmvn_path = os.path.join(args.data_dir, "cmvn_stats.npz")
    if os.path.exists(cmvn_path):
        z = np.load(cmvn_path)
        feats = apply_cmvn(feats, jnp.asarray(z["mean"]), jnp.asarray(z["std"]))
        title += " (CMVN)"
    fb = np.asarray(feats[0, : int(lens[0])]).T  # [F, T]

    fig, ax = plt.subplots(figsize=(12, 4))
    im = ax.imshow(fb, aspect="auto", origin="lower", cmap="viridis")
    ax.set_xlabel("frame (10 ms)")
    ax.set_ylabel("mel bin")
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({fb.shape[1]} frames x {fb.shape[0]} mel bins)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
