"""Walkthrough: train a streaming-capable model and decode incrementally.

Run end-to-end on synthetic data (no downloads, ~10 min on one TPU chip):

    python -m onebit_asr_tpu.prepare all --out_dir /tmp/demo --synthetic 256 \
        --vocab_size 64 --num_utts 64
    python examples/streaming_asr.py --data_dir /tmp/demo

What it shows:
1. The STREAMING-TRAINABLE configuration: U2-style chunked attention
   (`attn_chunk_size`, `attn_left_chunks`), causal depthwise conv, and the
   per-frame conv norm — one flag set on the same ConformerASR.
2. Incremental decoding with `StreamingSession`: feed features in small
   pushes, receive token ids as soon as their chunk is decodable; the
   transcript is IDENTICAL to the offline encoder's greedy decode
   (tests/test_streaming.py proves it in general; this script asserts it
   on the model it just trained).
3. LM shallow fusion on the offline beam (`prepare lm` + `--lm`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/demo")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--save_dir", default="/tmp/demo_ckpt")
    args = ap.parse_args()

    from onebit_asr_tpu.cli.train import main as train_main

    rc = train_main(
        f"--data_dir {args.data_dir} --epochs {args.epochs} --batch_size 16 "
        "--enc_d_model 128 --enc_layers 4 --enc_heads 4 --enc_d_ff 512 "
        "--enc_conv_kernel 15 --dec_layers 1 --dec_d_ff 512 "
        "--warmup_steps 100 "
        "--conv_norm layer_norm --causal_conv "
        "--attn_chunk_size 16 --attn_left_chunks 4 "
        f"--save_dir {args.save_dir} --run_name stream_demo".split()
    )
    if rc:
        return rc

    # ---- restore and decode one utterance incrementally
    from onebit_asr_tpu.data.librispeech import LibriSpeechDataModule
    from onebit_asr_tpu.data.text import AsrTokenizer
    from onebit_asr_tpu.decode.greedy import greedy_ctc_decode
    from onebit_asr_tpu.decode.streaming import StreamingSession
    from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.utils.checkpoint import (
        CheckpointManager,
        abstract_like,
        load_config,
    )
    from onebit_asr_tpu.utils.config import DataConfig

    run_dir = os.path.join(args.save_dir, "stream_demo")
    cfg = load_config(run_dir)
    mc = cfg.model
    tok = AsrTokenizer.load(
        os.path.join(args.data_dir, "tokenizer.json"), mc.specials
    )
    dm = LibriSpeechDataModule(
        args.data_dir, tok, DataConfig(data_dir=args.data_dir, batch_size=4),
        splits=("test",),
    )
    batch = next(dm.featurized_batches("test", augment=False, batch_size=4))
    model = ConformerASR.from_config(mc, deterministic=True)
    state = create_train_state(
        model, make_optimizer(cfg.optim, total_steps=1),
        jax.random.PRNGKey(0), batch, mc.enc_layers,
    )
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    state = ckpt.restore(abstract_like(state))
    ckpt.close()

    T = int(batch["feat_lens"][0])
    feats = np.asarray(batch["feats"][0, :T])

    # offline greedy
    bm = precision_to_binary_mask(2, mc.enc_layers)
    _, mask, logits = model.apply(
        {"params": state.params}, feats[None], jnp.array([T]), bm
    )
    ids, n = greedy_ctc_decode(logits, jnp.sum(mask, -1), mc.specials.blank_id)
    offline = np.asarray(ids[0][: int(n[0])]).tolist()

    # streaming: 100-frame (1 s) pushes
    sess = StreamingSession(mc, state.params, precision=2)
    streamed = []
    for s in range(0, T, 100):
        new = sess.accept(feats[s : s + 100])
        if new:
            print(f"  after {min(s+100, T)/100:.1f}s audio: +{tok.ids_to_text(new)!r}")
        streamed.extend(new)
    streamed.extend(sess.finish())

    print("offline :", tok.ids_to_text(offline))
    print("streamed:", tok.ids_to_text(streamed))
    assert streamed == offline, "streaming must equal offline greedy"
    print("OK: incremental transcript == offline transcript")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
