"""Minimal library-API walkthrough (BASELINE config 1 shape).

"log-mel+CMVN frontend → small fp32 Conformer + CTC greedy decode" driven
directly through the library (no CLIs): synthesize a few waveforms, extract
features on device, run the encoder full-precision, greedy-decode, score
WER against the (random-init, therefore terrible) hypotheses. Runs on CPU
or TPU in under a minute.

    python examples/minimal_fp32_ctc.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.decode import compute_wer, greedy_ctc_decode
from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.ops.frontend import LogMelFrontend, accumulate_cmvn, apply_cmvn, finalize_cmvn
from onebit_asr_tpu.utils.config import FrontendConfig, SpecialTokens


def main():
    rng = np.random.default_rng(0)
    sr = 16000
    B = 4
    wav_len = sr * 2  # 2 s each
    wavs = jnp.asarray(rng.standard_normal((B, wav_len)), jnp.float32) * 0.1
    wav_lens = jnp.full((B,), wav_len, jnp.int32)

    # 1) fused device frontend + CMVN computed from this tiny "corpus"
    fe = LogMelFrontend(FrontendConfig())
    feats, feat_lens = fe(wavs, wav_lens)
    F = feats.shape[-1]
    acc = accumulate_cmvn(feats, feat_lens, (jnp.zeros(F), jnp.zeros(F), jnp.zeros(())))
    mean, std = finalize_cmvn(acc)
    feats = apply_cmvn(feats, mean, std)
    print(f"frontend: {feats.shape} log-mel frames, lens {list(map(int, feat_lens))}")

    # 2) small Conformer, FULL-PRECISION branch (binary_mask=None → fp32)
    model = ConformerASR(
        vocab_size=32, enc_d_model=64, enc_layers=2, enc_heads=2, enc_d_ff=128,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=128,
        deterministic=True, compute_dtype=jnp.float32, remat=False,
    )
    variables = model.init(jax.random.PRNGKey(0), feats, feat_lens, None)
    enc, mask, logits = jax.jit(
        lambda v, f, l: model.apply(v, f, l, None)
    )(variables, feats, feat_lens)
    print(f"encoder: {enc.shape}, ctc logits: {logits.shape}")

    # 3) on-device greedy CTC decode + WER
    specials = SpecialTokens()
    ids, lens = greedy_ctc_decode(logits, jnp.sum(mask, -1), specials.blank_id)
    hyps = [" ".join(str(int(t)) for t in np.asarray(ids[b, : int(lens[b])]))
            for b in range(B)]
    refs = ["5 6 7", "8 9", "10 11 12 13", "14"]
    dist, words = compute_wer(refs, hyps)
    print(f"greedy hyps: {hyps}")
    print(f"WER vs toy refs: {dist}/{words} = {dist / max(words, 1):.2f} "
          f"(random init — train it with onebit_asr_tpu.train)")


if __name__ == "__main__":
    main()
