"""Script twin of examples/explore_data.ipynb — the same cells, runnable
headless (MPLBACKEND=Agg) so the notebook's code is actually validated.
See the notebook for the narrated version."""

import matplotlib
matplotlib.use("Agg")

import os
import numpy as np
import matplotlib.pyplot as plt

from onebit_asr_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()  # site plugins may stomp JAX_PLATFORMS
import jax
import jax.numpy as jnp

DATA_DIR = os.environ.get("DEMO_DATA_DIR", "/tmp/demo")
assert os.path.isdir(DATA_DIR), f"run `prepare all --out_dir {DATA_DIR} --synthetic 64` first"

# %% cell
from onebit_asr_tpu.data.manifest import ShardCache, read_manifest
from onebit_asr_tpu.data.text import AsrTokenizer
from onebit_asr_tpu.utils.config import SpecialTokens

specials = SpecialTokens()
tokenizer = AsrTokenizer.find_and_load(DATA_DIR, specials)
manifest = read_manifest(os.path.join(DATA_DIR, "dev_manifest.jsonl"))
shards = ShardCache(DATA_DIR)
print(f"{len(manifest)} dev utterances, vocab {tokenizer.vocab_size}")

# %% cell
SAMPLE_INDEX = 7  # change to any index
utt = manifest[SAMPLE_INDEX % len(manifest)]
wav = shards.wav(utt)
print(f"{utt.utt_id}: {utt.num_samples/16000:.2f}s  text: {utt.text!r}")

# %% cell
plt.figure(figsize=(12, 2))
plt.plot(np.arange(len(wav)) / 16000.0, wav, lw=0.3)
plt.xlabel("seconds"); plt.title(f"waveform {utt.utt_id}")
plt.tight_layout(); plt.show()

# %% cell
from onebit_asr_tpu.ops.frontend import LogMelFrontend
from onebit_asr_tpu.utils.config import FrontendConfig

fe = LogMelFrontend(FrontendConfig())
feats, flens = fe(jnp.asarray(wav)[None], jnp.asarray([len(wav)], jnp.int32))
fb = np.asarray(feats[0, : int(flens[0])])
plt.figure(figsize=(12, 3))
plt.imshow(fb.T, origin="lower", aspect="auto", cmap="magma")
plt.colorbar(label="log-mel"); plt.xlabel("frames (10 ms)"); plt.ylabel("mel bin")
plt.title("80-dim Kaldi-compatible fbank"); plt.tight_layout(); plt.show()
print(f"frames: {fb.shape[0]}  mel stats: mean {fb.mean():.2f} std {fb.std():.2f}")

# %% cell
from onebit_asr_tpu.ops.frontend import apply_cmvn
from onebit_asr_tpu.ops.specaugment import spec_augment

stats = np.load(os.path.join(DATA_DIR, "cmvn_stats.npz"))
norm = np.asarray(
    apply_cmvn(jnp.asarray(fb)[None], jnp.asarray(stats["mean"]), jnp.asarray(stats["std"]))
)[0]
aug = np.asarray(spec_augment(
    jax.random.PRNGKey(3), jnp.asarray(norm)[None],
    jnp.asarray([norm.shape[0]], jnp.int32),
))[0]
fig, ax = plt.subplots(2, 1, figsize=(12, 5), sharex=True)
ax[0].imshow(norm.T, origin="lower", aspect="auto", cmap="magma"); ax[0].set_title("after global CMVN")
ax[1].imshow(aug.T, origin="lower", aspect="auto", cmap="magma"); ax[1].set_title("+ SpecAugment (2xF27 + 2xT100, ratio-capped)")
plt.tight_layout(); plt.show()
print(f"CMVN'd stats: mean {norm.mean():.3f} std {norm.std():.3f} (should be ~0/~1)")

# %% cell
ids = tokenizer.encode(utt.text)
back = tokenizer.ids_to_text(ids)
print("manifest ids :", utt.tokens[:20], "..." if len(utt.tokens) > 20 else "")
print("fresh encode :", ids[:20], "..." if len(ids) > 20 else "")
print("decoded      :", repr(back))
assert ids == list(utt.tokens), "manifest tokens must equal a fresh encode"
assert back.strip() == utt.text.strip().upper()
print('explore_data: all cells ran')
