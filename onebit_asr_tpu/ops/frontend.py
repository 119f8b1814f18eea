"""Kaldi-compatible log-mel filterbank frontend — fused, batched, on-device.

The reference computes features one utterance at a time on CPU dataloader
workers via `torchaudio.compliance.kaldi.fbank(num_mel_bins=80,
sample_frequency=16000)` (reference: src/data/dataset.py:124-128) and applies
global CMVN right after (dataset.py:130-131). Here the whole frontend —
framing -> DC removal -> preemphasis -> povey window -> rFFT power spectrum
-> mel filterbank -> log -> CMVN — is one jitted, statically-shaped device
function over padded batches:

- the framing is a static gather, the mel projection is a single [257->80]
  matmul that XLA fuses with the log/CMVN elementwise tail;
- per-utterance valid frame counts come from the Kaldi snip-edges formula so
  downstream masks are exact;
- batching means the TPU sees one big [B*T, 400] FFT instead of thousands of
  host-side single-utterance calls — this is the "mel-frontend frames/sec"
  benchmark surface from BASELINE.md.

Kaldi/torchaudio default semantics reproduced: frame 25 ms / shift 10 ms,
snip_edges=True, remove_dc_offset=True, preemphasis 0.97 (with x[0] -= 0.97*
x[0]), povey window (hann**0.85), round_to_power_of_two FFT padding, power
spectrum, mel banks over bins [0, nfft/2) with low=20 Hz, high=nyquist,
log(max(e, eps)).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.utils.config import FrontendConfig


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def povey_window(n: int) -> np.ndarray:
    """Kaldi 'povey' window: hann(n)**0.85 over n-1 denominator."""
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * i / (n - 1))
    return (hann ** 0.85).astype(np.float32)


def mel_scale(freq: np.ndarray) -> np.ndarray:
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(
    num_bins: int, nfft: int, sample_rate: float, low_freq: float, high_freq: float
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank matrix [num_fft_bins, num_bins].

    num_fft_bins = nfft // 2 (the nyquist bin is excluded, as in Kaldi).
    """
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    num_fft_bins = nfft // 2
    fft_bin_width = sample_rate / nfft
    mel_low = mel_scale(np.array(low_freq))
    mel_high = mel_scale(np.array(high_freq))
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mel_freqs = mel_scale(bin_freqs)  # [F]

    left = mel_low + np.arange(num_bins, dtype=np.float64)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta

    up = (mel_freqs[None, :] - left) / (center - left)
    down = (right - mel_freqs[None, :]) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.T.astype(np.float32)  # [num_fft_bins, num_bins]


def num_frames(num_samples: jnp.ndarray, frame_len: int, frame_shift: int) -> jnp.ndarray:
    """Kaldi snip-edges frame count: 0 if too short else 1+(n-len)//shift."""
    n = jnp.asarray(num_samples)
    return jnp.where(n < frame_len, 0, 1 + (n - frame_len) // frame_shift)


class LogMelFrontend:
    """Precomputed-constant holder + jitted batched fbank computation.

    Usage:
        fe = LogMelFrontend(FrontendConfig())
        feats, feat_lens = fe(wavs, wav_lens)      # [B, T, 80], [B]
    """

    def __init__(self, cfg: Optional[FrontendConfig] = None):
        self.cfg = cfg or FrontendConfig()
        c = self.cfg
        self.frame_len = int(c.sample_rate * c.frame_length_ms / 1000.0)  # 400
        self.frame_shift = int(c.sample_rate * c.frame_shift_ms / 1000.0)  # 160
        self.nfft = _next_pow2(self.frame_len)  # 512
        self._window = jnp.asarray(povey_window(self.frame_len))
        self._mel = jnp.asarray(
            mel_banks(c.num_mel_bins, self.nfft, c.sample_rate, c.low_freq, c.high_freq)
        )

    def frames_for_samples(self, num_samples) -> jnp.ndarray:
        return num_frames(num_samples, self.frame_len, self.frame_shift)

    def max_frames(self, max_samples: int) -> int:
        return max(0, 1 + (max_samples - self.frame_len) // self.frame_shift)

    @partial(jax.jit, static_argnums=0)
    def __call__(
        self,
        wavs: jnp.ndarray,
        wav_lens: jnp.ndarray,
        dither_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """wavs: [B, N] float32 padded waveforms; wav_lens: [B] sample counts.
        `dither_key` enables Kaldi-style dithering (cfg.dither amplitude,
        applied per frame before DC removal) when cfg.dither > 0.

        Returns (fbank [B, T, num_mel_bins] float32, feat_lens [B] int32) with
        T = max frames for N samples. Frames past feat_lens are computed from
        the zero padding and must be masked downstream; feat_lens is exact per
        utterance (Kaldi snip-edges formula).
        """
        c = self.cfg
        B, N = wavs.shape
        T = self.max_frames(N)
        if T <= 0:
            raise ValueError(f"waveform too short: {N} samples < {self.frame_len}")

        # [T, frame_len] static gather indices
        idx = (
            np.arange(T, dtype=np.int32)[:, None] * self.frame_shift
            + np.arange(self.frame_len, dtype=np.int32)[None, :]
        )
        frames = wavs[:, idx]  # [B, T, L]
        frames = frames.astype(jnp.float32)

        if dither_key is not None and c.dither > 0.0:
            frames = frames + c.dither * jax.random.normal(
                dither_key, frames.shape, jnp.float32
            )
        if c.remove_dc:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if c.preemphasis > 0.0:
            prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
            frames = frames - c.preemphasis * prev
        frames = frames * self._window

        spec = jnp.fft.rfft(frames, n=self.nfft, axis=-1)  # [B, T, nfft/2+1]
        power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))
        power = power[..., : self.nfft // 2]  # drop nyquist bin (Kaldi)

        mel = jnp.einsum(
            "btf,fm->btm", power, self._mel, preferred_element_type=jnp.float32
        )
        eps = jnp.finfo(jnp.float32).eps
        fbank = jnp.log(jnp.maximum(mel, eps))

        feat_lens = self.frames_for_samples(wav_lens).astype(jnp.int32)
        feat_lens = jnp.minimum(feat_lens, T)
        return fbank, feat_lens


@jax.jit
def apply_cmvn(feats: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Global CMVN: (x - mean) / std per mel bin (reference dataset.py:130-131)."""
    return (feats - mean) / std


@jax.jit
def accumulate_cmvn(
    feats: jnp.ndarray, feat_lens: jnp.ndarray, acc: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Accumulate (sum, sumsq, count) over valid frames of a padded batch.

    Device-side replacement for the reference's host loop over the first 1000
    utterances (src/data/dataset.py:276-345).
    """
    s, sq, n = acc
    B, T, F = feats.shape
    mask = (jnp.arange(T)[None, :] < feat_lens[:, None]).astype(jnp.float32)
    m = mask[..., None]
    s = s + jnp.sum(feats * m, axis=(0, 1))
    sq = sq + jnp.sum(jnp.square(feats) * m, axis=(0, 1))
    n = n + jnp.sum(mask)
    return s, sq, n


def finalize_cmvn(
    acc: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], std_floor: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum, sumsq, count) -> (mean, std) with std floored (dataset.py:330)."""
    s, sq, n = acc
    n = jnp.maximum(n, 1.0)
    mean = s / n
    var = jnp.maximum(sq / n - jnp.square(mean), 0.0)
    std = jnp.maximum(jnp.sqrt(var), std_floor)
    return mean, std


def resample_linear(wav: np.ndarray, orig_sr: int, new_sr: int = 16000) -> np.ndarray:
    """Host-side linear resampler for the rare non-16k utterance
    (reference resamples with torchaudio at dataset.py:120-122)."""
    if orig_sr == new_sr:
        return wav
    n_out = int(round(len(wav) * new_sr / orig_sr))
    x_old = np.linspace(0.0, 1.0, num=len(wav), endpoint=False)
    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
    return np.interp(x_new, x_old, wav).astype(np.float32)
