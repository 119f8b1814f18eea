"""Generate golden fixtures for the log-mel frontend.

Independent float64 numpy re-derivation of the exact semantics of
`torchaudio.compliance.kaldi.fbank(num_mel_bins=80, sample_frequency=16000)`
— the reference's frontend call (reference: src/data/dataset.py:124-128) —
written WITHOUT importing torchaudio (absent from this image) and without
importing onebit_asr_tpu (so a frontend bug cannot leak into its own
oracle). Every step mirrors a documented torchaudio/Kaldi behavior:

  1. snip_edges framing: m = 1 + (n - 400) // 160 frames of 400 samples,
     hop 160 (torchaudio kaldi._get_strided, snip_edges=True).
  2. remove_dc_offset=True: subtract each frame's own mean.
  3. preemphasis 0.97 against the REPLICATED previous sample: frame[0] is
     preemphasized against itself (torchaudio pads mode="replicate").
  4. povey window: hann(N, periodic=False) ** 0.85, i.e.
     (0.5 - 0.5*cos(2*pi*i/(N-1))) ** 0.85.
  5. round_to_power_of_two: zero-pad each frame 400 -> 512 before the rFFT;
     power spectrum |X|^2 over all 257 bins.
  6. Kaldi mel banks: 80 triangular filters on the 1127*ln(1+f/700) scale,
     low=20 Hz, high=nyquist, over fft bins [0, 256); the nyquist bin gets
     weight 0 (torchaudio pads the 256-wide bank with one zero column).
  7. log(max(mel, eps_f32)) with eps_f32 = 1.1920928955078125e-07
     (torchaudio uses the f32 epsilon for f32 inputs).

Run from the repo root:  python tests/golden/make_frontend_golden.py
Writes frontend_golden.npz next to this file. The fixtures are COMMITTED;
regenerate only if the oracle itself is found wrong, and say why in the
commit message.
"""

import math
import os

import numpy as np

SR = 16000
FRAME_LEN = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
NFFT = 512
NUM_BINS = 80
LOW_FREQ = 20.0
PREEMPH = 0.97
EPS_F32 = float(np.finfo(np.float32).eps)


def kaldi_fbank_oracle(wav: np.ndarray) -> np.ndarray:
    """[n] float -> [m, 80] float64 log-mel fbank, torchaudio-kaldi defaults."""
    wav = np.asarray(wav, np.float64)
    n = wav.shape[0]
    m = 1 + (n - FRAME_LEN) // FRAME_SHIFT
    assert m >= 1, "signal shorter than one frame"

    frames = np.empty((m, FRAME_LEN), np.float64)
    for i in range(m):
        frames[i] = wav[i * FRAME_SHIFT : i * FRAME_SHIFT + FRAME_LEN]

    frames = frames - frames.mean(axis=1, keepdims=True)

    prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)  # replicate
    frames = frames - PREEMPH * prev

    i = np.arange(FRAME_LEN, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * i / (FRAME_LEN - 1))
    frames = frames * hann**0.85

    spec = np.fft.rfft(frames, n=NFFT, axis=1)  # [m, 257]
    power = np.abs(spec) ** 2

    # mel banks over bins [0, 256); nyquist column weight 0
    fft_bin_width = SR / NFFT
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    mel_low, mel_high = mel(LOW_FREQ), mel(SR / 2.0)
    mel_delta = (mel_high - mel_low) / (NUM_BINS + 1)
    bin_mels = mel(fft_bin_width * np.arange(NFFT // 2, dtype=np.float64))
    left = mel_low + np.arange(NUM_BINS, dtype=np.float64)[:, None] * mel_delta
    center, right = left + mel_delta, left + 2 * mel_delta
    up = (bin_mels[None, :] - left) / (center - left)
    down = (right - bin_mels[None, :]) / (right - center)
    bank = np.maximum(0.0, np.minimum(up, down))  # [80, 256]
    bank = np.concatenate([bank, np.zeros((NUM_BINS, 1))], axis=1)  # [80, 257]

    mel_e = power @ bank.T  # [m, 80]
    return np.log(np.maximum(mel_e, EPS_F32))


def make_signals() -> dict:
    """Real-shaped test signals: int16-scale noise, chirp, speech-like
    harmonics, near-silence, DC-offset tone. Odd lengths included."""
    rng = np.random.default_rng(20260817)
    sigs = {}

    sigs["noise_int16_scale"] = (
        rng.standard_normal(16000) * 3000.0
    ).astype(np.float32)

    t = np.arange(8000) / SR
    f0, f1 = 100.0, 7000.0
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1]))
    sigs["chirp"] = (0.5 * np.sin(phase)).astype(np.float32)

    # speech-like: jittered F0 ~120 Hz, 12 harmonics shaped by two formant
    # humps, slow amplitude envelope, a little noise floor
    n = 12345
    t = np.arange(n) / SR
    f0_tr = 120.0 + 15.0 * np.sin(2 * np.pi * 2.3 * t)
    phi0 = 2 * np.pi * np.cumsum(f0_tr) / SR
    x = np.zeros(n)
    for h in range(1, 13):
        fh = 120.0 * h
        gain = math.exp(-((fh - 500.0) ** 2) / (2 * 250.0**2)) + 0.6 * math.exp(
            -((fh - 1500.0) ** 2) / (2 * 400.0**2)
        )
        x += gain * np.sin(h * phi0)
    env = 0.3 + 0.7 * np.clip(np.sin(2 * np.pi * 3.1 * t) + 0.4, 0, None)
    x = x * env + 0.01 * rng.standard_normal(n)
    sigs["speech_like"] = (x / np.max(np.abs(x))).astype(np.float32)

    sigs["near_silence"] = (1e-3 * rng.standard_normal(4000)).astype(np.float32)

    t = np.arange(2000) / SR
    sigs["tone_dc_offset"] = (0.1 + 0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(
        np.float32
    )
    return sigs


def main():
    out = {}
    for name, wav in make_signals().items():
        out[f"wav_{name}"] = wav
        out[f"fbank_{name}"] = kaldi_fbank_oracle(wav).astype(np.float32)
    path = os.path.join(os.path.dirname(__file__), "frontend_golden.npz")
    np.savez_compressed(path, **out)
    for name in make_signals():
        fb = out[f"fbank_{name}"]
        print(f"{name}: wav {out[f'wav_{name}'].shape} -> fbank {fb.shape}, "
              f"range [{fb.min():.3f}, {fb.max():.3f}]")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
