"""wav-directory ingest: stdlib wav reader + trans.txt pairing → manifests."""

import pytest
import os
import wave

import numpy as np

from onebit_asr_tpu.cli.prepare import main as prepare_main
from onebit_asr_tpu.data.manifest import ShardCache, read_manifest


def _write_wav(path, wav, sr=16000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())


def test_wav_dir_ingest(tmp_path):
    src = tmp_path / "corpus" / "spk1"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        uid = f"spk1-000-{i:04d}"
        wav = rng.standard_normal(16000 + i * 800).astype(np.float32) * 0.1
        _write_wav(str(src / f"{uid}.wav"), wav)
        lines.append(f"{uid} HELLO WORLD NUMBER {i}")
    (src / "spk1-000.trans.txt").write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "data")
    rc = prepare_main(
        ["ingest", "--wav_dir", str(tmp_path / "corpus"), "--out_dir", out,
         "--dev_fraction", "0.2"]
    )
    assert rc == 0
    train = read_manifest(os.path.join(out, "train_manifest.jsonl"))
    dev = read_manifest(os.path.join(out, "dev_manifest.jsonl"))
    assert len(train) + len(dev) == 6 and len(dev) == 1
    cache = ShardCache(out)
    u = train[0]
    wav = cache.wav(u)
    assert wav.dtype == np.float32 and len(wav) == u.num_samples
    assert "HELLO WORLD" in u.text


def test_wav_reader_resamples(tmp_path):
    from onebit_asr_tpu.cli.prepare import _read_wav

    wav = np.sin(np.linspace(0, 100, 8000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    _write_wav(p, wav, sr=8000)
    out = _read_wav(p)
    assert abs(len(out) - 16000) <= 2  # resampled 8k -> 16k

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
