"""Transcribe CLI: checkpoint + audio → text (the serving entry point).

Covers manifest input, raw-wav-dir input (including resampling + nested
dirs), packed 2-bit serving, and the beam+LM path — all through main().
"""

import os
import wave

import numpy as np
import pytest

TINY = [
    "--enc_layers", "2", "--enc_d_model", "32", "--enc_heads", "2",
    "--enc_d_ff", "64", "--enc_conv_kernel", "7", "--dec_layers", "1",
    "--dec_heads", "2", "--dec_d_ff", "64", "--warmup_steps", "2",
    "--compute_dtype", "float32", "--batch_size", "2",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from onebit_asr_tpu.cli.prepare import main as prepare_main
    from onebit_asr_tpu.cli.train import main as train_main

    root = tmp_path_factory.mktemp("transcribe")
    data = str(root / "data")
    save = str(root / "ckpt")
    rc = prepare_main(
        ["all", "--out_dir", data, "--synthetic", "24", "--vocab_size", "24",
         "--num_utts", "12"]
    )
    assert rc == 0
    rc = train_main(
        ["--data_dir", data, "--epochs", "1", "--steps_per_epoch", "2",
         "--eval_batches", "1", "--save_dir", save, "--run_name", "t"] + TINY
    )
    assert rc == 0
    return data, os.path.join(save, "t")


def _lines(path):
    return [l.rstrip("\n").split("\t") for l in open(path) if l.strip()]


def test_transcribe_manifest(trained, tmp_path):
    from onebit_asr_tpu.cli.transcribe import main

    data, run = trained
    out = str(tmp_path / "hyp.tsv")
    rc = main(["--checkpoint", run, "--data_dir", data, "--split", "dev",
               "--batch_size", "2", "--out", out])
    assert rc == 0
    rows = _lines(out)
    assert rows and all(len(r) == 2 for r in rows)
    assert all(r[0].startswith("dev-") for r in rows)


def test_transcribe_wav_dir(trained, tmp_path):
    from onebit_asr_tpu.cli.transcribe import main

    data, run = trained
    wav_dir = tmp_path / "wavs"
    (wav_dir / "sub").mkdir(parents=True)
    for name, sr in [("a.wav", 16000), ("sub/b.wav", 8000)]:
        t = np.arange(sr // 2) / sr
        pcm = (np.sin(2 * np.pi * 440 * t) * 0.3 * 32767).astype(np.int16)
        with wave.open(str(wav_dir / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    out = str(tmp_path / "hyp.tsv")
    rc = main(["--checkpoint", run, "--wav_dir", str(wav_dir),
               "--data_dir", data, "--batch_size", "2", "--out", out])
    assert rc == 0
    ids = sorted(r[0] for r in _lines(out))
    assert ids == ["a", "sub/b"]


def test_transcribe_packed_matches_fake_quant(trained, tmp_path):
    """Packed 2-bit serving must transcribe identically to the fake-quant
    path at the same precision (bit-parity of the serving format)."""
    from onebit_asr_tpu.cli.transcribe import main

    data, run = trained
    o1, o2 = str(tmp_path / "fq.tsv"), str(tmp_path / "pk.tsv")
    base = ["--checkpoint", run, "--data_dir", data, "--split", "dev",
            "--batch_size", "2", "--max_batches", "1", "--precision", "2"]
    assert main(base + ["--out", o1]) == 0
    assert main(base + ["--packed", "--out", o2]) == 0
    assert _lines(o1) == _lines(o2)


def test_transcribe_longform(trained, tmp_path):
    """A recording longer than one window runs the overlapped-chunk +
    stitched-CTC path end to end (greedy only, wav-dir only)."""
    from onebit_asr_tpu.cli.transcribe import main

    data, run = trained
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    sr = 16000
    t = np.arange(12 * sr) / sr
    pcm = (np.sin(2 * np.pi * 330 * t) * 0.3 * 32767).astype(np.int16)
    with wave.open(str(wav_dir / "long.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    out = str(tmp_path / "hyp.tsv")
    rc = main(["--checkpoint", run, "--wav_dir", str(wav_dir),
               "--data_dir", data, "--longform", "--chunk_seconds", "5",
               "--overlap_seconds", "1", "--out", out])
    assert rc == 0
    rows = _lines(out)
    assert [r[0] for r in rows] == ["long"]
    # constraints are explicit errors
    assert main(["--checkpoint", run, "--data_dir", data, "--longform"]) == 2
    assert main(["--checkpoint", run, "--wav_dir", str(wav_dir),
                 "--data_dir", data, "--longform", "--beam_size", "4"]) == 2


def test_transcribe_beam_lm(trained, tmp_path):
    from onebit_asr_tpu.cli.transcribe import main

    data, run = trained
    out = str(tmp_path / "hyp.tsv")
    rc = main(["--checkpoint", run, "--data_dir", data, "--split", "dev",
               "--batch_size", "2", "--max_batches", "1", "--beam_size", "3",
               "--lm", os.path.join(data, "lm.npz"), "--out", out])
    assert rc == 0
    assert _lines(out)
    # --lm without beam is an explicit error, not silently un-fused
    rc = main(["--checkpoint", run, "--data_dir", data, "--split", "dev",
               "--lm", os.path.join(data, "lm.npz")])
    assert rc == 2
