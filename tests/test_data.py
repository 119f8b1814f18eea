"""Data pipeline tests: tokenizer round-trip, manifest/bucketing, end-to-end
prepare → datamodule → batch contract on synthetic data."""

import os

import numpy as np
import pytest

from onebit_asr_tpu.data.manifest import (
    bucket_boundaries,
    bucketed_batches,
)
from onebit_asr_tpu.data.text import AsrTokenizer
from onebit_asr_tpu.utils.config import DataConfig, SpecialTokens

SPECIALS = SpecialTokens()


@pytest.fixture(scope="module")
def tokenizer():
    texts = [
        "THE CAT SAT ON THE MAT",
        "HELLO WORLD SPEECH RECOGNITION",
        "THE QUICK BROWN FOX JUMPS",
        "A DOG RAN FAST",
    ] * 32
    return AsrTokenizer.train(texts, vocab_size=64, specials=SPECIALS)


def test_tokenizer_roundtrip(tokenizer):
    text = "THE CAT SAT"
    ids = tokenizer.encode(text)
    assert all(i >= SPECIALS.offset for i in ids)  # model-side shift applied
    assert tokenizer.ids_to_text(ids) == text


def test_tokenizer_ids_to_text_drops_specials(tokenizer):
    ids = tokenizer.encode("HELLO WORLD")
    noisy = [SPECIALS.pad_id, SPECIALS.bos_id] + ids + [SPECIALS.blank_id, SPECIALS.eos_id]
    assert tokenizer.ids_to_text(noisy) == "HELLO WORLD"


def test_tokenizer_vocab_accounting(tokenizer):
    assert tokenizer.vocab_size == tokenizer.subword_vocab_size + 4


def test_tokenizer_save_load(tokenizer, tmp_path):
    p = str(tmp_path / "tok.json")
    tokenizer.save(p)
    tok2 = AsrTokenizer.load(p, SPECIALS)
    assert tok2.encode("THE CAT") == tokenizer.encode("THE CAT")


def test_bucketing_static_shapes():
    rng = np.random.default_rng(0)
    lengths = rng.integers(100, 10000, size=500)
    bounds = bucket_boundaries(lengths, 4)
    assert (np.sort(bounds) == bounds).all()
    assert bounds[-1] == lengths.max()
    batches = list(bucketed_batches(lengths, bounds, 8, rng))
    seen = set()
    for idx in batches:
        assert len(idx) == 8
        bucket_ids = np.minimum(np.searchsorted(bounds, lengths[idx]), len(bounds) - 1)
        assert len(set(bucket_ids)) == 1  # one bucket per batch
        seen.update(idx.tolist())
    # with drop_last, at most batch_size-1 lost per bucket
    assert len(seen) >= len(lengths) - len(bounds) * 7


def test_prepare_to_datamodule_end_to_end(tmp_path):
    """prepare all --synthetic → LibriSpeechDataModule → contract batches."""
    from onebit_asr_tpu.cli.prepare import main as prepare_main
    from onebit_asr_tpu.data.librispeech import LibriSpeechDataModule

    out = str(tmp_path / "data")
    rc = prepare_main(
        ["all", "--out_dir", out, "--synthetic", "24", "--max_seconds", "2.0",
         "--vocab_size", "64", "--num_utts", "8"]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "tokenizer.json"))
    assert os.path.exists(os.path.join(out, "cmvn_stats.npz"))

    tok = AsrTokenizer.load(os.path.join(out, "tokenizer.json"), SPECIALS)
    dm = LibriSpeechDataModule(
        out, tok,
        DataConfig(batch_size=4, num_buckets=2, max_frames=250, max_tokens=24),
    )
    assert dm.num_utts("train") == 24
    n = 0
    for batch in dm.featurized_batches("train", augment=True):
        assert batch["feats"].ndim == 3 and batch["feats"].shape[2] == 80
        assert batch["feats"].shape[0] == 4
        B, T, F = batch["feats"].shape
        assert (np.asarray(batch["feat_lens"]) <= T).all()
        assert (np.asarray(batch["token_lens"]) > 0).all()
        assert np.isfinite(np.asarray(batch["feats"])).all()
        n += 1
    assert n >= 2  # 24 utts / bs 4 with bucket drop_last

    # CMVN applied → roughly zero-mean over valid frames
    batch = next(dm.featurized_batches("dev", augment=False))
    feats = np.asarray(batch["feats"])
    lens = np.asarray(batch["feat_lens"])
    mask = np.arange(feats.shape[1])[None, :] < lens[:, None]
    m = feats[mask].mean()
    assert abs(m) < 1.0, m


def test_feature_cache_matches_frontend(tmp_path, monkeypatch):
    """`prepare features` caches fbank; cached batches must match the
    frontend path per utterance (f16 storage rounding only) and train
    end-to-end with SpecAugment applied on device."""
    from onebit_asr_tpu.cli.prepare import main as prepare_main
    from onebit_asr_tpu.data.librispeech import LibriSpeechDataModule

    out = str(tmp_path / "data")
    rc = prepare_main(
        ["all", "--out_dir", out, "--synthetic", "16", "--max_seconds", "2.0",
         "--vocab_size", "64", "--num_utts", "8"]
    )
    assert rc == 0
    tok = AsrTokenizer.load(os.path.join(out, "tokenizer.json"), SPECIALS)
    cfg = DataConfig(batch_size=4, num_buckets=2, max_frames=250,
                     max_tokens=24)

    # frontend-path reference batches (cache not built yet)
    dm = LibriSpeechDataModule(out, tok, cfg)
    ref = {}
    for b in dm.featurized_batches("dev", augment=False):
        f, l = np.asarray(b["feats"]), np.asarray(b["feat_lens"])
        for i, tl in enumerate(np.asarray(b["token_lens"])):
            key = tuple(np.asarray(b["tokens"])[i, :tl])
            ref[key] = (f[i, : l[i]], l[i])
    dm.close()

    rc = prepare_main(["features", "--out_dir", out])
    assert rc == 0
    import glob

    assert os.path.exists(os.path.join(out, "dev_feats.npy"))  # f16 memmap
    del glob

    dm2 = LibriSpeechDataModule(out, tok, cfg)
    # the cache path engages (manifest rows are stamped)
    assert all(u.feat_shard for u in dm2._manifests["dev"])
    n = 0
    for b in dm2.featurized_batches("dev", augment=False):
        f, l = np.asarray(b["feats"]), np.asarray(b["feat_lens"])
        for i, tl in enumerate(np.asarray(b["token_lens"])):
            key = tuple(np.asarray(b["tokens"])[i, :tl])
            rf, rl = ref[key]
            assert l[i] == rl
            np.testing.assert_allclose(f[i, : l[i]], rf, rtol=0, atol=2e-2)
            n += 1
    assert n >= 4

    # augment still works on the cached path (shapes finite, masked zeros)
    b = next(dm2.featurized_batches("train", augment=True))
    assert np.isfinite(np.asarray(b["feats"])).all()

    # env kill-switch forces the frontend path back on
    monkeypatch.setenv("ONEBIT_NO_FEATURE_CACHE", "1")
    b2 = next(dm2.featurized_batches("dev", augment=False))
    rf0 = np.asarray(b2["feats"])
    assert np.isfinite(rf0).all()
    dm2.close()

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick


def test_spec_augment_indexed_identical():
    """The indexed (in-jit key fold) augment path produces bit-identical
    masks to the eager fold_in + spec_augment chain it replaced — the
    producer-latency fix must not change the draw stream."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from onebit_asr_tpu.ops.specaugment import (
        spec_augment_from_config,
        spec_augment_indexed_from_config,
    )
    from onebit_asr_tpu.utils.config import FrontendConfig

    cfg = FrontendConfig()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, 64, 80)).astype(np.float32)
    lens = np.asarray([64, 50, 33, 7], np.int32)
    key = jax.random.PRNGKey(123)
    for i in (0, 1, 17):
        eager = spec_augment_from_config(
            jax.random.fold_in(key, i), jnp.asarray(feats),
            jnp.asarray(lens), cfg,
        )
        indexed = spec_augment_indexed_from_config(key, i, feats, lens, cfg)
        np.testing.assert_array_equal(np.asarray(eager), np.asarray(indexed))
