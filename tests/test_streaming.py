"""Streaming encoder: exact equivalence with the offline chunked-causal model.

The core guarantee (model/streaming.py): a model trained with
attn_chunk_size/attn_left_chunks/causal_conv/layer_norm options produces the
SAME encoder outputs whether a recording is processed offline in one shot or
incrementally chunk-by-chunk through StreamingSession caches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.decode.greedy import greedy_ctc_decode
from onebit_asr_tpu.decode.streaming import StreamingSession, streaming_greedy_decode
from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.model.conformer import chunk_pair_mask, subsampled_length
from onebit_asr_tpu.utils.config import ModelConfig, SpecialTokens

CS = 4  # chunk size (subsampled frames)
LEFT = 1


def _cfg(**kw):
    return ModelConfig(
        vocab_size=32,
        enc_d_model=32,
        enc_layers=2,
        enc_heads=2,
        enc_d_ff=64,
        enc_conv_kernel=7,
        dec_layers=1,
        dec_heads=2,
        dec_d_ff=64,
        dropout=0.0,
        conv_norm="layer_norm",
        causal_conv=True,
        attn_chunk_size=CS,
        attn_left_chunks=LEFT,
        remat_blocks=False,
        **kw,
    )


@pytest.fixture(scope="module")
def trained_like():
    cfg = _cfg()
    model = ConformerASR.from_config(cfg, deterministic=True)
    key = jax.random.PRNGKey(0)
    T = 80
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.input_dim))
    lens = jnp.array([T], jnp.int32)
    bm = precision_to_binary_mask(2, cfg.enc_layers)
    variables = model.init(key, feats, lens, bm)
    return cfg, model, variables["params"], np.asarray(feats[0])


def test_chunk_pair_mask_semantics():
    m = np.asarray(chunk_pair_mask(8, 3, 1))
    # frame 4 (chunk 1) sees chunks 0..1 = frames 0..5
    assert m[4].tolist() == [True] * 6 + [False] * 2
    # frame 7 (chunk 2) with left=1 sees chunks 1..2 = frames 3..7
    assert m[7].tolist() == [False] * 3 + [True] * 5
    full = np.asarray(chunk_pair_mask(8, 3, -1))
    assert full[7].tolist() == [True] * 8


def test_streaming_matches_offline_encoder_logits(trained_like):
    cfg, model, params, feats = trained_like
    T = feats.shape[0]
    lens = jnp.array([T], jnp.int32)
    bm = precision_to_binary_mask(2, cfg.enc_layers)
    _, _, logits_off = model.apply({"params": params}, feats[None], lens, bm)
    Tsub = int(subsampled_length(lens)[0])

    sess = StreamingSession(cfg, params, precision=2)
    chunks_logits = []
    # drive the jitted step exactly as the session does, capturing logits
    orig = sess._step

    def capture(*a):
        logits, caches = orig(*a)
        chunks_logits.append(np.asarray(logits[0]))
        return logits, caches

    sess._step = capture
    sess.accept(feats)
    sess.finish()
    got = np.concatenate(
        [c[: min(CS, Tsub - i * CS)] for i, c in enumerate(chunks_logits)]
    )
    assert got.shape[0] == Tsub
    ref = np.asarray(logits_off[0, :Tsub])
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # agreement that matters: identical argmax almost everywhere
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree == 1.0


@pytest.mark.parametrize("precision", [1, 2])
def test_streaming_tokens_match_offline_greedy(trained_like, precision):
    cfg, model, params, feats = trained_like
    T = feats.shape[0]
    lens = jnp.array([T], jnp.int32)
    bm = precision_to_binary_mask(precision, cfg.enc_layers)
    _, mask, logits = model.apply({"params": params}, feats[None], lens, bm)
    ids, n = greedy_ctc_decode(logits, jnp.sum(mask, -1), cfg.specials.blank_id)
    offline = np.asarray(ids[0][: int(n[0])]).tolist()
    got = streaming_greedy_decode(cfg, params, feats, precision=precision)
    assert got == offline


def test_streaming_incremental_feed_sizes_equivalent(trained_like):
    """Transcript independent of how the stream is sliced into pushes."""
    cfg, _, params, feats = trained_like
    a = streaming_greedy_decode(cfg, params, feats, feed_frames=7)
    b = streaming_greedy_decode(cfg, params, feats, feed_frames=64)
    assert a == b


def test_session_rejects_non_streamable_config(trained_like):
    cfg, _, params, _ = trained_like
    import dataclasses

    bad = dataclasses.replace(cfg, conv_norm="batch_norm")
    with pytest.raises(ValueError):
        StreamingSession(bad, params)
    bad = dataclasses.replace(cfg, attn_left_chunks=-1)
    with pytest.raises(ValueError):
        StreamingSession(bad, params)
    bad = dataclasses.replace(cfg, causal_conv=False)
    with pytest.raises(ValueError):
        StreamingSession(bad, params)


def test_causal_conv_blocks_future_leak():
    """With causal conv + chunked attention, changing future raw frames
    cannot change past chunk outputs (up to the allowed lookahead)."""
    cfg = _cfg()
    model = ConformerASR.from_config(cfg, deterministic=True)
    key = jax.random.PRNGKey(0)
    T = 64
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.input_dim))
    lens = jnp.array([T], jnp.int32)
    bm = precision_to_binary_mask(2, cfg.enc_layers)
    params = model.init(key, feats, lens, bm)["params"]
    eo1, _, _ = model.apply({"params": params}, feats, lens, bm)
    feats2 = feats.at[:, 48:].set(0.0)
    eo2, _, _ = model.apply({"params": params}, feats2, lens, bm)
    # sub frame j uses raw <= 4j+6 plus attention to end of its chunk:
    # j in chunk c sees sub frames <= (c+1)*CS-1, raw <= 4*((c+1)*CS-1)+6.
    # raw changed from 48 -> chunks c with 4*((c+1)*CS-1)+6 < 48 unaffected:
    # c=1: 4*7+6=34 < 48 ok; c=2: 4*11+6=50 >= 48 may change.
    d = np.abs(np.asarray(eo1 - eo2))[0].max(axis=-1)
    assert d[: 2 * CS].max() < 1e-4


def test_batched_server_matches_sequential_sessions(trained_like):
    """StreamingServer: N concurrent streams, token-for-token identical to
    dedicated B=1 sessions (VERDICT r1 #6)."""
    from onebit_asr_tpu.decode.streaming import (
        StreamingServer,
        streaming_greedy_decode_batch,
    )

    cfg, model, params, feats = trained_like
    rng = np.random.default_rng(3)
    # different lengths, including one shorter than a single window
    lengths = [80, 57, 33, 9]
    recs = [rng.standard_normal((t, cfg.input_dim)).astype(np.float32)
            for t in lengths]

    seq = [streaming_greedy_decode(cfg, params, r, precision=2) for r in recs]
    got = streaming_greedy_decode_batch(
        cfg, params, recs, precision=2, max_streams=3  # forces multiplexing
    )
    assert got == seq


def test_server_interleaved_feeds_and_slot_reuse(trained_like):
    """Incremental interleaved feeding across open slots + reopening a
    freed slot mid-run stays equal to sequential sessions."""
    from onebit_asr_tpu.decode.streaming import StreamingServer

    cfg, model, params, feats = trained_like
    rng = np.random.default_rng(7)
    a = rng.standard_normal((41, cfg.input_dim)).astype(np.float32)
    b = rng.standard_normal((64, cfg.input_dim)).astype(np.float32)
    c = rng.standard_normal((29, cfg.input_dim)).astype(np.float32)
    seq = [streaming_greedy_decode(cfg, params, r, precision=2)
           for r in (a, b, c)]

    server = StreamingServer(cfg, params, precision=2, max_streams=2)
    sa, sb = server.open(), server.open()
    out = {sa: [], sb: [], "c": []}
    # interleave partial feeds
    server.feed(sa, a[:20]); server.feed(sb, b[:30])
    r = server.step()
    for k, v in r.items():
        out[k].extend(v)
    server.feed(sa, a[20:]); server.close(sa)
    server.feed(sb, b[30:])
    while server._open[sa]:
        for k, v in server.step().items():
            out[k].extend(v)
    # slot sa is free now; c reuses it
    sc = server.open()
    server.feed(sc, c); server.close(sc); server.close(sb)
    while server._open[sc] or server._open[sb]:
        for k, v in server.step().items():
            key = "c" if k == sc else k
            out[key].extend(v)
    assert out[sa] == seq[0]
    assert out[sb] == seq[1]
    assert out["c"] == seq[2]
