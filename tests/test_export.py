"""StableHLO export artifacts: round-trip parity with the live model.

Every test serializes with `Exported.serialize()` → bytes → deserialize —
i.e. the artifact really is self-contained (weights are constants inside
the module); nothing depends on the flax param tree after export.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.export import (
    artifact_meta,
    build_offline_forward,
    build_streaming_step,
    export_offline,
    export_streaming,
    greedy_ids_to_lists,
    load_artifact,
    save_artifact,
)
from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.utils.config import ModelConfig

TINY = ModelConfig(
    input_dim=16,
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
)

TINY_STREAM = dataclasses.replace(
    TINY, causal_conv=True, conv_norm="layer_norm",
    attn_chunk_size=4, attn_left_chunks=1,
)


def _init_params(cfg, seed=0):
    model = ConformerASR.from_config(cfg, deterministic=True)
    feats = jnp.zeros((1, 32, cfg.input_dim), jnp.float32)
    lens = jnp.full((1,), 32, jnp.int32)
    bm = precision_to_binary_mask(2, cfg.enc_layers)
    return model.init(jax.random.PRNGKey(seed), feats, lens, bm)["params"]


def _batch(cfg, B=3, T=40, seed=1):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((B, T, cfg.input_dim)), jnp.float32)
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    return feats, lens


def test_offline_roundtrip_matches_live(tmp_path):
    params = _init_params(TINY)
    feats, lens = _batch(TINY, B=3, T=40)
    live = build_offline_forward(TINY, params, 2, emit="both")
    ids_l, lens_l, lp_l, el_l = jax.jit(live)(feats, lens)

    exported = export_offline(TINY, params, 2, num_frames=40, batch_size=3,
                              emit="both")
    path = str(tmp_path / "art")
    save_artifact(exported, path, artifact_meta(TINY, 2, "offline", "both"))
    fn, meta = load_artifact(path)
    ids_a, lens_a, lp_a, el_a = fn(feats, lens)

    np.testing.assert_array_equal(np.asarray(ids_l), np.asarray(ids_a))
    np.testing.assert_array_equal(np.asarray(lens_l), np.asarray(lens_a))
    np.testing.assert_array_equal(np.asarray(el_l), np.asarray(el_a))
    np.testing.assert_allclose(
        np.asarray(lp_l), np.asarray(lp_a), rtol=0, atol=1e-6
    )
    assert meta["kind"] == "offline" and meta["precision"] == 2
    assert meta["model"]["enc_d_model"] == TINY.enc_d_model


def test_offline_symbolic_batch_serves_any_B(tmp_path):
    params = _init_params(TINY)
    exported = export_offline(TINY, params, 1, num_frames=40, batch_size=None,
                              emit="greedy")
    path = str(tmp_path / "art")
    save_artifact(exported, path, artifact_meta(TINY, 1, "offline"))
    fn, _ = load_artifact(path)
    live = jax.jit(build_offline_forward(TINY, params, 1, emit="greedy"))
    for B in (1, 2, 5):
        feats, lens = _batch(TINY, B=B, T=40, seed=B)
        ids_a, lens_a = fn(feats, lens)
        ids_l, lens_l = live(feats, lens)
        assert ids_a.shape[0] == B
        np.testing.assert_array_equal(np.asarray(ids_l), np.asarray(ids_a))
        np.testing.assert_array_equal(np.asarray(lens_l), np.asarray(lens_a))


def test_offline_precisions_differ():
    """1-bit and 2-bit artifacts bake in different projected weights."""
    params = _init_params(TINY)
    feats, lens = _batch(TINY, B=2, T=40)
    lp1 = jax.jit(build_offline_forward(TINY, params, 1, emit="logprobs"))
    lp2 = jax.jit(build_offline_forward(TINY, params, 2, emit="logprobs"))
    a, _ = lp1(feats, lens)
    b, _ = lp2(feats, lens)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_streaming_step_roundtrip(tmp_path):
    from onebit_asr_tpu.model.streaming import (
        raw_window_size,
        streaming_cache_chunks,
    )

    cfg = TINY_STREAM
    params = _init_params(cfg)
    exported = export_streaming(cfg, params, 2)
    path = str(tmp_path / "art")
    save_artifact(exported, path, artifact_meta(cfg, 2, "streaming"))
    fn, meta = load_artifact(path)

    cs = int(cfg.attn_chunk_size)
    W = raw_window_size(cs)
    C = streaming_cache_chunks(cfg.enc_conv_kernel, cs, cfg.attn_left_chunks) * cs
    live = jax.jit(build_streaming_step(cfg, params, 2))
    rng = np.random.default_rng(0)
    caches_a = jnp.zeros((cfg.enc_layers, 1, C, cfg.enc_d_model), jnp.bfloat16)
    caches_l = caches_a
    cache_valid = jnp.int32(0)
    # two consecutive chunk steps: logits AND carried caches must match
    for step in range(2):
        window = jnp.asarray(
            rng.standard_normal((1, W, cfg.input_dim)), jnp.float32
        )
        logits_a, caches_a = fn(window, caches_a, cache_valid, jnp.int32(cs))
        logits_l, caches_l = live(window, caches_l, cache_valid, jnp.int32(cs))
        np.testing.assert_allclose(
            np.asarray(logits_l), np.asarray(logits_a), rtol=0, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(caches_l, np.float32), np.asarray(caches_a, np.float32)
        )
        cache_valid = jnp.int32(min(int(cache_valid) + cs, C))
    assert meta["kind"] == "streaming"


def test_packed_offline_export_interpret_mode(tmp_path):
    """Packed (Pallas ternary matmul) export — interpret mode on CPU; the
    same builder produces the TPU custom-call artifact on a TPU backend
    (scripts/check_kernels_onchip.py covers that half)."""
    params = _init_params(TINY)
    feats, lens = _batch(TINY, B=2, T=40)
    # parity target: the live PACKED forward (same math as the artifact);
    # packed vs fake-quant parity on trained weights is covered by
    # tests/test_packed_inference.py
    live_packed = jax.jit(
        build_offline_forward(TINY, params, 2, packed=True, emit="greedy"))
    exported = export_offline(TINY, params, 2, num_frames=40, batch_size=2,
                              packed=True, emit="greedy")
    path = str(tmp_path / "art")
    save_artifact(exported, path,
                  artifact_meta(TINY, 2, "offline", packed=True))
    fn, meta = load_artifact(path)
    ids_a, lens_a = fn(feats, lens)
    ids_l, lens_l = live_packed(feats, lens)
    np.testing.assert_array_equal(np.asarray(ids_l), np.asarray(ids_a))
    np.testing.assert_array_equal(np.asarray(lens_l), np.asarray(lens_a))
    assert meta["packed"] is True


def test_beam_export_with_baked_lm(tmp_path):
    """emit='beam': the on-device prefix beam search — and the packed
    n-gram LM tables for shallow fusion — serialize INTO the artifact."""
    from onebit_asr_tpu.decode.lm import NGramLM
    from onebit_asr_tpu.decode.lm_device import DeviceLM

    params = _init_params(TINY)
    feats, lens = _batch(TINY, B=2, T=40)
    lm = DeviceLM.pack(NGramLM(order=2).fit([[4, 5, 6], [4, 5, 7], [4, 5]]))
    kw = dict(beam_size=4, lm=lm, lm_weight=0.3, length_bonus=0.1)
    live = jax.jit(build_offline_forward(TINY, params, 2, emit="beam", **kw))
    ids_l, lens_l = live(feats, lens)

    exported = export_offline(TINY, params, 2, num_frames=40, batch_size=2,
                              emit="beam", **kw)
    path = str(tmp_path / "art")
    save_artifact(exported, path, artifact_meta(TINY, 2, "offline", "beam"))
    fn, _ = load_artifact(path)
    ids_a, lens_a = fn(feats, lens)
    np.testing.assert_array_equal(np.asarray(ids_l), np.asarray(ids_a))
    np.testing.assert_array_equal(np.asarray(lens_l), np.asarray(lens_a))
    # no-LM beam artifact must differ in configuration, not crash
    exported2 = export_offline(TINY, params, 2, num_frames=40, batch_size=2,
                               emit="beam", beam_size=4)
    live2 = jax.jit(build_offline_forward(TINY, params, 2, emit="beam",
                                          beam_size=4))
    ids2_l, lens2_l = live2(feats, lens)
    ids2_a, lens2_a = exported2.call(feats, lens)
    np.testing.assert_array_equal(np.asarray(ids2_l), np.asarray(ids2_a))
    np.testing.assert_array_equal(np.asarray(lens2_l), np.asarray(lens2_a))


def test_streaming_artifact_backed_runtimes(tmp_path):
    """StreamingSession/StreamingServer running from deserialized artifacts
    (no params on the serving host) emit token-for-token what the
    params-backed runtimes emit."""
    from onebit_asr_tpu.decode.streaming import (
        StreamingServer,
        StreamingSession,
        streaming_greedy_decode,
    )
    from onebit_asr_tpu.export import (
        export_streaming,
        streaming_server_from_artifact,
        streaming_session_from_artifact,
    )

    cfg = TINY_STREAM
    params = _init_params(cfg)
    rng = np.random.default_rng(7)
    recs = [
        rng.standard_normal((90, cfg.input_dim)).astype(np.float32),
        rng.standard_normal((55, cfg.input_dim)).astype(np.float32),
    ]

    # single-stream artifact == params session
    p1 = str(tmp_path / "s1")
    save_artifact(export_streaming(cfg, params, 2, n_streams=1), p1,
                  artifact_meta(cfg, 2, "streaming", extra={"n_streams": 1}))
    ref0 = streaming_greedy_decode(cfg, params, recs[0], precision=2)
    sess = streaming_session_from_artifact(p1)
    got0 = sess.accept(recs[0]) + sess.finish()
    assert got0 == ref0

    # batched artifact == params server, multiplexed
    p2 = str(tmp_path / "s2")
    save_artifact(export_streaming(cfg, params, 2, n_streams=2), p2,
                  artifact_meta(cfg, 2, "streaming", extra={"n_streams": 2}))
    server = streaming_server_from_artifact(p2)
    assert server.n == 2
    ref_server = StreamingServer(cfg, params, precision=2, max_streams=2)

    def drain(srv):
        outs = {}
        sids = []
        for r in recs:
            sid = srv.open()
            srv.feed(sid, r)
            srv.close(sid)
            sids.append(sid)
            outs[sid] = []
        while srv.pending():
            for sid, toks in srv.step().items():
                outs[sid].extend(toks)
        return [outs[sid] for sid in sids]

    np.testing.assert_equal(drain(server), drain(ref_server))

    # mismatched constructors reject each other's artifacts
    with pytest.raises(ValueError, match="single-stream"):
        streaming_session_from_artifact(p2)
    with pytest.raises(ValueError, match="batched"):
        streaming_server_from_artifact(p1)


def test_symbolic_batch_rejects_packed():
    params = _init_params(TINY)
    with pytest.raises(ValueError, match="static batch"):
        export_offline(TINY, params, 2, num_frames=40, batch_size=None,
                       packed=True)


def test_greedy_ids_to_lists():
    ids = np.array([[5, 6, -1, -1], [7, -1, -1, -1]])
    lens = np.array([2, 1])
    assert greedy_ids_to_lists(ids, lens) == [[5, 6], [7]]
