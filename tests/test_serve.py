"""Serving daemon protocol (cli/serve.py ServeLoop).

The transport-free core: NDJSON requests against a real StreamingServer
(fake CPU device). Pins that (a) the protocol opens/feeds/closes streams
and emits partial/final events with accumulated ids, (b) results are
token-identical to driving StreamingSession directly, (c) bad requests
produce error events without killing the loop.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.cli.serve import ServeLoop
from onebit_asr_tpu.decode.streaming import StreamingServer, StreamingSession
from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask
from onebit_asr_tpu.utils.config import ModelConfig

CS = 4


@pytest.fixture(scope="module")
def served():
    cfg = ModelConfig(
        vocab_size=32, enc_d_model=32, enc_layers=2, enc_heads=2, enc_d_ff=64,
        enc_conv_kernel=7, dec_layers=1, dec_heads=2, dec_d_ff=64,
        dropout=0.0, conv_norm="layer_norm", causal_conv=True,
        attn_chunk_size=CS, attn_left_chunks=1, remat_blocks=False,
    )
    model = ConformerASR.from_config(cfg, deterministic=True)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 64, cfg.input_dim))
    lens = jnp.array([64], jnp.int32)
    bm = precision_to_binary_mask(2, cfg.enc_layers)
    params = model.init(jax.random.PRNGKey(0), feats, lens, bm)["params"]
    return cfg, params


def _drive(loop, utts):
    """Feed each utterance through the protocol; return {tag: final ids}."""
    finals, sids = {}, {}
    events = []
    for tag, f in utts.items():
        (opened,) = loop.handle_line(json.dumps({"op": "open"}))
        assert opened["event"] == "opened"
        sids[opened["sid"]] = tag
        events += loop.handle_line(
            json.dumps({"op": "feed", "sid": opened["sid"],
                        "feats": f.tolist()})
        )
        events += loop.handle_line(
            json.dumps({"op": "close", "sid": opened["sid"]})
        )
    events += loop.pump()
    for e in events:
        if e["event"] == "final":
            finals[sids[e["sid"]]] = e["ids"]
    return finals


def test_protocol_roundtrip_matches_sessions(served):
    cfg, params = served
    rng = np.random.default_rng(0)
    utts = {
        "a": rng.standard_normal((60, cfg.input_dim)).astype(np.float32),
        "b": rng.standard_normal((44, cfg.input_dim)).astype(np.float32),
    }

    server = StreamingServer(cfg, params, precision=2, max_streams=2)
    loop = ServeLoop(server)
    finals = _drive(loop, utts)

    for tag, f in utts.items():
        sess = StreamingSession(cfg, params, precision=2)
        ids = sess.accept(f) + sess.finish()
        assert finals[tag] == ids, tag


def test_protocol_slot_reuse_and_text(served):
    cfg, params = served
    rng = np.random.default_rng(1)
    server = StreamingServer(cfg, params, precision=2, max_streams=1)
    loop = ServeLoop(server, ids_to_text=lambda ids: f"<{len(ids)} ids>")
    for _ in range(2):  # slot must free and reopen
        f = rng.standard_normal((40, cfg.input_dim)).astype(np.float32)
        finals = _drive(loop, {"x": f})
        assert "x" in finals
    # text hook applied
    (opened,) = loop.handle_line(json.dumps({"op": "open"}))
    loop.handle_line(json.dumps(
        {"op": "feed", "sid": opened["sid"],
         "feats": rng.standard_normal((40, cfg.input_dim)).tolist()}))
    loop.handle_line(json.dumps({"op": "close", "sid": opened["sid"]}))
    events = loop.pump()
    assert any("text" in e for e in events)


def test_protocol_error_isolation(served):
    cfg, params = served
    server = StreamingServer(cfg, params, precision=2, max_streams=1)
    loop = ServeLoop(server)
    (bad,) = loop.handle_line("not json")
    assert bad["event"] == "error"
    (bad,) = loop.handle_line(json.dumps({"op": "feed", "sid": 7,
                                          "feats": [[0.0]]}))
    assert bad["event"] == "error"
    (bad,) = loop.handle_line(json.dumps({"op": "nope"}))
    assert bad["event"] == "error"
    # the daemon is still alive and serves correctly afterwards
    (opened,) = loop.handle_line(json.dumps({"op": "open"}))
    assert opened["event"] == "opened"


def test_protocol_from_streaming_artifact(served, tmp_path):
    """The daemon loop drives a StreamingServer reconstructed from an
    exported batched streaming artifact — the --artifact serving mode —
    and emits the same finals as the params-backed server."""
    from onebit_asr_tpu.export import (
        artifact_meta,
        export_streaming,
        save_artifact,
        streaming_server_from_artifact,
    )

    cfg, params = served
    path = str(tmp_path / "srv")
    save_artifact(
        export_streaming(cfg, params, 2, n_streams=2), path,
        artifact_meta(cfg, 2, "streaming", extra={"n_streams": 2}),
    )
    rng = np.random.default_rng(2)
    utts = {
        "a": rng.standard_normal((60, cfg.input_dim)).astype(np.float32),
        "b": rng.standard_normal((44, cfg.input_dim)).astype(np.float32),
    }
    finals_art = _drive(ServeLoop(streaming_server_from_artifact(path)), utts)
    finals_ref = _drive(
        ServeLoop(StreamingServer(cfg, params, precision=2, max_streams=2)),
        utts,
    )
    assert finals_art == finals_ref


def test_feed_flood_backpressure(served):
    """A client flooding `feed` beyond the per-slot buffer bound gets a
    clean error event (BufferOverflow surfaced by ServeLoop's per-request
    isolation); the daemon stays up, other streams are unaffected, and the
    flooded slot keeps decoding what it already buffered."""
    from onebit_asr_tpu.decode.streaming import BufferOverflow

    cfg, params = served
    server = StreamingServer(
        cfg, params, precision=2, max_streams=2, max_buffer_frames=200,
    )
    loop = ServeLoop(server)
    (o1,) = loop.handle_line(json.dumps({"op": "open"}))
    (o2,) = loop.handle_line(json.dumps({"op": "open"}))
    rng = np.random.default_rng(0)
    small = rng.standard_normal((50, cfg.input_dim)).astype(np.float32)

    # direct-API contract: the overflow is typed
    server2 = StreamingServer(
        cfg, params, precision=2, max_streams=1, max_buffer_frames=100,
    )
    s = server2.open()
    server2.feed(s, small)
    with pytest.raises(BufferOverflow):
        server2.feed(s, np.concatenate([small, small]))

    # protocol contract: flood -> error event, loop survives
    out = loop.handle_line(json.dumps(
        {"op": "feed", "sid": o1["sid"], "feats": small.tolist()}
    ))
    assert out == []
    flood = rng.standard_normal((400, cfg.input_dim)).astype(np.float32)
    (err,) = loop.handle_line(json.dumps(
        {"op": "feed", "sid": o1["sid"], "feats": flood.tolist()}
    ))
    assert err["event"] == "error" and "backpressure" in err["error"]

    # the OTHER stream still works end to end
    out = loop.handle_line(json.dumps(
        {"op": "feed", "sid": o2["sid"], "feats": small.tolist()}
    ))
    assert out == []
    loop.handle_line(json.dumps({"op": "close", "sid": o2["sid"]}))
    events = loop.pump()
    assert any(e["event"] == "final" and e["sid"] == o2["sid"]
               for e in events)
    # and the flooded slot is still open and usable within its bound
    loop.handle_line(json.dumps({"op": "close", "sid": o1["sid"]}))
    events = loop.pump()
    assert any(e["event"] == "final" and e["sid"] == o1["sid"]
               for e in events)
