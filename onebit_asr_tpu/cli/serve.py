"""Streaming ASR serving daemon: NDJSON protocol over stdio or TCP.

The production serving entry point on top of `decode.streaming
.StreamingServer` (N concurrent streams multiplexed through ONE jitted
batched chunk step — the reference has no serving runtime at all; its
eval.py is batch-offline only, /root/reference/eval.py). One process owns
the device; clients multiplex over a line protocol:

    -> {"op": "open"}                                 <- {"event":"opened","sid":0}
    -> {"op": "feed", "sid": 0, "feats": [[...80],..]} (feature frames)
    -> {"op": "feed_wav", "sid": 0, "path": "a.wav"}   (whole-file helper)
    -> {"op": "close", "sid": 0}
    <- {"event": "partial", "sid": 0, "ids": [...], "text": "..."}   (per step)
    <- {"event": "final",   "sid": 0, "ids": [...], "text": "..."}   (slot freed)

Every response is one JSON line. `text` appears when a tokenizer is found
next to the checkpoint's data_dir (ids otherwise). The checkpoint must be
streaming-trained (`--attn_chunk_size`, causal conv) — the same constraint
as `eval --streaming`, enforced by StreamingSession's validation.

Run:  python -m onebit_asr_tpu.serve --checkpoint runs/stream --port 7600
      (or --port 0 to speak the protocol on stdin/stdout)
"""

from __future__ import annotations

import json
import os
import sys


def build_argparser():
    import argparse

    p = argparse.ArgumentParser(
        prog="onebit-asr-serve",
        description="multiplexed streaming ASR daemon (NDJSON over "
        "stdio/TCP)",
    )
    p.add_argument("--checkpoint", type=str, default="",
                   help="run dir (config.json + ckpt/), streaming-trained")
    p.add_argument("--artifact", type=str, default="",
                   help="serve from an exported batched streaming artifact "
                        "(cli.export streaming --n_streams N) instead of a "
                        "checkpoint — no params restore, weights live "
                        "inside the artifact; overrides --max_streams/"
                        "--precision with the artifact's")
    p.add_argument("--precision", type=int, default=2, choices=(32, 2, 1))
    p.add_argument("--max_streams", type=int, default=8,
                   help="concurrent stream slots (one batched step serves "
                        "all ready slots)")
    p.add_argument("--port", type=int, default=0,
                   help="TCP port to listen on (localhost); 0 = stdio")
    p.add_argument("--data_dir", type=str, default="",
                   help="tokenizer location override (default: the "
                        "checkpoint's data_dir)")
    return p


class ServeLoop:
    """Protocol core, transport-free (tested without sockets).

    `handle_line(line) -> [response dicts]` processes one request;
    `pump() -> [response dicts]` advances the device while any slot has a
    full window buffered. The caller interleaves them however its
    transport delivers lines.
    """

    def __init__(self, server, ids_to_text=None):
        self.server = server
        self.ids_to_text = ids_to_text
        self._tokens = {}  # sid -> accumulated ids

    def _emit(self, event, sid, new_ids):
        self._tokens.setdefault(sid, []).extend(new_ids)
        out = {"event": event, "sid": sid, "ids": list(self._tokens[sid])}
        if self.ids_to_text is not None:
            out["text"] = self.ids_to_text(self._tokens[sid])
        if event == "final":
            self._tokens.pop(sid, None)
        return out

    def handle_line(self, line):
        try:
            req = json.loads(line)
            op = req["op"]
        except Exception as e:
            return [{"event": "error", "error": f"bad request: {e}"}]
        try:
            if op == "open":
                sid = self.server.open()
                return [{"event": "opened", "sid": sid}]
            if op == "feed":
                import numpy as np

                self.server.feed(
                    req["sid"], np.asarray(req["feats"], np.float32)
                )
                return []
            if op == "feed_wav":
                self.server.feed(req["sid"], self._featurize(req["path"]))
                return []
            if op == "close":
                self.server.close(req["sid"])
                return []
            if op == "ping":
                return [{"event": "pong"}]
            return [{"event": "error", "error": f"unknown op {op!r}"}]
        except Exception as e:  # per-request isolation: daemon stays up
            return [{"event": "error", "error": str(e), "op": op}]

    def _featurize(self, path):
        raise NotImplementedError  # installed by main() (needs frontend)

    def pump(self):
        """Advance the device while any slot is ready; emit partials, and
        finals for slots that freed."""
        out = []
        while self.server.pending():
            open_before = list(self.server._open)
            results = self.server.step()
            for sid, ids in results.items():
                freed = open_before[sid] and not self.server._open[sid]
                out.append(self._emit("final" if freed else "partial",
                                      sid, ids))
        return out


def main(argv=None) -> int:
    from onebit_asr_tpu.utils.platform import (
        respect_jax_platforms_env,
        set_default_prng_impl,
    )

    respect_jax_platforms_env()
    set_default_prng_impl()
    from onebit_asr_tpu.utils.platform import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    args = build_argparser().parse_args(argv)

    import jax
    import numpy as np

    from onebit_asr_tpu.decode.streaming import StreamingServer
    from onebit_asr_tpu.model.asr import ConformerASR
    from onebit_asr_tpu.train import create_train_state, make_optimizer
    from onebit_asr_tpu.utils.checkpoint import (
        CheckpointManager,
        abstract_like,
        load_config,
    )

    if bool(args.artifact) == bool(args.checkpoint):
        print("need exactly one of --checkpoint / --artifact",
              file=sys.stderr)
        return 2
    if args.artifact:
        from onebit_asr_tpu.export import streaming_server_from_artifact
        from onebit_asr_tpu.utils.config import (
            FrontendConfig,
            TrainConfig,
        )

        server = streaming_server_from_artifact(args.artifact)
        model_cfg = server.cfg
        specials = model_cfg.specials
        # frontend defaults for the feed_wav helper; no checkpoint config
        cfg = TrainConfig(model=model_cfg, frontend=FrontendConfig())
        print(f"serving artifact {args.artifact} "
              f"({server.n} stream slots)", file=sys.stderr)
    else:
        cfg = load_config(args.checkpoint)
        if cfg is None:
            print(f"no config.json in {args.checkpoint}", file=sys.stderr)
            return 2
        model_cfg = cfg.model
        specials = model_cfg.specials

        # restore (same skeleton dance as eval/transcribe)
        model = ConformerASR.from_config(model_cfg, deterministic=True)
        F = model_cfg.input_dim
        sample = {
            "feats": np.zeros((1, 32, F), np.float32),
            "feat_lens": np.full((1,), 32, np.int32),
            "tokens": np.zeros((1, 4), np.int32),
            "token_lens": np.ones((1,), np.int32),
        }
        optimizer = make_optimizer(cfg.optim, total_steps=1)
        state = create_train_state(
            model, optimizer, jax.random.PRNGKey(0), sample,
            model_cfg.enc_layers,
        )
        ckpt = CheckpointManager(os.path.join(args.checkpoint, "ckpt"))
        state = ckpt.restore(abstract_like(state))
        print(f"restored step {int(state.step)}", file=sys.stderr)

        server = StreamingServer(
            model_cfg, state.params, precision=args.precision,
            max_streams=args.max_streams,
        )

    ids_to_text = None
    data_dir = args.data_dir or cfg.data.data_dir
    if data_dir and os.path.isdir(data_dir):
        try:
            from onebit_asr_tpu.data.text import AsrTokenizer

            tok = AsrTokenizer.find_and_load(data_dir, specials)
            ids_to_text = tok.ids_to_text
        except Exception as e:
            print(f"no tokenizer ({e}); emitting ids only", file=sys.stderr)

    loop = ServeLoop(server, ids_to_text)

    # whole-file helper: frontend + CMVN, like transcribe
    from onebit_asr_tpu.ops.frontend import LogMelFrontend, apply_cmvn

    frontend = LogMelFrontend(cfg.frontend)
    cmvn = None
    if data_dir:
        cmvn_path = os.path.join(data_dir, "cmvn_stats.npz")
        if os.path.exists(cmvn_path):
            stats = np.load(cmvn_path)
            cmvn = (
                np.asarray(stats["mean"], np.float32),
                np.asarray(stats["std"], np.float32),
            )

    def featurize(path):
        from onebit_asr_tpu.cli.prepare import _read_wav

        wav = _read_wav(path)
        feats, lens = frontend(
            np.asarray(wav, np.float32)[None],
            np.array([len(wav)], np.int32),
        )
        f = np.asarray(feats[0][: int(lens[0])])
        if cmvn is not None:
            f = np.asarray(apply_cmvn(f[None], cmvn[0], cmvn[1]))[0]
        return f

    loop._featurize = featurize

    def session(rfile, wfile):
        def send(objs):
            for o in objs:
                wfile.write(json.dumps(o) + "\n")
            wfile.flush()

        for line in rfile:
            line = line.strip()
            if not line:
                continue
            send(loop.handle_line(line))
            send(loop.pump())

    if args.port:
        import socketserver

        outer = loop

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                import io

                session(
                    io.TextIOWrapper(self.rfile, "utf-8"),
                    io.TextIOWrapper(self.wfile, "utf-8"),
                )

        with socketserver.ThreadingTCPServer(
            ("127.0.0.1", args.port), Handler
        ) as srv:
            print(f"serving on 127.0.0.1:{args.port} "
                  f"({args.max_streams} stream slots)", file=sys.stderr)
            srv.serve_forever()
    else:
        session(sys.stdin, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
