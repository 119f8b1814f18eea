"""Serialized serving artifacts via `jax.export` (StableHLO).

The reference "deploys" by unpickling a torch checkpoint into live Python
(/root/reference/eval.py:220-283) — the model can only run where the full
framework and its exact source tree are importable. The TPU-native
equivalent of TorchScript/ONNX export is `jax.export`: trace the inference
function once, serialize the StableHLO module together with its calling
convention and all weights (as constants), and later `deserialize(...).call`
it anywhere with only `jax` installed — no flax, no this package, no
checkpoint tree. Artifacts are versioned and platform-checked by jax.

Three artifact kinds:

- **offline**: `(feats [B,T,F] f32, feat_lens [B] i32) ->`
  greedy token ids/lens, CTC log-probs, or both — the batch-serving entry.
  The batch dim may be exported symbolically (`batch_size=None`) so one
  artifact serves any B; T stays static (TPU-friendly shapes, and the
  rel-pos table is T-dependent).
- **streaming**: one chunk step of the incremental recognizer,
  `(window [1,W,F], caches [L,1,C,D], cache_valid i32, cur_valid i32) ->
  (logits [1,cs,V], new caches)` — the state-carrying serving hot path
  (decode/streaming.py drives exactly this signature).
- **packed**: the offline forward over planar-packed 2-bit weights
  (Pallas ternary matmul). The Pallas call lowers to a `tpu_custom_call`,
  so this artifact is TPU-only and deserialization must opt in to the
  custom call (`load_artifact` does).

Every artifact is a directory: `module.jexp` (serialized Exported bytes)
plus `meta.json` (architecture/precision/shape/special-token metadata the
caller needs to featurize inputs and detokenize outputs).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from onebit_asr_tpu.utils.config import ModelConfig

FORMAT_VERSION = 1
_MODULE_FILE = "module.jexp"
_META_FILE = "meta.json"


# --------------------------------------------------------------------- build


def build_offline_forward(
    cfg: ModelConfig,
    params: Any,
    precision: int,
    *,
    packed: bool = False,
    emit: str = "greedy",
    beam_size: int = 10,
    beam_top_k: int = 20,
    lm=None,
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
):
    """The inference function to export: params are CLOSED OVER (they become
    constants inside the StableHLO module — the artifact is self-contained).

    emit: "greedy" -> (ids [B,T'], lens [B]);
          "logprobs" -> (log_probs [B,T',V], enc_lens [B]) for downstream
          beam/LM fusion; "both" -> all four;
          "beam" -> (ids [B,T'], lens [B]) via the on-device prefix beam
          search (decode/beam_device.py), with an optional n-gram DeviceLM
          (decode/lm_device.py) whose packed tables bake into the artifact —
          shallow fusion ships INSIDE the serialized module.
    """
    if emit not in ("greedy", "logprobs", "both", "beam"):
        raise ValueError(
            f"emit must be greedy|logprobs|both|beam, got {emit!r}")
    from onebit_asr_tpu.decode.greedy import greedy_ctc_decode
    from onebit_asr_tpu.model.asr import ConformerASR, precision_to_binary_mask

    model = ConformerASR.from_config(cfg, deterministic=True, packed=packed)
    if packed:
        from onebit_asr_tpu.model.packed import export_packed_params

        params = export_packed_params(params, precision)
    bm = precision_to_binary_mask(precision, cfg.enc_layers)
    blank_id = cfg.specials.blank_id

    def forward(feats: jnp.ndarray, feat_lens: jnp.ndarray):
        _, enc_mask, logits_ctc = model.apply(
            {"params": params}, feats, feat_lens, bm
        )
        enc_lens = jnp.sum(enc_mask, axis=-1)
        log_probs = jax.nn.log_softmax(logits_ctc.astype(jnp.float32), axis=-1)
        if emit == "logprobs":
            return log_probs, enc_lens
        if emit == "beam":
            from onebit_asr_tpu.decode.beam_device import beam_search_device

            return beam_search_device(
                log_probs, enc_lens, blank_id=blank_id, beam_size=beam_size,
                top_k=beam_top_k, max_len=int(log_probs.shape[1]),
                lm=lm, lm_weight=lm_weight, length_bonus=length_bonus,
            )
        ids, lens = greedy_ctc_decode(log_probs, enc_lens, blank_id)
        if emit == "greedy":
            return ids, lens
        return ids, lens, log_probs, enc_lens

    return forward


def build_streaming_step(cfg: ModelConfig, params: Any, precision: int):
    """One chunk step with weights closed over; same math as
    decode/streaming.py's `_cached_step_fn` (which keeps params as
    arguments for cross-session sharing — an export must bake them in)."""
    from onebit_asr_tpu.model.asr import precision_to_binary_mask
    from onebit_asr_tpu.model.layers import Dense
    from onebit_asr_tpu.model.streaming import StreamingEncoderStep

    step_mod = StreamingEncoderStep(
        d_model=cfg.enc_d_model,
        num_layers=cfg.enc_layers,
        num_heads=cfg.enc_heads,
        d_ff=cfg.enc_d_ff,
        conv_kernel=cfg.enc_conv_kernel,
        chunk_size=int(cfg.attn_chunk_size),
        left_chunks=cfg.attn_left_chunks,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        per_channel=cfg.quant_per_channel,
    )
    head = Dense(cfg.vocab_size, compute_dtype=jnp.dtype(cfg.compute_dtype))
    enc_params = {"params": params["encoder"]}
    head_params = {"params": params["ctc_head"]}
    bm = precision_to_binary_mask(precision, cfg.enc_layers)

    def step(window, caches, cache_valid, cur_valid):
        enc, new_caches = step_mod.apply(
            enc_params, window, caches, cache_valid, cur_valid, bm
        )
        logits = head.apply(head_params, enc).astype(jnp.float32)
        return logits, new_caches

    return step


def build_streaming_batch_step(
    cfg: ModelConfig, params: Any, precision: int, n_streams: int
):
    """The MULTIPLEXED chunk step with weights closed over — the
    StreamingServer contract (decode/streaming.py `_cached_batched_step_fn`):
    (windows [N,W,F], caches [L,N,C,D], cache_valids [N], cur_valids [N],
    active [N] bool) -> (logits [N,cs,V] f32, new caches). Inactive slots'
    caches pass through bit-identically."""
    single = build_streaming_step(cfg, params, precision)

    def step(windows, caches, cache_valids, cur_valids, active):
        def one(window, cache, cv, nv):
            logits, new_cache = single(window[None], cache[:, None], cv, nv)
            return logits[0], new_cache[:, 0]

        logits, new_caches = jax.vmap(
            one, in_axes=(0, 1, 0, 0), out_axes=(0, 1)
        )(windows, caches, cache_valids, cur_valids)
        keep = active[None, :, None, None]
        new_caches = jnp.where(keep, new_caches, caches)
        return logits, new_caches

    return step


# -------------------------------------------------------------------- export


def export_offline(
    cfg: ModelConfig,
    params: Any,
    precision: int,
    num_frames: int,
    batch_size: Optional[int] = 8,
    *,
    packed: bool = False,
    emit: str = "greedy",
    platforms: Optional[Tuple[str, ...]] = None,
    **decode_kwargs,
) -> "jax.export.Exported":
    """Trace + export the offline forward. batch_size=None exports a
    symbolic batch dimension (one artifact, any B; the Pallas packed path
    needs concrete shapes, so packed requires a static batch).
    decode_kwargs (beam_size, beam_top_k, lm, lm_weight, length_bonus)
    configure emit="beam"."""
    fn = build_offline_forward(cfg, params, precision, packed=packed,
                               emit=emit, **decode_kwargs)
    if batch_size is None:
        if packed:
            raise ValueError("packed export needs a static batch_size "
                             "(Pallas grids are shape-specialized)")
        (b,) = jax.export.symbolic_shape("b")
        feats = jax.ShapeDtypeStruct((b, num_frames, cfg.input_dim), jnp.float32)
        lens = jax.ShapeDtypeStruct((b,), jnp.int32)
    else:
        feats = jax.ShapeDtypeStruct(
            (batch_size, num_frames, cfg.input_dim), jnp.float32
        )
        lens = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jax.export.export(jax.jit(fn), **kwargs)(feats, lens)


def export_streaming(
    cfg: ModelConfig,
    params: Any,
    precision: int,
    *,
    n_streams: int = 1,
    platforms: Optional[Tuple[str, ...]] = None,
) -> "jax.export.Exported":
    """Trace + export one streaming chunk step (the host loop in
    decode/streaming.py documents the windowing/valid-count protocol).

    n_streams == 1: the single-session step (window, caches, cache_valid,
    cur_valid). n_streams > 1: the StreamingServer's multiplexed step
    (windows [N,...], per-slot valid counts, active mask) — serve N
    concurrent streams from the artifact alone."""
    from onebit_asr_tpu.model.streaming import (
        raw_window_size,
        streaming_cache_chunks,
    )

    if cfg.attn_chunk_size is None:
        raise ValueError("streaming export needs cfg.attn_chunk_size")
    cs = int(cfg.attn_chunk_size)
    W = raw_window_size(cs)
    C = streaming_cache_chunks(cfg.enc_conv_kernel, cs, cfg.attn_left_chunks) * cs
    dt = jnp.dtype(cfg.compute_dtype)
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    if n_streams == 1:
        fn = build_streaming_step(cfg, params, precision)
        args = (
            jax.ShapeDtypeStruct((1, W, cfg.input_dim), jnp.float32),
            jax.ShapeDtypeStruct((cfg.enc_layers, 1, C, cfg.enc_d_model), dt),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
    else:
        N = int(n_streams)
        fn = build_streaming_batch_step(cfg, params, precision, N)
        args = (
            jax.ShapeDtypeStruct((N, W, cfg.input_dim), jnp.float32),
            jax.ShapeDtypeStruct((cfg.enc_layers, N, C, cfg.enc_d_model), dt),
            jax.ShapeDtypeStruct((N,), jnp.int32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
            jax.ShapeDtypeStruct((N,), jnp.bool_),
        )
    return jax.export.export(jax.jit(fn), **kwargs)(*args)


# ---------------------------------------------------------------- save/load


def artifact_meta(
    cfg: ModelConfig, precision: int, kind: str, emit: str = "greedy",
    packed: bool = False, extra: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": kind,  # offline | streaming
        "emit": emit,
        "precision": precision,
        "packed": packed,
        "model": dataclasses.asdict(cfg),
        "specials": dataclasses.asdict(cfg.specials),
    }
    if extra:
        meta.update(extra)
    return meta


def save_artifact(exported: "jax.export.Exported", path: str,
                  meta: Dict[str, Any]) -> None:
    """Write the artifact directory: module.jexp + meta.json."""
    os.makedirs(path, exist_ok=True)
    data = exported.serialize()
    with open(os.path.join(path, _MODULE_FILE), "wb") as f:
        f.write(data)
    meta = dict(meta)
    meta["platforms"] = list(exported.platforms)
    meta["in_avals"] = [str(a) for a in exported.in_avals]
    meta["out_avals"] = [str(a) for a in exported.out_avals]
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_artifact(path: str):
    """-> (callable, meta). The callable is `Exported.call`: jit-traceable,
    runs under the current backend (platform-checked by jax). Needs only
    jax at load time. Pallas-bearing artifacts carry a `tpu_custom_call`,
    which deserialization accepts (the call still only runs on TPU)."""
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    with open(os.path.join(path, _MODULE_FILE), "rb") as f:
        data = f.read()
    exported = jax.export.deserialize(bytearray(data))
    return exported.call, meta


def greedy_ids_to_lists(ids: np.ndarray, lens: np.ndarray):
    """[B,T'] padded id matrix + [B] lens -> list of python id lists."""
    ids, lens = np.asarray(ids), np.asarray(lens)
    return [list(map(int, ids[b, : lens[b]])) for b in range(len(lens))]


# ----------------------------------------------- artifact-backed runtimes


def streaming_session_from_artifact(path: str, **session_kwargs):
    """A StreamingSession whose chunk step IS a deserialized artifact —
    the serving host needs the artifact directory, not params/checkpoints.
    Requires an `export_streaming(..., n_streams=1)` artifact."""
    from onebit_asr_tpu.decode.streaming import StreamingSession
    from onebit_asr_tpu.utils.config import model_config_from_dict

    fn, meta = load_artifact(path)
    if meta["kind"] != "streaming" or meta.get("n_streams", 1) != 1:
        raise ValueError(f"{path} is not a single-stream streaming artifact")
    cfg = model_config_from_dict(meta["model"])
    return StreamingSession(cfg, step_fn=fn, **session_kwargs)


def streaming_server_from_artifact(path: str, **server_kwargs):
    """A StreamingServer multiplexing N streams through a deserialized
    batched artifact (`export_streaming(..., n_streams=N)`); max_streams is
    fixed to the artifact's N."""
    from onebit_asr_tpu.decode.streaming import StreamingServer
    from onebit_asr_tpu.utils.config import model_config_from_dict

    fn, meta = load_artifact(path)
    n = int(meta.get("n_streams", 1))
    if meta["kind"] != "streaming" or n < 2:
        raise ValueError(f"{path} is not a batched streaming artifact")
    cfg = model_config_from_dict(meta["model"])
    return StreamingServer(cfg, max_streams=n, batch_step_fn=fn,
                           **server_kwargs)
