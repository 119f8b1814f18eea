"""Single source of truth for configuration.

The reference scatters configuration across argparse defaults
(onebit_asr/train.py:186-211), hardcoded magic numbers (token offset 4 /
blank 3 at eval.py:126-148, data dir "data" at src/data/dataset.py:78), and a
config.json written per run (train.py:272-280).  Here every knob lives in one
serializable dataclass tree; checkpoints embed the config; CLIs only override
fields.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class SpecialTokens:
    """Model-side token id scheme.

    Mirrors the reference's convention of reserving 4 ids in front of the
    sentencepiece vocabulary and shifting all SPM ids by +4
    (onebit_asr/dataloader_stub.py:199-207).
    """

    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    blank_id: int = 3
    offset: int = 4  # spm id -> model id shift

    def as_dict(self) -> Dict[str, int]:
        return {
            "pad_id": self.pad_id,
            "bos_id": self.bos_id,
            "eos_id": self.eos_id,
            "blank_id": self.blank_id,
        }


@dataclass(frozen=True)
class FrontendConfig:
    """Kaldi-compatible log-mel fbank (reference: src/data/dataset.py:124-131)."""

    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemphasis: float = 0.97
    low_freq: float = 20.0
    high_freq: float = 0.0  # 0 -> nyquist
    dither: float = 0.0
    remove_dc: bool = True
    window: str = "povey"
    # SpecAugment (reference defaults: src/data/dataset.py:55-60)
    spec_augment: bool = True
    freq_mask_param: int = 27
    num_freq_masks: int = 2
    time_mask_param: int = 100
    num_time_masks: int = 2
    time_mask_ratio: float = 0.3  # cap each time mask at ratio * true length
    # (SpecAugment's "p"); the reference has no cap (= 1.0), which can blank
    # entire short utterances — the root cause of a gradient-overflow NaN
    # (see ops/specaugment.py docstring); 1.0 restores reference behavior


@dataclass(frozen=True)
class ModelConfig:
    """Conformer CTC+attention model (reference defaults: train.py:194-203)."""

    input_dim: int = 80
    vocab_size: int = 5004  # spm 5000 + 4 specials (dataloader_stub.py:201)
    enc_d_model: int = 256
    enc_layers: int = 12
    enc_heads: int = 4
    enc_d_ff: int = 1024
    enc_conv_kernel: int = 31
    dropout: float = 0.1
    dec_layers: int = 2
    dec_heads: int = 4
    dec_d_ff: int = 1024
    specials: SpecialTokens = field(default_factory=SpecialTokens)
    # TPU knobs (no reference counterpart):
    compute_dtype: str = "bfloat16"  # activations/matmuls; params stay f32
    remat_blocks: bool = True  # rematerialize conformer blocks to bound HBM
    remat_policy: str = "attn_ffn"  # what remat saves across conformer blocks:
    # "masks": recompute all activations but keep the uint8 dropout
    #   draws — regeneration is PRNG-throughput-bound on v5e
    #   (~3 Gwords/s measured) while reloading masks rides HBM; measured
    #   +9% step throughput over "full" at ~1 byte/activation live memory.
    # "full": save nothing — minimum memory (Conformer-L at batch 64).
    # "attn": "masks" + the softmax prob tensors (skip recomputing
    #   the [T,T]-wide score chain; ~2 B*H*T*T bytes/layer/branch extra).
    #   Lost to "masks" at the unaligned T'=255 (edge-masked prob tiles);
    #   wins once time_pad_multiple lane-aligns T' (217.0 -> 223.9 utt/s on
    #   the bench of record at T'=256).
    # "attn_ffn" (default): "attn" + the macaron FF hidden pre-activations —
    #   the backward also skips the two d->d_ff matmul recomputes per block
    #   (230.8 -> 233.3 utt/s on the bench of record, round 3). Extra live
    #   memory vs "attn": ~B*T*d_ff*2 bytes x2 FF per layer per branch —
    #   prefer "attn"/"masks"/"full" when memory-tight (Conformer-L B>=32).
    # "fused": "masks" + the fused attention kernel's [B,H,T,dh] output —
    #   the pairing for fused_attention=True (backward goes straight to
    #   the kernel's flash-style VJP, no forward-kernel recompute).
    # "dots": save matmul outputs (measured slower than "full" on v5e: the
    #   saved [B,H,T,T] score matmuls cost more HBM traffic than recompute).
    conv_norm: str = "batch_norm"  # "group_norm" (per-sample masked stats:
    # no cross-batch reduction under data parallelism) or "layer_norm"
    # (per-frame; required for streaming)
    quant_per_channel: bool = False  # per-output-channel alpha (reference is
    # tensor-wise); QAT path only, packed export requires tensor-wise
    reference_decoder: bool = False  # reference-exact decoder semantics:
    # position-blind embeddings + post-LN stock-torch layer structure —
    # undoes the two documented decoder deviations
    # (docs/REFERENCE_HEAD_TO_HEAD.md §3) for controlled head-to-head
    # runs; pair with LossConfig.reference_smoothing
    quant_decoder: bool = False  # additive: quantize the AED decoder's
    # q/k/v/o + ff projections too (QuantDense, per-branch base precision);
    # the reference keeps the decoder fully fp (conformer.py:275-299).
    # Embedding + vocab projection stay fp (BitNet practice)
    fused_attention: bool = False  # Pallas fused rel-pos attention kernel
    # on TPU (whole attention in VMEM; XLA fallback on CPU/streaming).
    # Opt-in while its full-train-step interaction is being validated —
    # see ops/attention.py
    fused_subsampler: bool = False  # Pallas fused conv1→ReLU→conv2→ReLU
    # subsampler: the conv1 intermediate (the step's largest activation)
    # lives only in VMEM; custom VJP, parameters checkpoint-compatible with
    # the unfused path. Opt-in, like fused_attention — see ops/subsampler.py
    split_qkv: bool = False  # tensor-parallel MHSA layout: three [D,D]
    # per-projection GEMMs instead of the fused [D,3D] concat, which under
    # a 'model'-sharded mesh costs a collective-permute per q/k/v boundary
    # re-alignment. Set explicitly by the TP code paths (cli/train.py,
    # __graft_entry__); identical math and param tree either way
    # Streaming (U2-style chunked-causal encoder; None/False = full-context
    # offline model, the reference behavior):
    causal_conv: bool = False  # depthwise conv sees only the past
    attn_chunk_size: Optional[int] = None  # chunked attention, in SUBSAMPLED
    # frames; with causal_conv + conv_norm="layer_norm" the trained model is
    # consumable by decode/streaming.StreamingSession
    attn_left_chunks: int = -1  # previous chunks visible (-1 = all history)
    scan_unroll: int = 0  # lax.scan unroll for the encoder block stack.
    # 0 (default) = FULL unroll: the 12-iteration scan was the single
    # biggest throughput lever found in round 3 — the scan forces every
    # carried tensor through HBM at each layer boundary and stops the
    # scheduler from overlapping across layers; fully unrolled, XLA fuses
    # and pipelines across the whole depth (233.3 -> 289.6 utt/s on the
    # bench of record, identical loss). Costs compile time ~O(depth);
    # params stay stacked [L, ...] (checkpoints unchanged). N>0 = partial
    # unroll (measured WORSE than both extremes: bigger per-iteration
    # buffers AND still a scan); 1 = one compiled body (fastest compile,
    # the pre-round-3 behavior).
    time_pad_multiple: int = 128  # pad the subsampled time axis to a
    # multiple of this when it exceeds half of it (model/conformer.py):
    # T'=255 from the canonical 1024 raw frames mis-aligns every
    # [.., T', T'] attention tensor's lane dim, measured at ~13% of the
    # whole step (197.5 → 222.8 utt/s at T'=256). Mask-correct: padded
    # frames are excluded from attention/conv/CTC/decode. 1 disables.


@dataclass(frozen=True)
class LossConfig:
    """Composite 3-branch QAT loss (reference: train.py:83-111, 207-209)."""

    gamma_ctc: float = 0.2
    lambda1: float = 0.5  # weight for 1-bit & stochastic-precision losses
    lambda2: float = 1.0  # weight for KL terms
    label_smoothing: float = 0.1
    reference_smoothing: bool = False  # use the reference's hand-rolled
    # smoothing formula — uniform eps/(V-1) over non-target classes, target
    # gets exactly 1-eps (losses.py:27-31) — instead of torch
    # CrossEntropyLoss semantics ((1-eps)*onehot + eps/V). For
    # reference-exact head-to-head runs (--reference_decoder)
    # stochastic-precision mask schedule (reference: train.py:56-59)
    sp_low_p: float = 0.2
    sp_high_p: float = 0.9


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = "data"
    tokenizer_path: str = "src/data/tokenizer.json"
    cmvn_stats_path: str = "src/data/cmvn_stats.npz"
    vocab_size: int = 5000  # BPE size before +4 specials
    batch_size: int = 64
    max_frames: int = 1600  # static pad ceiling per bucket (16s @10ms)
    max_tokens: int = 228
    num_buckets: int = 8
    num_workers: int = 2
    cmvn_num_utts: int = 1000  # reference: main.py:45-49


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + warmup-cosine (reference: train.py:32-53, 259)."""

    lr: float = 5e-4
    warmup_steps: int = 4000
    min_lr_ratio: float = 0.1
    betas: Tuple[float, float] = (0.9, 0.98)
    weight_decay: float = 1e-2
    grad_clip_norm: float = 5.0


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    epochs: int = 40
    seed: int = 0
    save_dir: str = "./checkpoints"
    beam_size: int = 10
    # parallelism
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass(frozen=True)
class EvalConfig:
    checkpoint: str = ""
    splits: Tuple[str, ...] = ("test.clean", "test.other")
    batch_size: int = 16
    beam_size: int = 10
    precisions: Tuple[int, ...] = (32, 2, 1)


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    return obj


def config_to_json(cfg: Any) -> str:
    return json.dumps(_to_jsonable(cfg), indent=2, sort_keys=True)


def _from_dict(cls, d: Dict[str, Any]):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = _from_dict(f.type, v)
        else:
            ft = _FIELD_TYPES.get((cls.__name__, f.name))
            if ft is not None and isinstance(v, dict):
                kwargs[f.name] = _from_dict(ft, v)
            elif isinstance(v, list):
                kwargs[f.name] = tuple(v)
            else:
                kwargs[f.name] = v
    return cls(**kwargs)


_FIELD_TYPES = {
    ("ModelConfig", "specials"): SpecialTokens,
    ("TrainConfig", "model"): ModelConfig,
    ("TrainConfig", "loss"): LossConfig,
    ("TrainConfig", "data"): DataConfig,
    ("TrainConfig", "optim"): OptimConfig,
    ("TrainConfig", "frontend"): FrontendConfig,
}


def train_config_from_json(s: str) -> TrainConfig:
    return _from_dict(TrainConfig, json.loads(s))


def model_config_from_dict(d: Dict[str, Any]) -> ModelConfig:
    """Rebuild a ModelConfig from its asdict() form (export.py meta.json)."""
    return _from_dict(ModelConfig, d)
