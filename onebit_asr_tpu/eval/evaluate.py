"""Multi-precision evaluation: loss + WER at fp32 / 2-bit / 1-bit.

Counterpart of the reference's eval paths (train.py:122-150 per-epoch,
eval.py:64-195 standalone): run the model per precision, decode CTC
(greedy on-device by default, prefix beam search optionally), score WER.

The per-batch flow keeps everything on device until the final tiny id
arrays; the reference instead runs a pure-Python beam search per utterance
per precision with `.item()` calls (SURVEY §2.5's eval bottleneck).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from onebit_asr_tpu.decode import (
    compute_wer,
    ctc_beam_search_batch,
    greedy_ctc_decode,
)
from onebit_asr_tpu.decode.wer import compute_cer
from onebit_asr_tpu.decode.beam_device import beam_search_device
from onebit_asr_tpu.train.step import make_eval_step
from onebit_asr_tpu.utils.config import LossConfig, SpecialTokens


def _ids_to_words(
    ids: Sequence[int], tokenizer=None, offset: int = 4
) -> str:
    """Token ids → text via tokenizer, or space-joined ids (dummy data)."""
    if tokenizer is not None:
        return tokenizer.ids_to_text(list(ids))
    return " ".join(str(int(i)) for i in ids if int(i) >= offset)


_DEVICE_LM_CACHE: Dict[int, object] = {}


def _device_lm_cached(lm):
    """Pack a host NGramLM into device tables once per eval run (packing
    hashes every stored n-gram; re-packing per batch would dominate)."""
    dev = _DEVICE_LM_CACHE.get(id(lm))
    if dev is None:
        from onebit_asr_tpu.decode.lm_device import DeviceLM

        dev = DeviceLM.pack(lm)
        _DEVICE_LM_CACHE[id(lm)] = dev
    return dev


def build_eval_steps(
    model,
    loss_cfg: LossConfig,
    specials: SpecialTokens,
    num_enc_layers: int,
    precisions: Sequence[int] = (32, 2, 1),
) -> Dict[int, Callable]:
    """Jitted per-precision eval steps. Build ONCE and reuse across epochs —
    jit caches by function identity, so rebuilding the closures each epoch
    would recompile every precision x bucket shape every time."""
    return {
        p: jax.jit(make_eval_step(model, loss_cfg, specials, num_enc_layers, p))
        for p in precisions
    }


def evaluate_stream(
    model,
    params,
    batches: Iterable[Dict],
    loss_cfg: LossConfig,
    specials: SpecialTokens,
    num_enc_layers: int,
    precisions: Sequence[int] = (32, 2, 1),
    tokenizer=None,
    use_beam: bool = False,
    beam_size: int = 10,
    max_batches: Optional[int] = None,
    host_beam: bool = False,
    eval_steps: Optional[Dict[int, Callable]] = None,
    print_samples: int = 0,
    lm=None,
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
) -> Dict[str, float]:
    """Returns {loss_{p}: float, wer_{p}: float} per precision plus counts."""
    if eval_steps is None:
        eval_steps = build_eval_steps(
            model, loss_cfg, specials, num_enc_layers, precisions
        )
    tot_loss = {p: 0.0 for p in precisions}
    tot_dist = {p: 0 for p in precisions}
    tot_words = {p: 0 for p in precisions}
    tot_cdist = {p: 0 for p in precisions}
    tot_chars = {p: 0 for p in precisions}
    n_batches = 0
    n_utts = 0
    printed = 0

    for batch in batches:
        if max_batches is not None and n_batches >= max_batches:
            break
        refs = [
            _ids_to_words(
                np.asarray(batch["tokens"][b][: int(batch["token_lens"][b])]),
                tokenizer,
                specials.offset,
            )
            for b in range(batch["tokens"].shape[0])
        ]
        for p in precisions:
            log_probs, enc_lens, loss = eval_steps[p](params, batch)
            tot_loss[p] += float(loss)
            if use_beam and host_beam:
                # host/native beam kept as the debug/oracle path
                hyp_ids = ctc_beam_search_batch(
                    np.asarray(log_probs),
                    np.asarray(enc_lens),
                    beam_size=beam_size,
                    blank_id=specials.blank_id,
                    lm=lm,
                    lm_weight=lm_weight,
                    length_bonus=length_bonus,
                )
            elif use_beam:
                device_lm = None
                if lm is not None and lm_weight:
                    device_lm = _device_lm_cached(lm)
                ids, lens = beam_search_device(
                    log_probs, enc_lens,
                    blank_id=specials.blank_id, beam_size=beam_size,
                    max_len=int(log_probs.shape[1]),
                    lm=device_lm, lm_weight=lm_weight,
                    length_bonus=length_bonus,
                )
                ids, lens = np.asarray(ids), np.asarray(lens)
                hyp_ids = [list(ids[b, : lens[b]]) for b in range(len(lens))]
            else:
                ids, lens = greedy_ctc_decode(
                    log_probs, enc_lens, specials.blank_id
                )
                ids, lens = np.asarray(ids), np.asarray(lens)
                hyp_ids = [list(ids[b, : lens[b]]) for b in range(len(lens))]
            hyps = [
                _ids_to_words(h, tokenizer, specials.offset) for h in hyp_ids
            ]
            d, w = compute_wer(refs, hyps)
            tot_dist[p] += d
            tot_words[p] += w
            cd, cw = compute_cer(refs, hyps)
            tot_cdist[p] += cd
            tot_chars[p] += cw
            # print first decoded samples (reference eval.py:117-195 prints
            # ref/hyp pairs per precision)
            if printed < print_samples and p == precisions[-1]:
                for r_, h_ in zip(refs, hyps):
                    if printed >= print_samples:
                        break
                    print(f"  REF: {r_}\n  HYP: {h_}")
                    printed += 1
        n_batches += 1
        n_utts += batch["tokens"].shape[0]

    out: Dict[str, float] = {"eval_batches": n_batches, "eval_utts": n_utts}
    for p in precisions:
        tag = {32: "32bit", 2: "2bit", 1: "1bit"}[p]
        out[f"loss_{tag}"] = tot_loss[p] / max(n_batches, 1)
        out[f"wer_{tag}"] = tot_dist[p] / max(tot_words[p], 1)
        out[f"cer_{tag}"] = tot_cdist[p] / max(tot_chars[p], 1)
    return out
