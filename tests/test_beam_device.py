"""On-device beam search must match the host reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.decode.beam import ctc_beam_search_batch
from onebit_asr_tpu.decode.beam_device import beam_search_device

BLANK = 3


def _log_probs(seed, B=3, T=12, V=9, peaky=False):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    if peaky:
        # realistic CTC-like distributions: strong blank bias + peaks
        logits[..., BLANK] += 2.0
        peaks = rng.integers(0, V, size=(B, T))
        np.put_along_axis(logits, peaks[..., None], 4.0, axis=-1)
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed,peaky", [(0, False), (1, False), (2, True), (3, True)])
def test_device_beam_matches_host(seed, peaky):
    lp = _log_probs(seed, peaky=peaky)
    B, T, V = lp.shape
    lens = np.array([T, T // 2, 1])
    host = ctc_beam_search_batch(lp, lens, beam_size=8, blank_id=BLANK, top_k_per_t=V)
    ids, out_lens = beam_search_device(
        jnp.asarray(lp), jnp.asarray(lens),
        blank_id=BLANK, beam_size=8, top_k=V, max_len=T,
    )
    for b in range(B):
        got = list(np.asarray(ids[b, : int(out_lens[b])]))
        assert got == host[b], (b, got, host[b])


def test_device_beam_wide_vocab_topk():
    """top-k pruning active (K < V), parity with host under same pruning."""
    lp = _log_probs(7, B=2, T=10, V=32, peaky=True)
    lens = np.array([10, 10])
    host = ctc_beam_search_batch(lp, lens, beam_size=6, blank_id=BLANK, top_k_per_t=8)
    ids, out_lens = beam_search_device(
        jnp.asarray(lp), jnp.asarray(lens),
        blank_id=BLANK, beam_size=6, top_k=8, max_len=10,
    )
    for b in range(2):
        got = list(np.asarray(ids[b, : int(out_lens[b])]))
        assert got == host[b], (b, got, host[b])
