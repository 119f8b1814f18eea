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


# ---------------------------------------------------------- device LM fusion


def _train_lm(order=3, seed=5, V=9, n_seq=40):
    rng = np.random.default_rng(seed)
    seqs = [
        [int(t) for t in rng.integers(4, V, size=rng.integers(2, 10))]
        for _ in range(n_seq)
    ]
    from onebit_asr_tpu.decode.lm import NGramLM

    return NGramLM(order=order).fit(seqs)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_device_lm_scores_match_host(order):
    """DeviceLM.scores == NGramLM.score for every (prefix, candidate),
    including backoff chains, short prefixes, and unseen tokens."""
    from onebit_asr_tpu.decode.lm_device import DeviceLM

    lm = _train_lm(order=order)
    dev = DeviceLM.pack(lm)
    rng = np.random.default_rng(11)
    L = 6
    prefixes = rng.integers(4, 9, size=(5, L)).astype(np.int32)
    plen = np.array([0, 1, 2, 4, 6], np.int32)
    cand = np.arange(0, 9, dtype=np.int32)  # incl. never-seen ids 0..3
    got = np.asarray(dev.scores(
        jnp.asarray(prefixes), jnp.asarray(plen), jnp.asarray(cand)
    ))
    for w in range(5):
        ctx = list(prefixes[w, : plen[w]])
        for k, c in enumerate(cand):
            want = lm.score(ctx, int(c))
            assert got[w, k] == pytest.approx(want, abs=1e-5), (
                order, ctx, int(c), got[w, k], want)


@pytest.mark.parametrize("seed,order", [(0, 2), (2, 3), (4, 3)])
def test_device_fused_beam_matches_host_fused_beam(seed, order):
    """Full LM-fused device beam == host fused beam, token for token
    (VERDICT r1 #7)."""
    from onebit_asr_tpu.decode.lm_device import DeviceLM

    lm = _train_lm(order=order, seed=seed + 20)
    lp = _log_probs(seed, peaky=True)
    B, T, V = lp.shape
    lens = np.array([T, T - 3, 4])
    host = ctc_beam_search_batch(
        lp, lens, beam_size=8, blank_id=BLANK, top_k_per_t=V,
        lm=lm, lm_weight=0.4, length_bonus=0.1, prefer_native=False,
    )
    ids, out_lens = beam_search_device(
        jnp.asarray(lp), jnp.asarray(lens),
        blank_id=BLANK, beam_size=8, top_k=V, max_len=T,
        lm=DeviceLM.pack(lm), lm_weight=0.4, length_bonus=0.1,
    )
    for b in range(B):
        got = list(np.asarray(ids[b, : int(out_lens[b])]))
        assert got == host[b], (b, got, host[b])


def test_device_fused_beam_matches_native_fused_beam():
    """And against the C++ host runtime when it builds."""
    from onebit_asr_tpu import native
    from onebit_asr_tpu.decode.lm_device import DeviceLM

    if native.get_lib() is None:
        pytest.skip("native runtime unavailable")
    lm = _train_lm(order=3, seed=31)
    lp = _log_probs(9, peaky=True)
    B, T, V = lp.shape
    lens = np.array([T, T, T])
    host = ctc_beam_search_batch(
        lp, lens, beam_size=6, blank_id=BLANK, top_k_per_t=V,
        lm=lm, lm_weight=0.3, length_bonus=0.05, prefer_native=True,
    )
    ids, out_lens = beam_search_device(
        jnp.asarray(lp), jnp.asarray(lens),
        blank_id=BLANK, beam_size=6, top_k=V, max_len=T,
        lm=DeviceLM.pack(lm), lm_weight=0.3, length_bonus=0.05,
    )
    for b in range(B):
        got = list(np.asarray(ids[b, : int(out_lens[b])]))
        assert got == host[b], (b, got, host[b])
