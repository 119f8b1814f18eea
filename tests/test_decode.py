"""Decoding tests: greedy vs reference loop, beam search vs brute force, WER."""

import itertools
import math

import jax.numpy as jnp
import numpy as np
import pytest

from onebit_asr_tpu.decode import (
    compute_wer,
    ctc_beam_search_batch,
    greedy_ctc_decode,
    levenshtein_distance,
)
from onebit_asr_tpu.decode.beam import ctc_beam_search

BLANK = 3


def _greedy_reference(logits, lens, blank):
    """Literal port of the reference loop (metrics.py:51-60) in numpy."""
    out = []
    for b in range(logits.shape[0]):
        ids = np.argmax(logits[b, : lens[b]], axis=-1)
        seq, prev = [], None
        for i in ids:
            if i != prev and i != blank:
                seq.append(int(i))
            prev = i
        out.append(seq)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_greedy_matches_reference_loop(seed):
    rng = np.random.default_rng(seed)
    B, T, V = 4, 17, 9
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = rng.integers(1, T + 1, size=B).astype(np.int32)
    ids, out_lens = greedy_ctc_decode(jnp.asarray(logits), jnp.asarray(lens), BLANK)
    ref = _greedy_reference(logits, lens, BLANK)
    for b in range(B):
        got = list(np.asarray(ids[b, : int(out_lens[b])]))
        assert got == ref[b], (b, got, ref[b])
        assert (np.asarray(ids[b, int(out_lens[b]):]) == -1).all()


def _brute_force_best_labels(log_probs, blank, max_len=3):
    """argmax over label sequences of the exact CTC posterior (tiny cases)."""
    T, V = log_probs.shape
    labels = [v for v in range(V) if v != blank]
    best, best_lp = [], -math.inf

    def seq_logprob(seq):
        # sum over all alignments via forward algorithm
        S = 2 * len(seq) + 1
        z = [blank]
        for c in seq:
            z += [c, blank]
        alpha = [-math.inf] * S
        alpha[0] = log_probs[0][blank]
        if S > 1:
            alpha[1] = log_probs[0][z[1]]
        for t in range(1, T):
            new = [-math.inf] * S
            for s in range(S):
                cands = [alpha[s]]
                if s >= 1:
                    cands.append(alpha[s - 1])
                if s >= 2 and z[s] != blank and z[s] != z[s - 2]:
                    cands.append(alpha[s - 2])
                m = max(cands)
                if m == -math.inf:
                    continue
                new[s] = m + math.log(sum(math.exp(c - m) for c in cands)) + log_probs[t][z[s]]
            alpha = new
        ends = [alpha[S - 1]]
        if S > 1:
            ends.append(alpha[S - 2])
        m = max(ends)
        return -math.inf if m == -math.inf else m + math.log(
            sum(math.exp(e - m) for e in ends)
        )

    for L in range(0, max_len + 1):
        for seq in itertools.product(labels, repeat=L):
            lp = seq_logprob(list(seq))
            if lp > best_lp:
                best_lp, best = lp, list(seq)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_beam_search_finds_map_sequence(seed):
    """With a wide beam on tiny instances, prefix beam search must find the
    exact MAP label sequence (validates the merge rules)."""
    rng = np.random.default_rng(seed)
    T, V = 4, 5
    logits = rng.standard_normal((T, V)).astype(np.float32) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    got = ctc_beam_search(lp, beam_size=64, blank_id=BLANK, top_k_per_t=V)
    want = _brute_force_best_labels(lp, BLANK, max_len=4)
    assert got == want, (got, want)


def test_beam_search_batch_respects_lengths():
    rng = np.random.default_rng(9)
    B, T, V = 3, 12, 7
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lens = np.array([4, 12, 1])
    outs = ctc_beam_search_batch(lp, lens, beam_size=8, blank_id=BLANK)
    assert len(outs) == B
    outs_full = ctc_beam_search_batch(lp[:1], np.array([4]), beam_size=8, blank_id=BLANK)
    assert outs[0] == outs_full[0]


def _lev_naive(a, b):
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[m][n]


@pytest.mark.parametrize("seed", range(6))
def test_levenshtein_matches_naive(seed):
    rng = np.random.default_rng(seed)
    words = ["a", "b", "c", "dd", "e"]
    ref = [words[i] for i in rng.integers(0, len(words), rng.integers(0, 9))]
    hyp = [words[i] for i in rng.integers(0, len(words), rng.integers(0, 9))]
    assert levenshtein_distance(ref, hyp) == _lev_naive(ref, hyp)


def test_compute_wer():
    dist, words = compute_wer(
        ["the cat sat", "hello world"], ["the cat sat", "hallo world"]
    )
    assert dist == 1 and words == 5

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
