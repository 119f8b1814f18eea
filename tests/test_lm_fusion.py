"""n-gram LM + shallow fusion in the prefix beam search.

The reference decodes without an LM (metrics.py:74 "no LM"); fusion is an
additive capability: with lm_weight=0 the beam is unchanged, and with an
informative LM an acoustically-ambiguous utterance resolves to the
LM-preferred sequence.
"""

import numpy as np
import pytest

from onebit_asr_tpu.decode.beam import ctc_beam_search
from onebit_asr_tpu.decode.lm import NGramLM

BLANK = 3


def _softmax_log(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return np.log(e / e.sum(-1, keepdims=True))


def test_lm_scores_are_normalized_ish():
    lm = NGramLM(order=2).fit([[4, 5, 6], [4, 5, 7], [4, 5, 6]])
    # after context [4], token 5 always follows
    assert lm.score([4], 5) == pytest.approx(0.0)
    # after [5]: 6 twice, 7 once
    assert lm.score([5], 6) == pytest.approx(np.log(2 / 3))
    assert lm.score([5], 7) == pytest.approx(np.log(1 / 3))
    # unseen token backs off to the floored unigram
    assert lm.score([5], 9) < np.log(1 / 3)


def test_lm_save_load_roundtrip(tmp_path):
    lm = NGramLM(order=3).fit([[4, 5, 6, 5, 6], [6, 5, 4]])
    p = str(tmp_path / "lm.npz")
    lm.save(p)
    lm2 = NGramLM.load(p)
    for ctx, c in [((4, 5), 6), ((5,), 6), ((), 4), ((9, 9), 5)]:
        assert lm2.score(ctx, c) == pytest.approx(lm.score(ctx, c))


def test_zero_weight_fusion_is_identity():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((12, 8)).astype(np.float32)
    lp = _softmax_log(logits)
    lm = NGramLM(order=2).fit([[4, 5], [4, 6]])
    plain = ctc_beam_search(lp, beam_size=4, blank_id=BLANK)
    fused0 = ctc_beam_search(lp, beam_size=4, blank_id=BLANK, lm=lm, lm_weight=0.0)
    assert plain == fused0


def test_fusion_resolves_acoustic_ambiguity():
    """Tokens 5 and 6 are acoustically indistinguishable at every frame; the
    LM has only ever seen [4, 5], so fusion must pick 5."""
    V = 8
    lp = np.full((6, V), -10.0, np.float32)
    lp[0, 4] = -0.1
    lp[1, BLANK] = -0.1
    for t in (2, 3):
        lp[t, 5] = np.log(0.5) - 0.02
        lp[t, 6] = np.log(0.5)  # acoustically 6 is a hair MORE likely
    lp[4, BLANK] = -0.1
    lp[5, BLANK] = -0.1
    lm = NGramLM(order=2).fit([[4, 5]] * 10)
    plain = ctc_beam_search(lp, beam_size=6, blank_id=BLANK)
    assert plain == [4, 6]
    fused = ctc_beam_search(lp, beam_size=6, blank_id=BLANK, lm=lm, lm_weight=0.5)
    assert fused == [4, 5]


def test_length_bonus_encourages_longer_hyps():
    rng = np.random.default_rng(1)
    lp = _softmax_log(rng.standard_normal((10, 8)).astype(np.float32))
    short = ctc_beam_search(lp, beam_size=4, blank_id=BLANK)
    longer = ctc_beam_search(lp, beam_size=4, blank_id=BLANK, length_bonus=2.0)
    assert len(longer) >= len(short)
