"""C++ host beam search == Python reference, incl. LM fusion.

The native library (native/beam.cpp, built on demand by
onebit_asr_tpu.native) implements the exact algorithm of decode/beam.py +
decode/lm.py; these tests pin the parity on random cases, LM-fused cases,
and the batch wrapper's dispatch.
"""

import numpy as np
import pytest

from onebit_asr_tpu import native
from onebit_asr_tpu.decode.beam import ctc_beam_search, ctc_beam_search_batch
from onebit_asr_tpu.decode.lm import NGramLM

BLANK = 3

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="no C++ toolchain for the native lib"
)


def _softmax_log(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return np.log(e / e.sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    T, V = rng.integers(4, 40), rng.integers(6, 30)
    lp = _softmax_log(rng.standard_normal((T, V)).astype(np.float32) * 2)
    py = ctc_beam_search(lp, beam_size=8, blank_id=BLANK, top_k_per_t=10)
    cc = native.ctc_beam_search_native(
        lp, beam_size=8, blank_id=BLANK, top_k_per_t=10
    )
    assert py == cc


@pytest.mark.parametrize("seed", range(4))
def test_native_matches_python_with_lm(seed):
    rng = np.random.default_rng(100 + seed)
    T, V = 20, 12
    lp = _softmax_log(rng.standard_normal((T, V)).astype(np.float32) * 2)
    corpus = [rng.integers(4, V, size=rng.integers(2, 8)).tolist()
              for _ in range(20)]
    lm = NGramLM(order=3).fit(corpus)
    py = ctc_beam_search(
        lp, beam_size=6, blank_id=BLANK, lm=lm, lm_weight=0.4,
        length_bonus=0.1,
    )
    nlm = native.NativeLM(lm)
    cc = native.ctc_beam_search_native(
        lp, beam_size=6, blank_id=BLANK, native_lm=nlm, lm_weight=0.4,
        length_bonus=0.1,
    )
    assert py == cc


def test_batch_wrapper_native_vs_python():
    rng = np.random.default_rng(7)
    B, T, V = 4, 25, 16
    lp = _softmax_log(rng.standard_normal((B, T, V)).astype(np.float32))
    lens = rng.integers(T // 2, T + 1, size=B)
    a = ctc_beam_search_batch(lp, lens, blank_id=BLANK, prefer_native=True)
    b = ctc_beam_search_batch(lp, lens, blank_id=BLANK, prefer_native=False)
    assert a == b


def test_native_lm_scores_roundtrip():
    """The C++ LM must reproduce decode/lm.py scores through the beam: an
    acoustically-ambiguous case resolves identically (see test_lm_fusion)."""
    V = 8
    lp = np.full((6, V), -10.0, np.float32)
    lp[0, 4] = -0.1
    lp[1, BLANK] = -0.1
    for t in (2, 3):
        lp[t, 5] = np.log(0.5) - 0.02
        lp[t, 6] = np.log(0.5)
    lp[4, BLANK] = -0.1
    lp[5, BLANK] = -0.1
    lm = NGramLM(order=2).fit([[4, 5]] * 10)
    nlm = native.NativeLM(lm)
    out = native.ctc_beam_search_native(
        lp, beam_size=6, blank_id=BLANK, native_lm=nlm, lm_weight=0.5
    )
    assert out == [4, 5]
