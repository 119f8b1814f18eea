"""SentencePiece `tokenizer.model` compatibility layer (data/spm.py).

The reference's tokenizer artifact is an SPM BPE protobuf
(/root/reference/src/data/tokenizer.py:67-81); `sentencepiece` itself is
absent from this image, so data/spm.py implements the wire format and the
BPE encode algorithm directly. These tests pin:

- protobuf round-trip (write_model_proto -> parse_model_proto),
- the SPM BPE merge semantics (best score first, leftmost on ties,
  dummy prefix, U+2581 escaping, unk fallback) on a hand-built model,
- decode rules (control pieces skipped, unk surface, prefix strip),
- exporter equivalence: a tokenizer trained by this framework's HF
  backend, exported to .model, must produce identical piece sequences,
- AsrTokenizer.load("*.model") end-to-end: reference id scheme
  (spm_id + 4) and text round-trip.
"""

import numpy as np
import pytest

from onebit_asr_tpu.data.spm import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    SpmBpeModel,
    export_hf_to_spm,
    parse_model_proto,
    write_model_proto,
)
from onebit_asr_tpu.data.text import AsrTokenizer

SPECIALS = [
    ("<blank>", 0.0, CONTROL),
    ("<unk>", 0.0, UNKNOWN),
    ("<sos>", 0.0, CONTROL),
    ("<eos>", 0.0, CONTROL),
]


def test_proto_roundtrip():
    pieces = SPECIALS + [
        ("▁", -10.0, NORMAL),
        ("A", -11.5, NORMAL),
        ("▁THE", -1.0, NORMAL),
    ]
    data = write_model_proto(pieces)
    back = parse_model_proto(data)
    assert [(p, t) for p, _, t in back] == [(p, t) for p, _, t in pieces]
    np.testing.assert_allclose(
        [s for _, s, _ in back], [s for _, s, _ in pieces], rtol=1e-6
    )


def _toy_model():
    # scores: higher = earlier merge. "AB" merges before "▁A".
    pieces = SPECIALS + [
        ("▁", -10.0, NORMAL),  # 4
        ("A", -11.0, NORMAL),       # 5
        ("B", -12.0, NORMAL),       # 6
        ("AB", -1.0, NORMAL),       # 7
        ("▁A", -2.0, NORMAL),  # 8
        ("AA", -3.0, NORMAL),       # 9
    ]
    return SpmBpeModel(pieces)


def test_bpe_merge_order_and_ids():
    m = _toy_model()
    # "AB": dummy prefix -> [▁, A, B]; best merge is AB (-1 > -2)
    assert m.encode_pieces("AB") == ["▁", "AB"]
    assert m.encode("AB") == [4, 7]
    # "A": ▁A merge applies
    assert m.encode_pieces("A") == ["▁A"]
    assert m.encode("A") == [8]


def test_bpe_best_score_first():
    m = _toy_model()
    # "AAA" -> [▁, A, A, A]; ▁A (-2) outranks AA (-3), then AA merges
    assert m.encode_pieces("AAA") == ["▁A", "AA"]


def test_bpe_leftmost_tie():
    # same piece available at two positions (equal score): leftmost wins —
    # [▁, A, A, A] -> merge at pos 1 -> [▁, AA, A] (rightmost would give
    # [▁, A, AA])
    m = SpmBpeModel(SPECIALS + [
        ("▁", -10.0, NORMAL),
        ("A", -11.0, NORMAL),
        ("AA", -1.0, NORMAL),
    ])
    assert m.encode_pieces("AAA") == ["▁", "AA", "A"]


def test_unknown_char_maps_to_unk():
    m = _toy_model()
    ids = m.encode("AZB")
    assert m.unk_id == 1
    # Z is not in the vocab
    assert 1 in ids


def test_whitespace_normalization():
    m = _toy_model()
    # collapse runs of whitespace, escape to U+2581, dummy prefix
    assert m.encode_pieces("A  B") == ["▁A", "▁", "B"]


def test_decode_rules():
    m = _toy_model()
    # control ids skipped; ▁ becomes space; leading space stripped
    assert m.decode([2, 4, 7, 3]) == "AB"
    assert m.decode([8, 4, 6]) == "A B"
    # unk renders SPM's default surface
    assert "⁇" in m.decode([1])
    # out-of-range ids are ignored, not an error
    assert m.decode([999]) == ""


@pytest.fixture(scope="module")
def trained_pair(tmp_path_factory):
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "speech recognition with ternary weights",
        "hello world hello speech",
        "quantization aware training of conformer models",
    ] * 4
    tok = AsrTokenizer.train(corpus, vocab_size=80)
    path = str(tmp_path_factory.mktemp("spm") / "tokenizer.model")
    export_hf_to_spm(tok._tok, path)
    return tok, SpmBpeModel.load(path), path


def test_export_piece_sequence_equivalence(trained_pair):
    """The exported .model reproduces the HF backend's merge decisions:
    identical piece sequences on shared text (ids differ by the documented
    +3 layout shift)."""
    hf, spm, _ = trained_pair
    for text in [
        "THE QUICK BROWN FOX",
        "HELLO SPEECH",
        "TERNARY QUANTIZATION",
        "DOG",
    ]:
        hf_pieces = hf._tok.encode(text).tokens
        spm_pieces = spm.encode_pieces(text)
        assert spm_pieces == hf_pieces, text


def test_export_unknown_alignment(trained_pair):
    """Characters outside the trained alphabet hit <unk> in both backends."""
    hf, spm, _ = trained_pair
    text = "FOXß"  # sharp s is not in the training alphabet
    hf_ids = hf._tok.encode(text).ids
    spm_ids = spm.encode(text)
    assert (0 in hf_ids) == (spm.unk_id in spm_ids)


def test_asr_tokenizer_loads_spm_artifact(trained_pair):
    """AsrTokenizer.load('.model') drives the reference id scheme:
    model ids = spm ids + 4, vocab = spm + 4, text round-trips."""
    _, spm, path = trained_pair
    tok = AsrTokenizer.load(path)
    assert tok.vocab_size == len(spm) + 4
    text = "THE LAZY DOG"
    ids = tok.encode(text)
    assert ids == [i + 4 for i in spm.encode(text)]
    assert all(i >= 4 for i in ids)
    # round-trip through ids_to_text (drops specials, subtracts offset)
    assert tok.ids_to_text([2] + ids + [3]) == text

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
