"""Subword tokenizer with the reference's model-side id scheme.

The reference trains a SentencePiece BPE of vocab 5000 on uppercase
transcripts (reference src/data/tokenizer.py:29-89) and then shifts every
SPM id by +4 to reserve model-side specials pad=0 / bos=1 / eos=2 / blank=3
(reference onebit_asr/dataloader_stub.py:199-207); decoding drops ids < 4
and subtracts the offset (reference onebit_asr/metrics.py:34-48).

`sentencepiece` is not in this image; HF `tokenizers` BPE with a Metaspace
pre-tokenizer/decoder is the equivalent (same whitespace-marker subword
scheme). The offset shift is applied INSIDE encode/decode so the rest of
the framework only ever sees model-side ids — the reference instead
scatters the +4 across dataloader_stub/metrics/eval with hardcoded 4s
(eval.py:126-148), which SURVEY §5 flags as a defect class.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

from onebit_asr_tpu.utils.config import SpecialTokens


class AsrTokenizer:
    """BPE subwords + 4 reserved model-side specials.

    Model-side ids: [0, offset) are specials; [offset, offset + subwords)
    are BPE pieces. `vocab_size` is the model/CTC-head dimension.
    """

    def __init__(self, hf_tokenizer, specials: Optional[SpecialTokens] = None):
        self._tok = hf_tokenizer
        self.specials = specials or SpecialTokens()

    # -- construction --------------------------------------------------

    @classmethod
    def train(
        cls,
        texts: Iterable[str],
        vocab_size: int = 5000,
        specials: Optional[SpecialTokens] = None,
    ) -> "AsrTokenizer":
        """Train BPE on (uppercased) transcripts — reference
        tokenizer.py:54-81 equivalent (BPE, char coverage 1.0)."""
        from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Metaspace()
        tok.decoder = decoders.Metaspace()
        trainer = trainers.BpeTrainer(
            vocab_size=vocab_size, special_tokens=["<unk>"]
        )
        tok.train_from_iterator((t.upper() for t in texts), trainer)
        return cls(tok, specials)

    def save(self, path: str) -> None:
        self._tok.save(path)

    @classmethod
    def load(
        cls, path: str, specials: Optional[SpecialTokens] = None
    ) -> "AsrTokenizer":
        """Load either artifact format: an HF `tokenizer.json` (this
        framework's native trainer output) or a SentencePiece
        `tokenizer.model` protobuf (the reference's artifact,
        src/data/tokenizer.py:67-81) via data/spm.py — so a real reference
        tokenizer evaluates here unchanged."""
        if path.endswith(".model"):
            from onebit_asr_tpu.data.spm import SpmBackend, SpmBpeModel

            return cls(SpmBackend(SpmBpeModel.load(path)), specials)
        from tokenizers import Tokenizer

        return cls(Tokenizer.from_file(path), specials)

    @classmethod
    def find_and_load(
        cls, data_dir: str, specials: Optional[SpecialTokens] = None
    ) -> "AsrTokenizer":
        """Locate the tokenizer artifact in `data_dir`: `tokenizer.json`
        preferred (native ids), else `tokenizer.model` (reference SPM ids —
        the reference-checkpoint-eval scenario). The two id spaces differ
        (spm reserves 0-3 internally), so a checkpoint must be paired with
        the artifact format it was trained against."""
        import os

        for name in ("tokenizer.json", "tokenizer.model"):
            p = os.path.join(data_dir, name)
            if os.path.exists(p):
                return cls.load(p, specials)
        raise FileNotFoundError(
            f"no tokenizer.json / tokenizer.model in {data_dir}"
        )

    # -- vocab accounting ----------------------------------------------

    @property
    def subword_vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    @property
    def vocab_size(self) -> int:
        """Model vocab = subwords + reserved specials (reference
        dataloader_stub.py:201: spm_size + 4 = 5004)."""
        return self.subword_vocab_size + self.specials.offset

    # -- encode / decode -----------------------------------------------

    def encode(self, text: str) -> List[int]:
        """Text → model-side ids (offset-shifted)."""
        off = self.specials.offset
        return [i + off for i in self._tok.encode(text.upper()).ids]

    def ids_to_text(self, ids: Iterable[int]) -> str:
        """Model-side ids → text, dropping specials (reference
        metrics.py:34-48: keep ids >= 4, subtract offset, decode)."""
        off = self.specials.offset
        sub = [int(i) - off for i in ids if int(i) >= off]
        return self._tok.decode(sub)
