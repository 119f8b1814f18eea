"""Conformer CTC+attention ASR model family (flax.linen, TPU-first)."""

from onebit_asr_tpu.model.asr import ConformerASR  # noqa: F401
from onebit_asr_tpu.model.conformer import ConformerEncoder  # noqa: F401
from onebit_asr_tpu.model.decoder import TransformerDecoder  # noqa: F401
from onebit_asr_tpu.model.layers import QuantDense  # noqa: F401
