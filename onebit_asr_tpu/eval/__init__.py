"""Evaluation: multi-precision WER over a data stream."""

from onebit_asr_tpu.eval.evaluate import evaluate_stream  # noqa: F401
