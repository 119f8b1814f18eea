"""CTC decoding (greedy on-device, prefix beam search) and WER metrics."""

from onebit_asr_tpu.decode.greedy import greedy_ctc_decode  # noqa: F401
from onebit_asr_tpu.decode.beam import ctc_beam_search_batch  # noqa: F401
from onebit_asr_tpu.decode.wer import compute_wer, levenshtein_distance  # noqa: F401
