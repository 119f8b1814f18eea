"""`python -m onebit_asr_tpu.serve` — multiplexed streaming ASR daemon
(NDJSON over stdio/TCP). The reference has no serving runtime at all; its
eval.py is batch-offline only (/root/reference/eval.py)."""

from onebit_asr_tpu.cli.serve import main

if __name__ == "__main__":
    raise SystemExit(main())
