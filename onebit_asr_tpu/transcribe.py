"""`python -m onebit_asr_tpu.transcribe` — serving entry point: checkpoint
+ audio → text (the reference has no transcription CLI; eval.py only
scores WER, /root/reference/eval.py:64-195)."""

from onebit_asr_tpu.cli.transcribe import main

if __name__ == "__main__":
    raise SystemExit(main())
