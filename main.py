"""Root-level data-prep entry point (reference-repo surface parity: main.py).

The reference main.py checks the tokenizer exists and computes CMVN stats
(/root/reference/main.py:15-49). Equivalent here: `prepare tokenizer` +
`prepare cmvn` (plus ingest/tokenize). Thin wrapper over
`python -m onebit_asr_tpu.cli.prepare`.
"""

from onebit_asr_tpu.cli.prepare import main

if __name__ == "__main__":
    raise SystemExit(main())
