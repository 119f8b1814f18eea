"""`python -m onebit_asr_tpu.prepare` — data preparation entry point
(reference: download_data.sh + tokenizer.py + main.py prep stages)."""

from onebit_asr_tpu.cli.prepare import main

if __name__ == "__main__":
    raise SystemExit(main())
