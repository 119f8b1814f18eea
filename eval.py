"""Root-level eval entry point (reference-repo surface parity: eval.py).

Thin wrapper over `python -m onebit_asr_tpu.cli.evaluate`.
"""

from onebit_asr_tpu.cli.evaluate import main

if __name__ == "__main__":
    raise SystemExit(main())
