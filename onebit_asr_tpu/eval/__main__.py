"""`python -m onebit_asr_tpu.eval` — evaluation entry point (reference: eval.py)."""

from onebit_asr_tpu.cli.evaluate import main

raise SystemExit(main())
