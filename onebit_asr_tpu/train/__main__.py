"""`python -m onebit_asr_tpu.train` — reference-parity training entry point
(the reference runs `python -m onebit_asr.train`, train.py:172)."""

from onebit_asr_tpu.cli.train import main

raise SystemExit(main())
