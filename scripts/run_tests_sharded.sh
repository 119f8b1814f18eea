#!/usr/bin/env bash
# Full test suite in TWO fresh pytest processes.
#
# Running all ~245 tests in ONE process segfaults deterministically near
# the end (rc=139) inside XLA:CPU backend_compile_and_load at a FRESH
# compile — reproduced with the persistent compile cache disabled, so it
# is accumulated in-process XLA/LLVM JIT state, not a cache artifact
# (first seen after round 3's full-unroll default increased per-compile
# code size). Every shard passes in a fresh process; this script is the
# stable full-suite lane. `pytest -m quick` remains the <3-minute tier.
set -uo pipefail
cd "$(dirname "$0")/.."
FAILED=0
python -m pytest tests/ -q --ignore=tests/test_train_step.py \
  --ignore=tests/test_transcribe.py --ignore=tests/test_wav_ingest.py \
  --ignore=tests/test_tensor_parallel.py "$@" || FAILED=1
python -m pytest tests/test_tensor_parallel.py tests/test_train_step.py \
  tests/test_transcribe.py tests/test_wav_ingest.py -q "$@" || FAILED=1
exit $FAILED
