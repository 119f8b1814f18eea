#!/usr/bin/env bash
# On-chip ablation sweep for the bench of record (run configs SERIALLY —
# one TPU job at a time; two concurrent jobs serialize on the tunnel and
# both measurements become garbage). Each line of $OUT gets the config
# name plus bench.py's one-line JSON.
set -u
OUT=${OUT:-/tmp/ablation.jsonl}
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name ===" >&2
  line=$(timeout "${BENCH_TIMEOUT:-900}" env "$@" python bench.py 2>/tmp/bench_stderr.log | tail -1)
  code=$?
  tail -3 /tmp/bench_stderr.log >&2
  echo "{\"config\": \"$name\", \"exit\": $code, \"result\": ${line:-null}}" >> "$OUT"
}

run baseline            BENCH_STEPS=16
run dropout_off         BENCH_STEPS=16 BENCH_DROPOUT=0
run remat_attn          BENCH_STEPS=16 BENCH_REMAT_POLICY=attn
run remat_full          BENCH_STEPS=16 BENCH_REMAT_POLICY=full
run fused_attention     BENCH_STEPS=16 BENCH_FUSED=1
run fused_policy        BENCH_STEPS=16 BENCH_FUSED=1 BENCH_REMAT_POLICY=fused
run fused_subsampler    BENCH_STEPS=16 BENCH_FUSED_SUBSAMPLER=1
run fused_both          BENCH_STEPS=16 BENCH_FUSED=1 BENCH_FUSED_SUBSAMPLER=1 BENCH_REMAT_POLICY=fused
run ctc_scan            BENCH_STEPS=16 ONEBIT_CTC_PALLAS=0
run multistep8          BENCH_STEPS=16 BENCH_MULTISTEP=8
echo "done -> $OUT" >&2
