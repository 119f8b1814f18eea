#!/usr/bin/env bash
# Round-5 capstone: the WER-informative hard corpus, end to end, serialized
# (nothing else on the host — VERDICT r4 item 7), with the leak fixes in
# place (f16 transfers + per-epoch malloc_trim) so the >=20-epoch soak must
# end host-RSS-flat (VERDICT r4 item 4). Afterwards, ALL SEVEN serving
# surfaces score on the final checkpoint (VERDICT r4 item 3) plus the
# fp32/2/1 precision sweep on a metric that can actually separate them
# (VERDICT r4 item 6).
#
# Usage: scripts/capstone_hard.sh [n_utts] [epochs]
set -uo pipefail
N="${1:-8000}"; EPOCHS="${2:-30}"
DATA=data_hard; RUN=checkpoints_hard/capstone_hard
cd "$(dirname "$0")/.."

if [ ! -f "$DATA/train_manifest.jsonl" ]; then
  python -m onebit_asr_tpu.cli.prepare all --synthetic "$N" --hard \
    --hard_grid "${HARD_GRID:-16}" --hard_noise "${HARD_NOISE:-0.05}" \
    --out_dir "$DATA" --vocab_size 192 --max_seconds 8
  JAX_PLATFORMS=cpu python -m onebit_asr_tpu.cli.prepare features --out_dir "$DATA"
fi

python -m onebit_asr_tpu.cli.train \
  --data_dir "$DATA" --save_dir checkpoints_hard --run_name capstone_hard \
  --epochs "$EPOCHS" --batch_size 16 --grad_accum 4 --warmup_steps 1000 \
  --attn_chunk_size 16 --attn_left_chunks 4 --causal_conv \
  --conv_norm layer_norm --no_spec_augment --scan_unroll 1 --resume

cp "checkpoints_hard/capstone_hard/metrics.jsonl" docs/capstone_hard_metrics.jsonl 2>/dev/null || true
bash scripts/capstone_surfaces.sh "$RUN" "$DATA" test
