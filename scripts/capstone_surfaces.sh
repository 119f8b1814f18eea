#!/usr/bin/env bash
# Score ONE trained checkpoint through EVERY serving surface (capstone XL
# closing table): offline greedy, beam, beam + n-gram LM fusion, packed
# ternary Pallas matmuls, W2A8 (packed weights + int8 activations),
# incremental streaming session, and an exported StableHLO artifact run
# standalone. The run must be streaming-capable (chunked attention +
# causal conv + per-frame conv norm) so every surface is legitimately
# servable from the same weights.
#
# Usage: scripts/capstone_surfaces.sh <run_dir> <data_dir> [split]
set -uo pipefail
RUN="${1:?run_dir}"; DATA="${2:?data_dir}"; SPLIT="${3:-test}"
E="python -m onebit_asr_tpu.cli.evaluate --checkpoint $RUN --data_dir $DATA --splits $SPLIT --batch_size 64"

echo "=== 1. offline greedy (fp32 / 2-bit / 1-bit)"
$E --greedy
echo "=== 2. prefix beam search, beam 10 (2-bit, 256 utts)"
$E --precisions 2 --max_batches 4
echo "=== 3. beam 10 + n-gram LM shallow fusion w=0.3 (2-bit, 256 utts)"
$E --precisions 2 --lm "$DATA/lm.npz" --lm_weight 0.3 --max_batches 4
echo "=== 4. packed-ternary serving (Pallas planar-int8 matmuls, 2-bit, 512 utts)"
$E --precisions 2 --greedy --packed --max_batches 8
echo "=== 5. W2A8 (packed ternary weights + int8 activations, 2-bit, 512 utts)"
$E --precisions 2 --greedy --packed --int8_act --max_batches 8
echo "=== 6. incremental StreamingSession (2-bit, 512 utts)"
$E --precisions 2 --streaming --max_batches 8
echo "=== 7. StableHLO export round-trip (2-bit, greedy logprobs)"
ART=$(mktemp -d)/capstone.export
python -m onebit_asr_tpu.cli.export offline --checkpoint "$RUN" \
  --precision 2 --batch 8 --frames 512 --emit logprobs --out "$ART" \
  && python -m onebit_asr_tpu.cli.export run --artifact "$ART"
