#!/bin/bash
# 8-way eval generation fan-out (reference scripts/gen4eval_SDXL.sh): on a
# multi-chip host each rank gets one device; single-chip runs them serially.
# Usage: scripts/gen4eval.sh MODEL PROMPTS OUTDIR [WORLD_SIZE] [extra...]
set -e
MODEL=${1:-sd}; PROMPTS=$2; OUTDIR=${3:-eval_images}; WS=${4:-8}
shift 4 2>/dev/null || true

for ((r = 0; r < WS; r++)); do
  python -m dgq_tpu.cli.gen4eval --model "$MODEL" --prompts "$PROMPTS" \
    --outdir "$OUTDIR" --gpu_rank "$r" --world_size "$WS" --im256 "$@" &
done
wait
