#!/bin/bash
# Per-model weight-quantization policy (reference scripts/quantize_weight.sh):
#   sd   : 25 steps, MSE scale init (--cali), AdaRound block reconstruction
#   sdxl : 4 steps, minmax init, NO reconstruction (memory/compute cost)
# Usage: scripts/quantize_weight.sh {sd|sdxl} [W_BITS] [extra args...]
set -e
MODEL=${1:-sd}
WBITS=${2:-4}
shift 2 2>/dev/null || shift $# 2>/dev/null || true

if [ "$MODEL" = "sd" ]; then
  python -m dgq_tpu.cli.quantize_weight --model sd --wq "$WBITS" \
    --cali --step_size 25 --cali_prompt_data_n 64 --iters 20000 "$@"
elif [ "$MODEL" = "sdxl" ]; then
  python -m dgq_tpu.cli.quantize_weight --model sdxl --wq "$WBITS" \
    --fast --no_recon --step_size 4 --cali_prompt_data_n 64 "$@"
else
  echo "unknown model: $MODEL" >&2; exit 1
fi
