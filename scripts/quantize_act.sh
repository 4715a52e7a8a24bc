#!/bin/bash
# DGQ trick policy (reference scripts/quantize_act.sh:16-25):
#   g=1  : plain uniform activation quant, all t2i tricks OFF
#   g>1  : group quantization + log2 softmax + real-time delta + start-peak
# Usage: scripts/quantize_act.sh {sd|sdxl} CKPT [W] [A] [G] [extra...]
set -e
MODEL=${1:-sd}; CKPT=$2; W=${3:-4}; A=${4:-8}; G=${5:-8}
shift 5 2>/dev/null || true

if [ -z "$CKPT" ]; then echo "usage: $0 MODEL CKPT [W] [A] [G]" >&2; exit 1; fi

TRICKS=""
if [ "$G" -gt 1 ]; then
  TRICKS="--t2i_log_quant --t2i_real_time --t2i_start_peak --time_aware_aqtizer"
fi

python -m dgq_tpu.cli.quantize_act --model "$MODEL" --cali_ckpt "$CKPT" \
  --wq "$W" --aq "$A" --softmax_a_bit "$A" --group_num "$G" $TRICKS "$@"
