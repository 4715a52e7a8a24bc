#!/bin/bash
# Score a generated-image directory: IS + FID + CLIP score in one pass
# (reference scripts/eval_scores.sh:1-32, which shells out to torch-fidelity,
# pytorch-fid and eval_clip_score.py; here all three run in-process through
# dgq_tpu.cli.eval_scores on the JAX InceptionV3 extractor).
#
# Usage: scripts/eval_scores.sh GEN_DIR [REF_STATS_NPZ] [INCEPTION_CKPT] \
#          [CLIP_MODEL_DIR] [PROMPTS_FILE]
#   GEN_DIR         directory of generated 256px images (gen4eval --im256)
#   REF_STATS_NPZ   real_im256.npz-format reference stats (mu, sigma)
#   INCEPTION_CKPT  local pt_inception-2015-12-05-*.pth
#   CLIP_MODEL_DIR  local CLIP snapshot; scores first 3000 images like the
#                   reference (eval_scores.sh:28)
set -e
GEN=${1:?usage: eval_scores.sh GEN_DIR [REF_STATS] [INCEPTION_CKPT] [CLIP_DIR] [PROMPTS]}
ARGS=(--gen_dir "$GEN" --isc)
[ -n "$2" ] && ARGS+=(--ref_stats "$2")
[ -n "$3" ] && ARGS+=(--inception_ckpt "$3")
[ -n "$4" ] && [ -n "$5" ] && ARGS+=(--clip_model "$4" --prompts "$5" --clip_limit 3000)
python -m dgq_tpu.cli.eval_scores "${ARGS[@]}"
