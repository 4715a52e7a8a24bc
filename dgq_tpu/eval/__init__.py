"""Evaluation harness: batch image generation, FID / IS / CLIP-score /
ImageReward scoring (the reference's src/gen4eval_* + eval_* equivalents)."""
