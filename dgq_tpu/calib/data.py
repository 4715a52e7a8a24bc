"""Calibration data generation.

Mirrors /root/reference/src/dataset_generation.py: run the FP sampling loop
and capture the exact (CFG-doubled, scheduler-scaled) UNet inputs per step,
then rearrange by timestep so chunk t holds every prompt's latents at
denoising step t.

The reference captures via pipeline step-end callbacks; here the scanned
sampler's `capture=True` stacks the per-call (latent_model_input, timestep)
directly from the compiled loop — the data is identical by construction
because it is the same tensor fed to the UNet.

Caching: a .npz per (model, steps, n_prompts, seed), counterpart of the
reference's torch.save cache (dataset_generation.py:54-56).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.pipeline.sampler import sd_sample


def generate_sd_cali_data(
    params: dict,
    ehs_text: jax.Array,
    ehs_uncond: jax.Array,
    steps: int = 25,
    scheduler: str = "pndm",
    guidance_scale: float = 7.5,
    latent_hw: int = 64,
    seed: int = 42,
    batch_size: int = 8,
    cache_path: Optional[str] = None,
    unet_apply=None,
):
    """Returns (cali_data, interval): cali_data = (lmi, t, ehs) arrays ordered
    by timestep chunk; interval = n_prompts * 2 (CFG doubling,
    dataset_generation.py:129-133,151-154).

    ehs_text/ehs_uncond: (N, 77, C) prompt embeddings (from the CLIP text
    encoder, or synthetic for smoke calibration).
    """
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return (jnp.asarray(z["lmi"]), jnp.asarray(z["t"]), jnp.asarray(z["ehs"])), int(z["interval"])

    n = ehs_text.shape[0]
    kw = {}
    if unet_apply is not None:
        kw["unet_apply"] = unet_apply
    lmis, ts, ehss = [], [], []
    for i in range(0, n, batch_size):
        et = ehs_text[i : i + batch_size]
        eu = ehs_uncond[i : i + batch_size]
        b = et.shape[0]
        latents = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(seed), i),
            (b, latent_hw, latent_hw, 4),
        )
        _, (lmi, t) = sd_sample(
            params, latents, et, eu, num_inference_steps=steps,
            scheduler=scheduler, guidance_scale=guidance_scale,
            capture=True, **kw,
        )
        # lmi: (T_calls, 2b, H, W, C); t: (T_calls,)
        lmis.append(np.asarray(lmi))
        ts.append(np.asarray(t))
        ehss.append(np.concatenate([np.asarray(eu), np.asarray(et)], axis=0))

    t_calls = lmis[0].shape[0]
    # rearrange by timestep: chunk t = concat over prompt batches
    lmi_by_t = [np.concatenate([x[ti] for x in lmis], axis=0) for ti in range(t_calls)]
    ehs_by_t = [np.concatenate(ehss, axis=0) for _ in range(t_calls)]
    t_by_t = [
        np.full((lmi_by_t[ti].shape[0],), ts[0][ti], np.int32) for ti in range(t_calls)
    ]
    lmi_all = np.concatenate(lmi_by_t, axis=0)
    t_all = np.concatenate(t_by_t, axis=0)
    ehs_all = np.concatenate(ehs_by_t, axis=0)
    interval = 2 * n

    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez(cache_path, lmi=lmi_all, t=t_all, ehs=ehs_all, interval=interval)
    return (jnp.asarray(lmi_all), jnp.asarray(t_all), jnp.asarray(ehs_all)), interval


def generate_sdxl_cali_data(
    params: dict,
    ehs_text: jax.Array,
    pooled_embeds: jax.Array,
    steps: int = 4,
    latent_hw: int = 128,
    seed: int = 42,
    batch_size: int = 4,
    cache_path: Optional[str] = None,
    unet_apply=None,
):
    """SDXL-turbo calibration data (reference src/dataset_generation.py SDXL
    branch + src/quantize_act.py SDXL path): Euler-trailing sampling at
    guidance 0 — no CFG doubling, so interval = n_prompts.

    Returns ((lmi, t, ehs, text_embeds, time_ids), interval): five arrays
    ordered by timestep chunk, matching the 5-positional-arg SDXL UNet batch
    convention used by the calibration drivers.
    """
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return (
            jnp.asarray(z["lmi"]), jnp.asarray(z["t"]), jnp.asarray(z["ehs"]),
            jnp.asarray(z["te"]), jnp.asarray(z["ti"]),
        ), int(z["interval"])

    from dgq_tpu.models.unet_sdxl import unet_sdxl_apply
    from dgq_tpu.pipeline.sampler import sdxl_turbo_sample

    apply_fn = unet_apply or unet_sdxl_apply
    n = ehs_text.shape[0]
    px = latent_hw * 8
    lmis, ts, ehss, tes, tis = [], [], [], [], []
    for i in range(0, n, batch_size):
        et = ehs_text[i : i + batch_size]
        pe = pooled_embeds[i : i + batch_size]
        b = et.shape[0]
        # micro-conditioning: (orig_h, orig_w, crop_t, crop_l, h, w)
        time_ids = jnp.tile(
            jnp.asarray([[px, px, 0.0, 0.0, px, px]], jnp.float32), (b, 1)
        )
        latents = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(seed), i),
            (b, latent_hw, latent_hw, 4),
        )
        _, (lmi, t) = sdxl_turbo_sample(
            params, latents, et, pe, time_ids, unet_apply=apply_fn,
            num_inference_steps=steps, capture=True,
        )
        lmis.append(np.asarray(lmi))  # (T, b, H, W, C)
        ts.append(np.asarray(t))
        ehss.append(np.asarray(et))
        tes.append(np.asarray(pe))
        tis.append(np.asarray(time_ids))

    t_calls = lmis[0].shape[0]
    lmi_all = np.concatenate(
        [np.concatenate([x[ti_] for x in lmis], axis=0) for ti_ in range(t_calls)]
    )
    ehs_cat = np.concatenate(ehss, axis=0)
    te_cat = np.concatenate(tes, axis=0)
    ti_cat = np.concatenate(tis, axis=0)
    ehs_all = np.concatenate([ehs_cat] * t_calls, axis=0)
    te_all = np.concatenate([te_cat] * t_calls, axis=0)
    ti_all = np.concatenate([ti_cat] * t_calls, axis=0)
    t_all = np.concatenate(
        [np.full((n,), ts[0][ti_], np.int32) for ti_ in range(t_calls)]
    )
    interval = n

    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez(cache_path, lmi=lmi_all, t=t_all, ehs=ehs_all,
                 te=te_all, ti=ti_all, interval=interval)
    return (
        jnp.asarray(lmi_all), jnp.asarray(t_all), jnp.asarray(ehs_all),
        jnp.asarray(te_all), jnp.asarray(ti_all),
    ), interval


def synthetic_sdxl_embeddings(
    n: int, seq: int = 77, dim: int = 2048, pooled_dim: int = 1280, seed: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Stand-in (hidden-state, pooled) SDXL prompt embeddings for smoke runs."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    text = jax.random.normal(k1, (n, seq, dim))
    pooled = jax.random.normal(k2, (n, pooled_dim))
    return text, pooled


def get_coco_prompts(path: str, num: int = 64, seed: Optional[int] = None) -> list[str]:
    """Sample captions from a COCO annotations json (reference
    src/dataset_generation.py:12-19 uses pandas .sample; plain random here)."""
    import json
    import random

    with open(path) as f:
        anns = json.load(f)["annotations"]
    captions = [a["caption"] for a in anns]
    rng = random.Random(seed)
    return rng.sample(captions, num)


def synthetic_prompt_embeddings(
    n: int, seq: int = 77, dim: int = 768, seed: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Stand-in prompt embeddings for calibration smoke runs when no CLIP
    weights are available (zero-egress environments). Shaped/scaled like CLIP
    hidden states."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    text = jax.random.normal(k1, (n, seq, dim))
    uncond = jnp.broadcast_to(jax.random.normal(k2, (1, seq, dim)), (n, seq, dim))
    return text, uncond
