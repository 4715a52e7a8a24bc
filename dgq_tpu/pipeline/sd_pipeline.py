"""End-to-end text-to-image pipeline: CLIP text encoding -> scanned denoising
-> VAE decode. The TPU-native counterpart of the reference's vendored
StableDiffusionPipeline / StableDiffusionXLPipeline usage.

Weights come from local HF snapshots via the converters (zero-egress safe);
every stage also runs with random weights for tests/benchmarks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.qconfig import QConfig, QState
from dgq_tpu.models.unet_sd import unet_sd_apply
from dgq_tpu.models.unet_sdxl import unet_sdxl_apply
from dgq_tpu.pipeline.sampler import sd_sample, sdxl_turbo_sample
from dgq_tpu.pipeline.text_encoder import clip_text_encode, sdxl_encode_prompt
from dgq_tpu.pipeline.vae import latents_to_images, vae_decode


@dataclasses.dataclass
class SDPipeline:
    """Stable Diffusion v1.4 pipeline over functional parts.

    unet_params should already have quantized weights folded (weight path);
    qstate carries activation quantizers ([T]-stacked when time_aware).
    """

    unet_params: dict
    text_params: Optional[dict] = None
    vae_params: Optional[dict] = None
    tokenizer: Optional[object] = None  # HF CLIPTokenizer (local files)
    cfg: QConfig = QConfig()
    qstate: Optional[QState] = None
    time_aware: bool = False
    unet_apply: object = unet_sd_apply

    def encode_prompts(self, prompts: list[str], negative: str = "") -> tuple:
        if self.tokenizer is None or self.text_params is None:
            raise RuntimeError(
                "tokenizer/text encoder weights unavailable; pass prompt "
                "embeddings directly to generate_from_embeddings()"
            )
        ids = self.tokenizer(
            prompts, padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        ).input_ids
        nids = self.tokenizer(
            [negative] * len(prompts), padding="max_length", max_length=77,
            truncation=True, return_tensors="np",
        ).input_ids
        text = clip_text_encode(self.text_params, jnp.asarray(ids))
        uncond = clip_text_encode(self.text_params, jnp.asarray(nids))
        return text, uncond

    def generate_from_embeddings(
        self,
        ehs_text: jax.Array,
        ehs_uncond: jax.Array,
        steps: int = 25,
        scheduler: str = "pndm",
        guidance_scale: float = 7.5,
        height: int = 512,
        width: int = 512,
        seed: int = 42,
    ) -> np.ndarray:
        b = ehs_text.shape[0]
        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (b, height // 8, width // 8, 4)
        )
        final = sd_sample(
            self.unet_params, latents, ehs_text, ehs_uncond,
            num_inference_steps=steps, scheduler=scheduler,
            guidance_scale=guidance_scale, qstate=self.qstate, cfg=self.cfg,
            time_aware=self.time_aware, unet_apply=self.unet_apply,
        )
        if self.vae_params is None:
            return np.asarray(final)
        images = vae_decode(self.vae_params, final)
        return latents_to_images(images)

    def __call__(self, prompts: list[str], steps: int = 25, **kw) -> np.ndarray:
        text, uncond = self.encode_prompts(prompts)
        return self.generate_from_embeddings(text, uncond, steps=steps, **kw)


@dataclasses.dataclass
class SDXLTurboPipeline:
    """SDXL-turbo: 1-4 Euler steps, guidance 0, 1024px.

    Prompt encoding uses the dual-encoder scheme of the vendored SDXL
    pipeline's encode_prompt (CLIP-L + OpenCLIP-bigG penultimate hidden
    states concatenated, bigG projected pooled embedding); text_params_l/_g
    and the two tokenizers load from local HF snapshots. Layer/head counts
    are fields so tiny test configs work."""

    unet_params: dict
    vae_params: Optional[dict] = None
    text_params_l: Optional[dict] = None
    text_params_g: Optional[dict] = None
    tokenizer: Optional[object] = None    # CLIPTokenizer (encoder 1)
    tokenizer_2: Optional[object] = None  # CLIPTokenizer (encoder 2, '!' pad)
    layers_l: int = 12
    heads_l: int = 12
    layers_g: int = 32
    heads_g: int = 20
    cfg: QConfig = QConfig()
    qstate: Optional[QState] = None
    time_aware: bool = False
    unet_apply: object = unet_sdxl_apply

    def encode_prompts(self, prompts: list[str]) -> tuple:
        """-> (encoder_hidden_states (B,77,2048), pooled text_embeds (B,1280))."""
        if None in (self.tokenizer, self.tokenizer_2,
                    self.text_params_l, self.text_params_g):
            raise RuntimeError(
                "tokenizers/text encoder weights unavailable; pass embeddings "
                "directly to generate_from_embeddings()"
            )
        ids_l = self.tokenizer(
            prompts, padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        ).input_ids
        ids_g = self.tokenizer_2(
            prompts, padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        ).input_ids
        return sdxl_encode_prompt(
            self.text_params_l, self.text_params_g,
            jnp.asarray(ids_l), jnp.asarray(ids_g),
            layers_l=self.layers_l, heads_l=self.heads_l,
            layers_g=self.layers_g, heads_g=self.heads_g,
            eos_id=self.tokenizer_2.eos_token_id,
        )

    def __call__(self, prompts: list[str], steps: int = 4, **kw) -> np.ndarray:
        ehs, pooled = self.encode_prompts(prompts)
        return self.generate_from_embeddings(ehs, pooled, steps=steps, **kw)

    def generate_from_embeddings(
        self,
        ehs_text: jax.Array,
        text_embeds: jax.Array,
        steps: int = 4,
        height: int = 1024,
        width: int = 1024,
        seed: int = 42,
    ) -> np.ndarray:
        b = ehs_text.shape[0]
        latents = jax.random.normal(
            jax.random.PRNGKey(seed), (b, height // 8, width // 8, 4)
        )
        # SDXL micro-conditioning time_ids: (orig_h, orig_w, crop_t, crop_l, h, w)
        time_ids = jnp.tile(
            jnp.asarray([[height, width, 0.0, 0.0, height, width]]), (b, 1)
        )
        final = sdxl_turbo_sample(
            self.unet_params, latents, ehs_text, text_embeds, time_ids,
            unet_apply=self.unet_apply, num_inference_steps=steps,
            qstate=self.qstate, cfg=self.cfg, time_aware=self.time_aware,
        )
        if self.vae_params is None:
            return np.asarray(final)
        from dgq_tpu.pipeline.vae import SDXL_VAE_SCALE

        return latents_to_images(
            vae_decode(self.vae_params, final, scale=SDXL_VAE_SCALE))
