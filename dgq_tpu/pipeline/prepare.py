"""One-call pipeline assembly from a local HF snapshot tree.

The reference's prepare_pipe (src/utils.py:16-53) downloads the HF pipeline,
swaps in the rewritten UNet, and caches to ./pretrained. Zero-egress TPU
equivalent: point at an already-downloaded snapshot directory laid out the
standard diffusers way

    <root>/unet/diffusion_pytorch_model.safetensors (or .bin)
    <root>/vae/...
    <root>/text_encoder/...          [SDXL: + text_encoder_2/]
    <root>/tokenizer/                [SDXL: + tokenizer_2/]

and every component is converted into our functional params. Missing
components degrade gracefully (pipeline methods that need them raise with
guidance); only the UNet is required.
"""
from __future__ import annotations

import os
from typing import Optional

from dgq_tpu.models.qconfig import QConfig, QState
from dgq_tpu.pipeline.sd_pipeline import SDPipeline, SDXLTurboPipeline


def _load_sub(root: str, sub: str, convert):
    path = os.path.join(root, sub)
    if not os.path.isdir(path):
        return None
    from dgq_tpu.io.hf_loader import load_state_dict_any

    return convert(load_state_dict_any(path))


def _load_tokenizer(root: str, sub: str):
    path = os.path.join(root, sub)
    if not os.path.isdir(path):
        return None
    try:
        from transformers import CLIPTokenizer

        return CLIPTokenizer.from_pretrained(path)
    except Exception as e:
        # graceful degrade (the pipeline reports missing-tokenizer later),
        # but keep the real cause discoverable instead of swallowing it
        import logging

        logging.getLogger("dgq_tpu").warning(
            "tokenizer load failed at %s: %r", path, e)
        return None


def prepare_pipeline(
    model_type: str,
    snapshot_dir: str,
    unet_params: Optional[dict] = None,
    cfg: QConfig = QConfig(),
    qstate: Optional[QState] = None,
    time_aware: bool = False,
    base: Optional[int] = None,
):
    """Assemble an SDPipeline / SDXLTurboPipeline from a snapshot directory.

    unet_params overrides the snapshot UNet (pass quantize-folded params from
    the calibration flow); otherwise <root>/unet is converted. Returns the
    pipeline; raise points match the reference's behavior of failing only
    when a missing component is actually used."""
    from dgq_tpu.pipeline.text_encoder import hf_clip_text_to_params
    from dgq_tpu.pipeline.vae import hf_vae_to_params

    if unet_params is None:
        from dgq_tpu.cli.common import build_model

        _, unet_params, _, _, _ = build_model(
            model_type, base=base, hf_unet_path=os.path.join(snapshot_dir, "unet"))

    vae_params = _load_sub(snapshot_dir, "vae", hf_vae_to_params)
    text_params = _load_sub(snapshot_dir, "text_encoder", hf_clip_text_to_params)
    tokenizer = _load_tokenizer(snapshot_dir, "tokenizer")

    if model_type == "sd":
        return SDPipeline(
            unet_params=unet_params, text_params=text_params,
            vae_params=vae_params, tokenizer=tokenizer,
            cfg=cfg, qstate=qstate, time_aware=time_aware,
        )
    if model_type == "sdxl":
        text_params_2 = _load_sub(
            snapshot_dir, "text_encoder_2", hf_clip_text_to_params)
        tokenizer_2 = _load_tokenizer(snapshot_dir, "tokenizer_2")
        return SDXLTurboPipeline(
            unet_params=unet_params, vae_params=vae_params,
            text_params_l=text_params, text_params_g=text_params_2,
            tokenizer=tokenizer, tokenizer_2=tokenizer_2,
            cfg=cfg, qstate=qstate, time_aware=time_aware,
        )
    raise ValueError(f"unknown model type {model_type}")
