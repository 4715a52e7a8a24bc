"""Shared CLI plumbing: model construction, weight loading, logging setup.

The reference configures models via the DIFFUSERS_REWRITE env var + argparse
(src/quantize_weight.py:27-98); we accept --model {sd,sdxl} directly and also
honor the env var for drop-in familiarity.
"""
from __future__ import annotations

import argparse
import datetime
import logging
import os
from typing import Optional

import jax

from dgq_tpu.utils.cache import enable_compilation_cache

# every CLI entry point funnels through this module; repeat invocations of
# the same model/config skip the multi-minute XLA compile
enable_compilation_cache()


def model_type_from_env(default: str = "sd") -> str:
    return os.environ.get("DIFFUSERS_REWRITE", default)


def setup_logging(outdir: str) -> tuple[str, logging.Logger]:
    os.makedirs(outdir, exist_ok=True)
    outpath = os.path.join(outdir, datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S"))
    os.makedirs(outpath, exist_ok=True)
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s -   %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO,
        handlers=[
            logging.FileHandler(os.path.join(outpath, "run.log")),
            logging.StreamHandler(),
        ],
    )
    return outpath, logging.getLogger("dgq_tpu")


def build_model(model_type: str, base: Optional[int] = None, seed: int = 0,
                hf_unet_path: Optional[str] = None,
                sdxl_depths: tuple = (2, 10),
                init_params: bool = True):
    """Returns (spec, params, unet_apply, latent_hw, cross_dim).

    hf_unet_path: directory with a torch state dict ('diffusion_pytorch_model
    .bin' or .pth) of the rewritten UNet — converted on load. Without it,
    random weights (useful only for smoke/benchmark runs).

    init_params=False skips weight materialization entirely (params=None) —
    for callers that immediately replace them from a checkpoint; the random
    init of the full-width model costs minutes of host RNG otherwise."""
    if model_type == "sd":
        from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply

        spec = sd_unet_spec(base=base or 320)
        apply_fn = unet_sd_apply
        latent_hw, cross = 64, 768
        init = init_unet_sd
    elif model_type == "sdxl":
        from dgq_tpu.models.unet_sdxl import sdxl_unet_spec, unet_sdxl_apply
        from dgq_tpu.models.unet_sd import init_unet_sd as init

        spec = sdxl_unet_spec(base=base or 320, depths=tuple(sdxl_depths))
        apply_fn = unet_sdxl_apply
        latent_hw, cross = 128, 2048
    else:
        raise ValueError(f"unknown model type {model_type}")

    if hf_unet_path:
        from dgq_tpu.io.convert import torch_unet_to_params
        from dgq_tpu.io.hf_loader import load_state_dict_any

        params = torch_unet_to_params(load_state_dict_any(hf_unet_path), spec)
    elif init_params:
        params = init(jax.random.PRNGKey(seed), spec=spec)
    else:
        params = None
    return spec, params, apply_fn, latent_hw, cross


def pooled_dim_for(model_type: str, base: Optional[int] = None) -> int:
    """SDXL pooled text-embedding width: add_embedding.linear_1's input is
    [pooled, 6*add_ch] with pooled == temb_dim == 4*base (sdxl.py:520-523,
    1280 for the real model)."""
    return 4 * (base or 320)


def _params_fingerprint(params: dict) -> str:
    """Content hash of the weight pytree for calibration-cache keys: tree
    structure (paths/shapes) plus a strided value sample per leaf — a few KB
    hashed, yet it distinguishes synthetic seeds, different checkpoints, and
    different model widths/depths, all of which change the generated data."""
    import hashlib

    import numpy as np

    h = hashlib.md5()
    pairs = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in sorted(pairs, key=lambda kv: str(kv[0])):
        h.update(str(path).encode())
        h.update(str(leaf.shape).encode())
        size = leaf.size
        stride = max(1, size // 16)
        if isinstance(leaf, np.ndarray):
            sample = leaf.ravel()[::stride][:17]
        else:
            # device array: slice ON device so only the 17-element sample
            # crosses to host, not the full (possibly GB-scale) tensor
            sample = jax.device_get(leaf.reshape(-1)[::stride][:17])
        h.update(np.ascontiguousarray(sample, dtype=np.float64).tobytes())
    return h.hexdigest()[:12]


def load_prompts(path: str, num: int, seed: Optional[int] = None) -> list:
    """Calibration prompts from a COCO annotations json (the reference's
    protocol, src/dataset_generation.py:12-19: sample `num` captions) or a
    plain-text file (one prompt per line)."""
    if path.endswith(".json"):
        from dgq_tpu.calib.data import get_coco_prompts

        return get_coco_prompts(path, num, seed=seed)
    import random

    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if len(lines) <= num:
        return lines
    return random.Random(seed).sample(lines, num)


def encode_cali_prompts(
    model_type: str,
    prompts: list,
    text_weights: str,
    tokenizer_path: str,
    text_weights_2: Optional[str] = None,
    tokenizer_2_path: Optional[str] = None,
    batch_size: int = 16,
):
    """Run real captions through the CLIP text encoder(s) for calibration
    data generation (reference src/dataset_generation.py:21-58 routes them
    through the FP pipeline's prompt encoding).

    SD: returns (text, uncond) — conditional plus empty-prompt embeddings,
    the CFG pair the pipeline feeds the UNet. SDXL-turbo (guidance 0):
    returns (ehs, pooled) from the dual-encoder scheme."""
    import jax.numpy as jnp

    from transformers import CLIPTokenizer

    from dgq_tpu.io.hf_loader import load_state_dict_any
    from dgq_tpu.pipeline.text_encoder import (
        clip_meta_from_params,
        clip_text_encode,
        hf_clip_text_to_params,
        sdxl_encode_prompt,
    )

    tok = CLIPTokenizer.from_pretrained(tokenizer_path)

    def ids_of(tk, texts):
        return tk(texts, padding="max_length", max_length=77, truncation=True,
                  return_tensors="np").input_ids

    params = hf_clip_text_to_params(load_state_dict_any(text_weights))
    layers, heads = clip_meta_from_params(params)
    if model_type == "sd":
        import numpy as np

        texts, unconds = [], []
        for i in range(0, len(prompts), batch_size):
            chunk = list(prompts[i : i + batch_size])
            texts.append(np.asarray(clip_text_encode(
                params, jnp.asarray(ids_of(tok, chunk)), layers, heads)))
            unconds.append(np.asarray(clip_text_encode(
                params, jnp.asarray(ids_of(tok, [""] * len(chunk))),
                layers, heads)))
        return (jnp.asarray(np.concatenate(texts)),
                jnp.asarray(np.concatenate(unconds)))
    tok2 = (CLIPTokenizer.from_pretrained(tokenizer_2_path)
            if tokenizer_2_path else tok)
    params2 = (hf_clip_text_to_params(load_state_dict_any(text_weights_2))
               if text_weights_2 else params)
    layers2, heads2 = clip_meta_from_params(params2)
    import numpy as np

    ehss, pooleds = [], []
    for i in range(0, len(prompts), batch_size):
        chunk = list(prompts[i : i + batch_size])
        ehs, pooled = sdxl_encode_prompt(
            params, params2, jnp.asarray(ids_of(tok, chunk)),
            jnp.asarray(ids_of(tok2, chunk)),
            layers_l=layers, heads_l=heads,
            layers_g=layers2, heads_g=heads2,
            eos_id=tok2.eos_token_id,
        )
        ehss.append(np.asarray(ehs))
        pooleds.append(np.asarray(pooled))
    return jnp.asarray(np.concatenate(ehss)), jnp.asarray(np.concatenate(pooleds))


def cali_embeddings_from_args(args, model_type: str, cross: int,
                              n_prompts: int, seed: int,
                              pooled_dim: Optional[int] = None):
    """Resolve the calibration prompt embeddings for a CLI invocation:
    real captions through real text-encoder weights when --prompt_path /
    --text_weights / --tokenizer are given (the reference's COCO-caption
    protocol), synthetic embeddings otherwise (zero-egress fallback).

    Returns (embeds_pair, tag) where tag feeds the cache key ('' for the
    synthetic path, a content hash for real embeddings)."""
    prompt_path = getattr(args, "prompt_path", None)
    if prompt_path:
        missing = [f for f in ("text_weights", "tokenizer")
                   if not getattr(args, f, None)]
        if missing:
            raise SystemExit(
                f"--prompt_path requires --{' --'.join(missing)} "
                "(caption-conditioned calibration needs the text encoder)")
        prompts = load_prompts(prompt_path, n_prompts, seed=seed)
        pair = encode_cali_prompts(
            model_type, prompts, args.text_weights, args.tokenizer,
            text_weights_2=getattr(args, "text_weights_2", None),
            tokenizer_2_path=getattr(args, "tokenizer_2", None),
        )
        tag = "_c" + _params_fingerprint({"t": pair[0], "u": pair[1]})
        return pair, tag
    if model_type == "sd":
        from dgq_tpu.calib.data import synthetic_prompt_embeddings

        return synthetic_prompt_embeddings(n_prompts, dim=cross, seed=seed), ""
    from dgq_tpu.calib.data import synthetic_sdxl_embeddings

    return synthetic_sdxl_embeddings(
        n_prompts, dim=cross,
        pooled_dim=pooled_dim or pooled_dim_for(model_type), seed=seed,
    ), ""


def build_cali_data(
    model_type: str,
    params: dict,
    apply_fn,
    cross: int,
    n_prompts: int,
    steps: int,
    latent_hw: int,
    seed: int,
    cache_path: Optional[str] = None,
    pooled_dim: Optional[int] = None,
    cache_prefix: Optional[str] = None,
    embeds: Optional[tuple] = None,
    embeds_tag: str = "",
):
    """Generate (or load cached) calibration data for either model family.

    Returns (cali_data, interval) where cali_data is the positional UNet
    batch tuple: SD (lmi, t, ehs) with CFG doubling; SDXL-turbo
    (lmi, t, ehs, text_embeds, time_ids) at guidance 0.

    embeds: prompt embeddings pair — SD (text, uncond), SDXL (ehs, pooled) —
    from real captions via encode_cali_prompts; None uses synthetic
    embeddings (zero-egress fallback). embeds_tag distinguishes cache
    entries for different real-prompt sets.

    cache_prefix derives the cache filename HERE, from the actual generation
    inputs (prompts/steps/resolution/seed and a content fingerprint of the
    weights) — the single place that can keep the key in sync with what
    changes the data. cache_path overrides it verbatim (tests)."""
    if cache_path is None and cache_prefix is not None:
        cache_path = (
            f"{cache_prefix}_{model_type}_{steps}steps_n{n_prompts}"
            f"_hw{latent_hw}_s{seed}_p{_params_fingerprint(params)}"
            f"{embeds_tag}.npz")
    if model_type == "sd":
        from dgq_tpu.calib.data import (
            generate_sd_cali_data,
            synthetic_prompt_embeddings,
        )

        text, uncond = embeds or synthetic_prompt_embeddings(
            n_prompts, dim=cross, seed=seed)
        return generate_sd_cali_data(
            params, text, uncond, steps=steps, scheduler="pndm",
            latent_hw=latent_hw, seed=seed, cache_path=cache_path,
            unet_apply=apply_fn,
        )
    from dgq_tpu.calib.data import (
        generate_sdxl_cali_data,
        synthetic_sdxl_embeddings,
    )

    text, pooled = embeds or synthetic_sdxl_embeddings(
        n_prompts, dim=cross, pooled_dim=pooled_dim or pooled_dim_for(model_type),
        seed=seed,
    )
    return generate_sdxl_cali_data(
        params, text, pooled, steps=steps, latent_hw=latent_hw, seed=seed,
        cache_path=cache_path, unet_apply=apply_fn,
    )


def parse_depths(s: str) -> tuple:
    return tuple(int(x) for x in s.split(","))


def add_quant_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--sdxl_depths", type=parse_depths, default=(2, 10),
                    help="SDXL transformer depths 'lo,hi' (tiny smoke runs)")
    ap.add_argument("--wq", type=int, default=4, help="weight bits")
    ap.add_argument("--aq", type=int, default=8, help="activation bits")
    ap.add_argument("--softmax_a_bit", type=int, default=8)
    ap.add_argument("--t2i_log_quant", action="store_true")
    ap.add_argument("--t2i_real_time", action="store_true")
    ap.add_argument("--t2i_start_peak", action="store_true")
    ap.add_argument("--time_aware_aqtizer", action="store_true")
    ap.add_argument("--group_impl", default="taps",
                    choices=["taps", "fused", "unfold", "im2col"],
                    help="group-conv execution path (taps = fastest measured "
                         "on v5e; fused = Pallas kernel; unfold = reference-"
                         "verbatim im2col, used during group calibration)")
    ap.add_argument("--pallas_attn", action="store_true",
                    help="fused flash-attention kernel with in-kernel "
                         "softmax quantization (TPU deploy path)")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize the multi-process JAX runtime before "
                         "any device use (JAX_COORDINATOR_ADDRESS / SLURM "
                         "env; the reference's linklink init, "
                         "linklink/__init__.py:21-59)")
    ap.add_argument("--prompt_path", default=None,
                    help="calibration captions: COCO annotations json "
                         "(reference src/dataset_generation.py:12-19) or a "
                         "plain-text file, one prompt per line; requires "
                         "--text_weights/--tokenizer. Default: synthetic "
                         "embeddings (zero-egress fallback)")
    ap.add_argument("--text_weights", default=None,
                    help="CLIP text encoder state dict (file or HF snapshot "
                         "dir) for caption-conditioned calibration")
    ap.add_argument("--tokenizer", default=None,
                    help="HF CLIPTokenizer directory (vocab.json/merges.txt)")
    ap.add_argument("--text_weights_2", default=None,
                    help="[sdxl] second text encoder (OpenCLIP-bigG "
                         "WithProjection state dict)")
    ap.add_argument("--tokenizer_2", default=None,
                    help="[sdxl] tokenizer for the second encoder")


def maybe_init_multihost(args) -> None:
    """Call before first jax device use when --multihost was requested."""
    if getattr(args, "multihost", False):
        from dgq_tpu.parallel.mesh import init_multihost

        if not init_multihost():
            raise RuntimeError(
                "--multihost set but no coordinator found: set "
                "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID "
                "or run under SLURM/OpenMPI")


def qconfig_from_args(args, use_wq=True, use_aq=False):
    from dgq_tpu.models.qconfig import QConfig

    return QConfig(
        w_bits=args.wq, a_bits=args.aq, softmax_bits=args.softmax_a_bit,
        use_wq=use_wq, use_aq=use_aq,
        t2i_log_quant=args.t2i_log_quant, t2i_real_time=args.t2i_real_time,
        t2i_start_peak=args.t2i_start_peak,
        group_conv_impl=getattr(args, "group_impl", "taps"),
        use_pallas_attention=getattr(args, "pallas_attn", False),
    )
