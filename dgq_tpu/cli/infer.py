"""Quantized inference CLI (reference src/inference_qmodel.py): generate the
FP image then the quantized image for one prompt, identical seeds, for
side-by-side comparison.
"""
from __future__ import annotations

import argparse
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.cli.common import (
    add_quant_args,
    build_model,
    model_type_from_env,
    qconfig_from_args,
)


def parse_args():
    ap = argparse.ArgumentParser(description="DGQ-TPU quantized inference")
    ap.add_argument("--model", default=model_type_from_env(), choices=["sd", "sdxl"])
    add_quant_args(ap)
    ap.add_argument("--prompt", default="a painting of a virus monster playing guitar")
    ap.add_argument("--cali_ckpt", default=None, help="weight-only or merged ckpt")
    ap.add_argument("--use_aq", action="store_true")
    ap.add_argument("--use_group", action="store_true")
    ap.add_argument("--num_inference_steps", type=int, default=-1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fp16", action="store_true", help="run in bfloat16")
    # --text_weights/--text_weights_2/--tokenizer/--tokenizer_2 come from
    # add_quant_args (shared with the calibration CLIs)
    ap.add_argument("--unet_weights", default=None)
    ap.add_argument("--vae_weights", default=None, help="HF VAE dir")
    ap.add_argument("--base", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--outdir", default=".")
    return ap.parse_args()


def main():
    args = parse_args()
    from dgq_tpu.cli.common import maybe_init_multihost

    maybe_init_multihost(args)
    steps = args.num_inference_steps
    if steps < 0:
        steps = 25 if args.model == "sd" else 4

    from dgq_tpu.calib.act_calib import stack_time_qstates
    from dgq_tpu.calib.weight_calib import fold_weight_quant
    from dgq_tpu.io.dgq_ckpt import load_merged
    from dgq_tpu.pipeline.sd_pipeline import SDPipeline
    from dgq_tpu.calib.data import synthetic_prompt_embeddings

    spec, params, apply_fn, latent_hw, cross = build_model(
        args.model, base=args.base, seed=args.seed, hf_unet_path=args.unet_weights,
        sdxl_depths=args.sdxl_depths,
    )
    cfg = qconfig_from_args(args, use_wq=True, use_aq=args.use_aq)

    qstate = None
    time_aware = False
    if args.cali_ckpt:
        p2, wqp, alphas, per_t, group_layers = load_merged(args.cali_ckpt, spec)
        if p2 is not None:
            params = p2
        params_q = fold_weight_quant(params, wqp or {}, spec, cfg,
                                     alphas=alphas or None, soft=False)
        if args.use_group and group_layers:
            cfg = cfg.replace(group_conv_layers=group_layers)
        if args.use_aq and per_t:
            if args.time_aware_aqtizer and len(per_t) > 1:
                qstate = stack_time_qstates(per_t)
                time_aware = True
            else:
                qstate = per_t["act_0"]
    else:
        from dgq_tpu.calib.weight_calib import quantize_model_weights
        from dgq_tpu.quant.scalers import Scaler

        params_q, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)

    # text encoder / VAE (optional local weights)
    text_params = text_params_2 = vae_params = tokenizer = tokenizer_2 = None
    if args.text_weights:
        from dgq_tpu.io.hf_loader import load_state_dict_any
        from dgq_tpu.pipeline.text_encoder import hf_clip_text_to_params

        text_params = hf_clip_text_to_params(load_state_dict_any(args.text_weights))
    if args.text_weights_2:
        from dgq_tpu.io.hf_loader import load_state_dict_any
        from dgq_tpu.pipeline.text_encoder import hf_clip_text_to_params

        text_params_2 = hf_clip_text_to_params(
            load_state_dict_any(args.text_weights_2))
    if args.vae_weights:
        from dgq_tpu.io.hf_loader import load_state_dict_any
        from dgq_tpu.pipeline.vae import hf_vae_to_params

        vae_params = hf_vae_to_params(load_state_dict_any(args.vae_weights))
    if args.tokenizer:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer)
    if args.tokenizer_2:
        from transformers import CLIPTokenizer

        tokenizer_2 = CLIPTokenizer.from_pretrained(args.tokenizer_2)

    if args.fp16:
        params_q = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None,
        )

    def run(p, c, qs, ta, tag):
        hw = dict(
            height=args.height or (512 if args.model == "sd" else 1024),
            width=args.width or (512 if args.model == "sd" else 1024),
        )
        if args.model == "sdxl":
            from dgq_tpu.calib.data import synthetic_sdxl_embeddings
            from dgq_tpu.cli.common import pooled_dim_for
            from dgq_tpu.pipeline.sd_pipeline import SDXLTurboPipeline

            pipe = SDXLTurboPipeline(
                unet_params=p, vae_params=vae_params, cfg=c, qstate=qs,
                time_aware=ta, unet_apply=apply_fn,
                text_params_l=text_params, text_params_g=text_params_2,
                tokenizer=tokenizer, tokenizer_2=tokenizer_2,
            )
            if None not in (tokenizer, tokenizer_2, text_params, text_params_2):
                imgs = pipe([args.prompt] * 2, steps=steps, seed=args.seed, **hw)
            else:
                text, pooled = synthetic_sdxl_embeddings(
                    2, dim=cross,
                    pooled_dim=pooled_dim_for(args.model, args.base),
                    seed=args.seed,
                )
                imgs = pipe.generate_from_embeddings(
                    text, pooled, steps=steps, seed=args.seed, **hw
                )
        else:
            pipe = SDPipeline(
                unet_params=p, text_params=text_params, vae_params=vae_params,
                tokenizer=tokenizer, cfg=c, qstate=qs, time_aware=ta,
                unet_apply=apply_fn,
            )
            if tokenizer is not None and text_params is not None:
                imgs = pipe([args.prompt] * 2, steps=steps, seed=args.seed, **hw)
            else:
                text, uncond = synthetic_prompt_embeddings(2, dim=cross, seed=args.seed)
                imgs = pipe.generate_from_embeddings(
                    text, uncond, steps=steps, seed=args.seed,
                    scheduler="pndm", **hw,
                )
        for i in range(imgs.shape[0]):
            name = f"tmp_{args.model}_{args.prompt.replace(' ', '_')}_{i}_{tag}"
            out = os.path.join(args.outdir, name + ".npy")
            np.save(out, imgs[i])
            print(f"saved {out}")
            if imgs.dtype == np.uint8:
                try:
                    from PIL import Image

                    Image.fromarray(imgs[i]).save(
                        os.path.join(args.outdir, name + ".png"))
                except ImportError:
                    pass

    from dgq_tpu.models.qconfig import QConfig

    run(params, QConfig(), None, False, "fp")
    if args.use_group:
        # group count isn't recoverable from the ckpt (deltas are saved
        # per-channel-expanded, §2.3); recover it from the reference-format
        # filename `...w{W}a{A}g{G}.pth` when present.
        m = re.search(r"g(\d+)", os.path.basename(args.cali_ckpt or ""))
        gtag = f"g{m.group(1)}" if m else "g"
    else:
        gtag = "g1"
    tag = f"w{args.wq}a{args.aq if args.use_aq else 32}{gtag}"
    run(params_q, cfg, qstate, time_aware, tag)


if __name__ == "__main__":
    main()
