"""DGQ group activation quantization CLI (reference src/quantize_act.py).

Loads a weight-only checkpoint, runs per-timestep activation calibration with
k-means grouping, writes cali_ckpt_activation_w{W}a{A}g{G}.pth.
"""
from __future__ import annotations

import argparse
import os

from dgq_tpu.cli.common import (
    add_quant_args,
    build_model,
    model_type_from_env,
    qconfig_from_args,
    setup_logging,
)


def parse_args():
    ap = argparse.ArgumentParser(description="DGQ-TPU group activation quantization")
    ap.add_argument("--model", default=model_type_from_env(), choices=["sd", "sdxl"])
    ap.add_argument("--outdir", default="results")
    add_quant_args(ap)
    ap.add_argument("--cali_ckpt", required=True, help="weight-only checkpoint")
    ap.add_argument("--group_num", type=int, default=8)
    ap.add_argument("--group_mode", default="minmax", choices=["minmax", "mean"])
    ap.add_argument("--cali_prompt_data_n", type=int, default=64)
    ap.add_argument("--cali_data_path", default="./data/cali_data")
    ap.add_argument("--step_size", type=int, default=-1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--base", type=int, default=None)
    ap.add_argument("--latent_hw", type=int, default=None)
    args = ap.parse_args()
    if args.step_size < 0:
        args.step_size = 25 if args.model == "sd" else 4
    return args


def main():
    args = parse_args()
    from dgq_tpu.cli.common import maybe_init_multihost

    maybe_init_multihost(args)
    outpath, log = setup_logging(args.outdir)
    from dgq_tpu.calib.act_calib import calibrate_activations
    from dgq_tpu.calib.weight_calib import fold_weight_quant
    from dgq_tpu.cli.common import build_cali_data, pooled_dim_for
    from dgq_tpu.io.dgq_ckpt import load_weight_only, save_act_ckpt
    from dgq_tpu.quant.scalers import Scaler

    # spec only — the weights come from the checkpoint below; random-
    # initializing the full model just to discard it costs minutes
    spec, _, apply_fn, latent_hw, cross = build_model(
        args.model, base=args.base, seed=args.seed,
        sdxl_depths=args.sdxl_depths, init_params=False,
    )
    cfg = qconfig_from_args(args, use_wq=True, use_aq=True)

    log.info(f"loading weight-only checkpoint {args.cali_ckpt}")
    params, wqp, alphas = load_weight_only(args.cali_ckpt, spec)
    params_q = fold_weight_quant(params, wqp, spec, cfg,
                                 alphas=alphas or None, soft=False)

    from dgq_tpu.cli.common import cali_embeddings_from_args

    embeds, tag = cali_embeddings_from_args(
        args, args.model, cross, args.cali_prompt_data_n, args.seed,
        pooled_dim=pooled_dim_for(args.model, args.base))
    if tag:
        log.info(f"caption-conditioned calibration data ({args.prompt_path})")
    cali_data, interval = build_cali_data(
        args.model, params, apply_fn, cross, args.cali_prompt_data_n,
        args.step_size, args.latent_hw or latent_hw, args.seed,
        cache_prefix=args.cali_data_path,
        pooled_dim=pooled_dim_for(args.model, args.base),
        embeds=embeds, embeds_tag=tag,
    )
    per_t, group_layers = calibrate_activations(
        params_q, spec, cfg, cali_data, interval=interval,
        group_num=args.group_num, group_mode=args.group_mode,
        batch_size=8 if args.model == "sd" else 4,
        scaler=Scaler.MINMAX, unet_apply=apply_fn, progress=log.info,
    )
    out = os.path.join(
        outpath, f"cali_ckpt_activation_w{args.wq}a{args.aq}g{args.group_num}.pth"
    )
    save_act_ckpt(out, per_t, spec)
    log.info(f"activation checkpoint saved to {out}")
    log.info(f"group conv layers: {len(group_layers)}")


if __name__ == "__main__":
    main()
