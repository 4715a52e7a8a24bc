"""Weight PTQ CLI (reference src/quantize_weight.py).

Examples:
  python -m dgq_tpu.cli.quantize_weight --model sd --wq 4 --cali \\
      --cali_prompt_data_n 64 --step_size 25 --outdir results
  python -m dgq_tpu.cli.quantize_weight --model sd --wq 8 --no_recon --fast

Without HF weights/prompt data (zero-egress), synthetic prompt embeddings
drive the calibration loop — the full quantization machinery still runs and
produces a reference-format checkpoint.
"""
from __future__ import annotations

import argparse
import os

from dgq_tpu.cli.common import (
    add_quant_args,
    build_cali_data,
    build_model,
    model_type_from_env,
    pooled_dim_for,
    qconfig_from_args,
    setup_logging,
)


def parse_args():
    ap = argparse.ArgumentParser(description="DGQ-TPU weight quantization")
    ap.add_argument("--model", default=model_type_from_env(), choices=["sd", "sdxl"])
    ap.add_argument("--outdir", default="results")
    add_quant_args(ap)
    ap.add_argument("--use_aq", action="store_true",
                    help="also run vanilla activation calibration afterwards "
                         "(reference cali_model use_aq, calibration.py:199-206)")
    ap.add_argument("--running_stat", action="store_true", default=True)
    ap.add_argument("--no_running_stat", dest="running_stat", action="store_false")
    ap.add_argument("--cali", action="store_true", help="MSE scale init (else minmax)")
    ap.add_argument("--cali_prompt_data_n", type=int, default=64)
    ap.add_argument("--cali_data_path", default="./data/cali_data")
    ap.add_argument("--step_size", type=int, default=-1)
    ap.add_argument("--no_recon", action="store_true")
    ap.add_argument("--resume_w", default=None,
                    help="resume from an existing weight-only checkpoint "
                         "(skips reconstruction, continues into the "
                         "activation phase when --use_aq; reference "
                         "calibration.py:152-173)")
    ap.add_argument("--dp", type=int, default=1,
                    help="in-process data-parallel devices: calibration "
                         "batches shard over a (dp, tp) mesh and GSPMD "
                         "averages reconstruction gradients across devices "
                         "(the working form of the reference's disabled "
                         "multi-GPU path, quant/calibration.py:414-427)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel devices: weight out-channels "
                         "shard over the mesh tp axis")
    ap.add_argument("--partial_dir", default=None,
                    help="save one .pth per reconstruction unit as it "
                         "completes and resume by skipping units already "
                         "saved there (reference per-block saves, "
                         "calibration.py:456-466; verify with "
                         "`ckpt_tools check`)")
    ap.add_argument("--tib_recon", action="store_true",
                    help="jointly reconstruct the temporal-information block "
                         "(TFMQ; reference quant_model.py:25,48-49)")
    ap.add_argument("--recon_loss", default="mse",
                    choices=["mse", "fisher_diag", "fisher_full"],
                    help="reconstruction loss (reference RLOSS, "
                         "reconstruction_util.py:10-91)")
    ap.add_argument("--fast", action="store_true", help="minmax init")
    ap.add_argument("--debug", action="store_true",
                    help="= --fast, 4 prompts, 10 iters")
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--max_units", type=int, default=None,
                    help="limit the reconstruction walk to the first N units "
                         "(debug/smoke runs only)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--unet_weights", default=None,
                    help="path to torch UNet state dict (HF snapshot)")
    ap.add_argument("--base", type=int, default=None,
                    help="override model width (tiny smoke runs)")
    ap.add_argument("--latent_hw", type=int, default=None,
                    help="override latent size (tiny smoke runs)")
    args = ap.parse_args()
    if args.debug:
        args.fast = True
        args.cali_prompt_data_n = 4
        args.iters = 10
    if args.step_size < 0:
        args.step_size = 25 if args.model == "sd" else 4
    return args


def main():
    args = parse_args()
    from dgq_tpu.cli.common import maybe_init_multihost

    maybe_init_multihost(args)
    outpath, log = setup_logging(args.outdir)
    from dgq_tpu.calib.reconstruction import calibrate_weights
    from dgq_tpu.calib.weight_calib import init_weight_qparams
    from dgq_tpu.io.dgq_ckpt import save_weight_only
    from dgq_tpu.quant.scalers import Scaler

    spec, params, apply_fn, latent_hw, cross = build_model(
        args.model, base=args.base, seed=args.seed, hf_unet_path=args.unet_weights,
        sdxl_depths=args.sdxl_depths,
    )
    cfg = qconfig_from_args(args, use_wq=True)
    latent_hw = args.latent_hw or latent_hw

    mesh = None
    if args.dp > 1 or args.tp > 1:
        import jax

        from dgq_tpu.parallel.mesh import make_mesh, shard_params_tp

        if len(jax.devices()) < args.dp * args.tp:
            raise SystemExit(
                f"--dp {args.dp} --tp {args.tp} needs {args.dp * args.tp} "
                f"devices, found {len(jax.devices())}")
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        params = shard_params_tp(mesh, params)
        log.info(f"mesh: dp={args.dp} tp={args.tp} "
                 f"({args.dp * args.tp} devices, GSPMD grad averaging)")

    def cali_data_fn():
        from dgq_tpu.cli.common import cali_embeddings_from_args

        embeds, tag = cali_embeddings_from_args(
            args, args.model, cross, args.cali_prompt_data_n, args.seed,
            pooled_dim=pooled_dim_for(args.model, args.base))
        if tag:
            log.info(f"caption-conditioned calibration data ({args.prompt_path})")
        return build_cali_data(
            args.model, params, apply_fn, cross, args.cali_prompt_data_n,
            args.step_size, latent_hw, args.seed,
            cache_prefix=args.cali_data_path,
            pooled_dim=pooled_dim_for(args.model, args.base),
            embeds=embeds, embeds_tag=tag,
        )

    if args.resume_w:
        from dgq_tpu.io.dgq_ckpt import load_weight_only

        log.info(f"resuming from {args.resume_w}")
        params, wqp, alphas = load_weight_only(args.resume_w, spec)
        alphas = alphas or None
        path = os.path.join(outpath, "cali_ckpt.pth")
        if not args.use_aq:
            # no later phase requested: re-save to the new run dir (the
            # reference's resume_w end state, calibration.py:152-196)
            save_weight_only(f"{path}_weight_only", params, wqp, spec,
                             alphas=alphas)
            log.info(f"resumed checkpoint re-saved to {path}_weight_only")
    else:
        scaler = Scaler.MINMAX if (args.fast or not args.cali) else Scaler.MSE
        log.info(f"weight scale init: {scaler} w{args.wq}")
        wqp = init_weight_qparams(params, spec, args.wq, scaler)

        alphas = None
        if not args.no_recon:
            log.info("generating calibration data...")
            cali_data, interval = cali_data_fn()
            log.info(
                f"calibration set: {cali_data[0].shape[0]} samples, interval {interval}"
            )
            alphas = calibrate_weights(
                params, spec, cfg, wqp, cali_data, iters=args.iters,
                batch_size=8 if args.model == "sd" else 4,
                w=0.01, warmup=0.2, asym=True,
                unet_apply=apply_fn, progress=log.info,
                partial_dir=args.partial_dir, mesh=mesh,
                max_units=args.max_units,
                tib_recon=args.tib_recon, opt_mode=args.recon_loss,
            )
        path = os.path.join(outpath, "cali_ckpt.pth")
        save_weight_only(f"{path}_weight_only", params, wqp, spec, alphas=alphas)
        log.info(f"calibrated model saved to {path}_weight_only")

    if args.use_aq:
        # vanilla (non-group) activation calibration appended to the same
        # checkpoint — the reference's use_aq tail of cali_model. The
        # reference nests {'weight': {'weight': ...}} there (calibration.py
        # :199-200, a latent quirk its own loader never reads back); we write
        # the flat merged format its loader and ours both consume.
        from dgq_tpu.calib.act_calib import calibrate_activations
        from dgq_tpu.calib.weight_calib import fold_weight_quant
        from dgq_tpu.io.dgq_ckpt import save_merged

        cfg_aq = qconfig_from_args(args, use_wq=True, use_aq=True)
        params_q = fold_weight_quant(params, wqp, spec, cfg,
                                     alphas=alphas, soft=False)
        cali_data, interval = cali_data_fn()
        per_t, _ = calibrate_activations(
            params_q, spec, cfg_aq, cali_data, interval=interval,
            group_num=0, running_stat=args.running_stat,
            batch_size=8 if args.model == "sd" else 4,
            unet_apply=apply_fn, progress=log.info,
        )
        save_merged(path, params, wqp, spec, per_t, alphas=alphas)
        log.info(f"calibrated model (weight+act) saved to {path}")


if __name__ == "__main__":
    main()
