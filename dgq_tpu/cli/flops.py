"""Model cost CLI (reference `python diffusers_rewrite/sd.py flops unet`).

  python -m dgq_tpu.cli.flops --model sd
  python -m dgq_tpu.cli.flops --model sdxl --wq 4 --aq 8
  python -m dgq_tpu.cli.flops --model sd --roofline --batch 8 --steps 50
"""
from __future__ import annotations

import argparse

from dgq_tpu.utils.flops import bops, spec_cost, spec_roofline


def main():
    ap = argparse.ArgumentParser(description="DGQ-TPU model cost accounting")
    ap.add_argument("--model", default="sd", choices=["sd", "sdxl"])
    ap.add_argument("--wq", type=int, default=32)
    ap.add_argument("--aq", type=int, default=32)
    ap.add_argument("--roofline", action="store_true",
                    help="speed-of-light UNet step time on a TPU chip")
    ap.add_argument("--batch", type=int, default=8,
                    help="UNet batch (CFG-doubled latents) for --roofline")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg", type=int, default=2,
                    help="latents per image in the batch (2 = CFG pair)")
    ap.add_argument("--peak_tfs", type=float, default=197.0,
                    help="chip bf16 peak TF/s (v5e default)")
    ap.add_argument("--hbm_gbs", type=float, default=819.0,
                    help="chip HBM GB/s (v5e default)")
    args = ap.parse_args()

    if args.model == "sd":
        from dgq_tpu.models.unet_sd import sd_unet_spec

        spec, hw = sd_unet_spec(), 64
    else:
        from dgq_tpu.models.unet_sdxl import sdxl_unet_spec

        spec, hw = sdxl_unet_spec(), 128
    cost = spec_cost(spec, latent_hw=hw)
    print(f"#Params: {cost['params'] / 1e6:.4f} M")
    print(f"#MACs: {cost['macs'] / 1e9:.4f} G")
    print(f"#FLOPs: {cost['flops'] / 1e9:.4f} G")
    print(f"#BOPs: {bops(cost['macs'], args.wq, args.aq) / 1e12:.4f} T")

    if args.roofline:
        r = spec_roofline(spec, latent_hw=hw, batch=args.batch,
                          peak_tfs=args.peak_tfs, hbm_gbs=args.hbm_gbs,
                          attn_head_dim=64 if args.model == "sdxl" else None)
        print(f"\nRoofline, one UNet forward, batch {args.batch} "
              f"({args.peak_tfs:.0f} TF/s, {args.hbm_gbs:.0f} GB/s):")
        print(f"{'latent':>8} {'compute ms':>11} {'memory ms':>10} "
              f"{'SOL ms':>8} {'bound':>7}")
        for h, lv in r["per_scale"].items():
            bound = "MXU" if lv["compute_s"] > lv["memory_s"] else "HBM"
            print(f"{h:>6}px {lv['compute_s'] * 1e3:>11.2f} "
                  f"{lv['memory_s'] * 1e3:>10.2f} "
                  f"{lv['sol_s'] * 1e3:>8.2f} {bound:>7}")
        print(f"{'total':>8} {r['compute_s'] * 1e3:>11.2f} "
              f"{r['memory_s'] * 1e3:>10.2f} {r['sol_s'] * 1e3:>8.2f}")
        imgs = args.batch / args.cfg
        sol_img_s = imgs / (args.steps * r["sol_s"])
        print(f"SOL sampler throughput ({args.steps} steps, {imgs:.0f} "
              f"images/batch, UNet only): {sol_img_s:.3f} img/s")


if __name__ == "__main__":
    main()
