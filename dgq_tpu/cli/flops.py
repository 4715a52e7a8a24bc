"""Model cost CLI (reference `python diffusers_rewrite/sd.py flops unet`).

  python -m dgq_tpu.cli.flops --model sd
  python -m dgq_tpu.cli.flops --model sdxl --wq 4 --aq 8
"""
from __future__ import annotations

import argparse

from dgq_tpu.utils.flops import bops, spec_cost


def main():
    ap = argparse.ArgumentParser(description="DGQ-TPU model cost accounting")
    ap.add_argument("--model", default="sd", choices=["sd", "sdxl"])
    ap.add_argument("--wq", type=int, default=32)
    ap.add_argument("--aq", type=int, default=32)
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


if __name__ == "__main__":
    main()
