#!/usr/bin/env python
"""DGQ-TPU headline benchmark: SD v1.4 W4A8 images/sec/chip, 50-step DDIM,
512px (64x64 latents), CFG on — the BASELINE.json north-star metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

The quantized configuration is the deploy path: W4 weights fake-quant folded
at load, A8 per-tensor time-aware activation quantizers, real-time log2
softmax quantization in every attention (the DGQ g>1 trick policy,
scripts/quantize_act.sh:16-25 in the reference). Weights are random — image
throughput does not depend on weight values.

vs_baseline: the reference repo records no wall-clock numbers (BASELINE.md).
We compare against an estimated NVIDIA A6000 fp16 SD v1.4 throughput of
0.20 img/s for 50-step 512px single-image generation (~10 UNet it/s with CFG).
The denominator is anchored in BASELINE.md ("Baseline denominator") by
published A6000 SD it/s figures and a FLOPs x utilization cross-check; the
reference's fake-quant torch path is slower than fp16, so the estimate is
conservative in the reference's favor.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()  # ~/.cache/dgq_tpu_xla; survives across processes

A6000_REF_IMGS_PER_SEC = 0.20         # SD v1.4, 50-step 512px (estimate)
A6000_REF_SDXL_IMGS_PER_SEC = 0.40    # SDXL-turbo, 4-step 1024px (estimate)


def bench_sdxl(args):
    """SDXL-turbo W4A8 1024px (BASELINE config 5): 4-step Euler, guidance 0.

    --group N>1 runs the DGQ group-conv path on every k×k conv (the
    reference ships SDXL g=16 configs too, README.md:69-70)."""
    import functools

    import jax
    import jax.numpy as jnp

    from dgq_tpu.calib.weight_calib import (pack_attention_heads,
                                            quantize_model_weights)
    from dgq_tpu.models.qconfig import QConfig
    from dgq_tpu.models.unet_sd import init_unet_sd
    from dgq_tpu.models.unet_sdxl import sdxl_unet_spec, unet_sdxl_apply
    from dgq_tpu.pipeline.sampler import sdxl_turbo_sample
    from dgq_tpu.quant.scalers import Scaler

    dtype = jnp.bfloat16
    dev = jax.devices()[0]
    spec = sdxl_unet_spec()
    use_group = args.group > 1
    use_packed = not args.no_packed_attn and not args.no_pallas_attn and not args.int8
    cfg = QConfig(
        w_bits=args.wq, a_bits=args.aq, softmax_bits=args.aq,
        use_wq=True, use_aq=True,
        t2i_log_quant=True, t2i_real_time=True, t2i_start_peak=True,
        use_pallas_attention=not args.no_pallas_attn,
        use_int8_matmul=args.int8,
        use_int8_conv=args.int8_conv,
        int8_impl=args.int8_impl,
        fold_act_dequant=args.fold,
        packed_attention=use_packed,
    )
    if use_group:
        qstate_g, group_layers = _sd_group_qstate(spec, 0, False, dtype)
        cfg = cfg.replace(group_conv_layers=group_layers,
                          group_conv_impl=args.group_impl)
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), spec=spec, fast=True)
        params_q, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
        if use_packed:
            params_q = pack_attention_heads(params_q, spec,
                                            num_heads=lambda o: o // 64)
        params_q = jax.tree.map(
            lambda x: x.astype(dtype) if x is not None and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None,
        )
    params_q = jax.device_put(params_q, dev)
    jax.block_until_ready(params_q)
    del params
    print(f"W4 quantize+fold: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if use_group:
        qstate = qstate_g
    else:
        from dgq_tpu.utils.synthetic import synthetic_pertensor_qstate

        qstate = synthetic_pertensor_qstate(spec, 0, False, dtype)
    b = args.batch
    latents = jax.random.normal(jax.random.PRNGKey(1), (b, 128, 128, 4), dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 2048), dtype)
    te = jax.random.normal(jax.random.PRNGKey(3), (b, 1280), dtype)
    tid = jnp.tile(jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]], dtype), (b, 1))

    run = jax.jit(functools.partial(
        sdxl_turbo_sample, unet_apply=unet_sdxl_apply,
        num_inference_steps=args.steps, cfg=cfg,
    ))
    t0 = time.perf_counter()
    out = run(params_q, latents, ehs, te, tid, qstate=qstate)
    _ = np.asarray(jax.device_get(out)).sum()
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = run(params_q, latents, ehs, te, tid, qstate=qstate)
        _ = np.asarray(jax.device_get(out)).sum()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"times: {[f'{t:.2f}' for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": f"sdxl_turbo_w{args.wq}a{args.aq}_images_per_sec_per_chip_{args.steps}step_1024px",
        "value": round(b / best, 4),
        "unit": "img/s",
        "vs_baseline": round(b / best / A6000_REF_SDXL_IMGS_PER_SEC, 3),
        "extra": {"group": args.group, "baseline_estimated": True,
                  "fold_act_dequant": args.fold,
                  "pallas_attn": not args.no_pallas_attn,
                  "int8_mxu": args.int8, "int8_conv": args.int8_conv},
    }))


def _sd_group_qstate(spec, t_slots, time_aware, dtype):
    from dgq_tpu.utils.synthetic import synthetic_group_qstate

    return synthetic_group_qstate(spec, t_slots, time_aware, dtype)


def bench_sd(args):
    import functools

    import jax
    import jax.numpy as jnp

    from dgq_tpu.calib.weight_calib import (pack_attention_heads,
                                            quantize_model_weights)
    from dgq_tpu.models.qconfig import QConfig
    from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec
    from dgq_tpu.pipeline.sampler import sd_sample
    from dgq_tpu.pipeline.vae import init_vae_decoder, vae_decode
    from dgq_tpu.quant.scalers import Scaler

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    spec = sd_unet_spec()
    group_num = args.group
    use_group = group_num > 1
    use_packed = not args.no_packed_attn and not args.no_pallas_attn and not args.int8
    # g=1 policy disables the t2i softmax tricks (reference
    # scripts/quantize_act.sh:20-26); g>1 is the flagship DGQ config.
    # int8 MXU stays on in group mode for every layer with per-tensor scales
    # (linears, 1x1 convs) — only the k×k group convs take the group path.
    cfg = QConfig(
        w_bits=args.wq, a_bits=args.aq, softmax_bits=args.aq,
        use_wq=True, use_aq=True,
        t2i_log_quant=use_group, t2i_real_time=use_group,
        t2i_start_peak=use_group,
        use_pallas_attention=not args.no_pallas_attn,
        use_int8_matmul=args.int8,
        use_int8_conv=args.int8_conv,
        int8_impl=args.int8_impl,
        fold_act_dequant=args.fold,
        packed_attention=use_packed,
    )
    t_slots = args.steps
    time_aware = not args.no_time_aware
    if use_group:
        qstate, group_layers = _sd_group_qstate(
            spec, t_slots, time_aware, dtype)
        cfg = cfg.replace(group_conv_layers=group_layers,
                          group_conv_impl=args.group_impl)
    else:
        from dgq_tpu.utils.synthetic import synthetic_pertensor_qstate

        qstate = synthetic_pertensor_qstate(spec, t_slots, time_aware, dtype)
    t0 = time.perf_counter()
    # init + quantize + fold on the host CPU: local compiles, one pass; the
    # TPU only sees the final folded weights
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), dtype=jnp.float32, spec=spec, fast=True)
        params_q, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
        if use_packed:
            params_q = pack_attention_heads(params_q, spec, num_heads=8)
        params_q = jax.tree.map(
            lambda x: x.astype(dtype) if x is not None and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None,
        )
        vae_params = None
        if not args.no_vae:
            vae_params = init_vae_decoder(jax.random.PRNGKey(4), dtype=dtype)
    params_q = jax.device_put(params_q, dev)
    jax.block_until_ready(params_q)
    if vae_params is not None:
        vae_params = jax.device_put(vae_params, dev)
        jax.block_until_ready(vae_params)
    del params
    print(f"W4 quantize+fold: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    b = args.batch
    latents = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4), dtype)
    ehs_t = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768), dtype)
    ehs_u = jax.random.normal(jax.random.PRNGKey(3), (b, 77, 768), dtype)

    def sample_and_decode(params_q, latents, ehs_t, ehs_u, qstate, vae_params):
        lat = sd_sample(
            params_q, latents, ehs_t, ehs_u,
            num_inference_steps=args.steps, scheduler=args.scheduler,
            guidance_scale=7.5, cfg=cfg, time_aware=time_aware, qstate=qstate,
        )
        if vae_params is not None:
            return vae_decode(vae_params, lat)
        return lat

    run = jax.jit(sample_and_decode)

    # NOTE: block_until_ready does not reliably synchronize through the axon
    # tunnel; a device_get of a (tiny) slice forces real completion.
    t0 = time.perf_counter()
    out = run(params_q, latents, ehs_t, ehs_u, qstate, vae_params)
    _ = np.asarray(jax.device_get(out[:, :1, :1])).sum()
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = run(params_q, latents, ehs_t, ehs_u, qstate, vae_params)
        _ = np.asarray(jax.device_get(out[:, :1, :1])).sum()
        times.append(time.perf_counter() - t0)
    best = min(times)
    imgs_per_sec = b / best
    print(f"times: {[f'{t:.2f}' for t in times]}", file=sys.stderr)
    return imgs_per_sec


def main():
    t_start = time.perf_counter()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd", choices=["sd", "sdxl"])
    ap.add_argument("--batch", type=int, default=4, help="images per run (CFG doubles UNet batch)")
    ap.add_argument("--steps", type=int, default=None,
                    help="denoising steps (default: 50 for sd, 4 for sdxl)")
    ap.add_argument("--wq", type=int, default=4, choices=[4, 8],
                    help="weight bits (BASELINE configs use W4/W8)")
    ap.add_argument("--aq", type=int, default=8, choices=[6, 8],
                    help="activation bits (A6 = BASELINE config 4)")
    ap.add_argument("--scheduler", default="ddim", choices=["ddim", "pndm"])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--no-time-aware", action="store_true")
    ap.add_argument("--no-pallas-attn", action="store_true",
                    help="use the XLA materialized-softmax path")
    ap.add_argument("--int8", action="store_true", default=False,
                    help="int8 MXU Pallas matmuls for per-tensor-scale "
                         "linears/1x1 convs. Off by default: measured v5e "
                         "end-to-end, the Pallas custom call's fusion "
                         "barrier costs more than int8 compute saves "
                         "(g=1: 0.89 bf16 vs 0.75 img/s int8)")
    ap.add_argument("--no-int8", dest="int8", action="store_false")
    ap.add_argument("--int8-impl", default="xla", choices=["pallas", "xla"],
                    help="int8 matmul execution with --int8: 'xla' = native "
                         "s8 dot_general, shape-gated to where it measures "
                         "faster (64x64-level projections); 'pallas' = the "
                         "fused kernel (fusion-barrier-bound, slower e2e)")
    ap.add_argument("--int8-conv", action="store_true", default=False,
                    help="also run k×k convs as XLA s8 convs (measured "
                         "slower than bf16 on v5e; off by default)")
    ap.add_argument("--group", type=int, default=1,
                    help="DGQ group number (g>1 runs the group-conv path)")
    ap.add_argument("--group-impl", default="taps",
                    choices=["taps", "fused", "unfold", "im2col"],
                    help="group-conv execution. Measured v5e (g=8 50-step): "
                         "taps 0.646 img/s > fused Pallas kernel 0.61 > "
                         "unfold 0.36 — XLA's fused tap decomposition wins "
                         "(the pallas call forfeits producer fusion)")
    ap.add_argument("--no-vae", action="store_true",
                    help="exclude VAE decode from the timed step")
    ap.add_argument("--no-packed-attn", action="store_true",
                    help="ablation: disable the packed head-slot attention "
                         "layout (fold-time weight padding that removes the "
                         "head transpose/pad/slice around the fused kernel)")
    ap.add_argument("--fold", dest="fold", action="store_true", default=False,
                    help="ablation: enable the shifted-clip codes fold on "
                         "per-tensor layers (measured 2.5%% slower e2e on "
                         "v5e: 0.871 vs 0.894 img/s, in the round-3 headline "
                         "config without the softmax quantizer — the scale "
                         "epilogue breaks conv+bias fusion)")
    ap.add_argument("--no-fold", dest="fold", action="store_false",
                    help="(default) plain fused fake-quant deploy path")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the extra g8 measurement")
    args = ap.parse_args()
    # per-model default; an explicitly passed --steps is always honored
    if args.steps is None:
        args.steps = 4 if args.model == "sdxl" else 50
    if args.model == "sdxl":
        return bench_sdxl(args)

    import copy

    imgs_per_sec = bench_sd(args)
    # ablation switches are recorded so a --no-fold/--no-pallas-attn/
    # --no-time-aware run is distinguishable from the headline config in
    # captured BENCH json files
    extra = {
        "includes_vae_decode": not args.no_vae,
        "int8_mxu": args.int8,
        "int8_conv": args.int8_conv,
        "group": args.group,
        "fold_act_dequant": args.fold,
        "pallas_attn": not args.no_pallas_attn,
        "packed_attn": not args.no_packed_attn and not args.no_pallas_attn and not args.int8,
        "time_aware": not args.no_time_aware,
        "baseline_estimated": True,
    }
    if args.group > 1:
        extra["group_impl"] = args.group_impl
    elapsed = time.perf_counter() - t_start
    if args.group <= 1 and not args.headline_only and elapsed < 22 * 60:
        # also measure the g=8 flagship-quality config (group convs via the
        # tap-decomposed path + t2i softmax tricks). Skipped when the
        # headline already burned most of a plausible driver budget (cold
        # compile + contended host) so the JSON line always gets printed.
        g8 = copy.deepcopy(args)
        g8.group = 8
        try:
            extra["g8_img_per_sec"] = round(bench_sd(g8), 4)
        except Exception as e:  # report the headline even if g8 fails
            extra["g8_error"] = repr(e)[:200]
    elif args.group <= 1 and not args.headline_only:
        extra["g8_skipped"] = f"headline took {elapsed:.0f}s"

    print(json.dumps({
        "metric": f"sd14_w{args.wq}a{args.aq}_images_per_sec_per_chip_{args.steps}step_512px",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / A6000_REF_IMGS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
