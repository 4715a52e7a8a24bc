#!/usr/bin/env python
"""Single-UNet-forward ablation on the real chip: where does step time go?

Times one SD UNet forward (CFG batch, 64x64 latents) under:
  fp        — no quantization at all
  wq        — folded W4 weights only (same compute as fp; sanity)
  wq+aq     — + A8 per-tensor activation quant everywhere
  +pallas   — + fused attention kernel (the deploy config)
  +xla-attn — deploy config but materialized-softmax attention

Prints ms/forward and implied TFLOP/s. Run with nothing else on the TPU.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from dgq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dgq_tpu.calib.weight_calib import quantize_model_weights
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.quant.scalers import Scaler

B = 8  # CFG-doubled batch for 4 images
FLOPS = B * 391.5e9 * 2  # MACs per forward x2


def timeit(fn, args, runs=30):
    out = fn(*args)
    np.asarray(jax.device_get(out[:, :1, :1, :1])).sum()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    np.asarray(jax.device_get(out[:, :1, :1, :1])).sum()
    return (time.perf_counter() - t0) / runs


def main():
    dtype = jnp.bfloat16
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    spec = sd_unet_spec()

    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), spec=spec, fast=True)
        cfgq = QConfig(w_bits=4, a_bits=8, softmax_bits=8, use_wq=True,
                       use_aq=True)
        params_q, _ = quantize_model_weights(params, spec, cfgq, Scaler.MINMAX)
        params_q = jax.tree.map(
            lambda x: x.astype(dtype) if x is not None and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None)
    params_q = jax.device_put(params_q, dev)
    jax.block_until_ready(params_q)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4), dtype)
    t = jnp.full((B,), 500.0, dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768), dtype)
    from dgq_tpu.utils.synthetic import synthetic_pertensor_qstate

    qstate = synthetic_pertensor_qstate(spec, 0, False, dtype)

    from dgq_tpu.calib.weight_calib import pack_attention_heads

    # packed variants of the same folded weights (tiny one-time pads
    # on-device): pair-packed 64-wide slots (default) and 128-wide slots
    params_pk = pack_attention_heads(params_q, spec, num_heads=8, slot=64)
    params_pk128 = pack_attention_heads(params_q, spec, num_heads=8, slot=128)
    jax.block_until_ready((params_pk, params_pk128))

    if "--group" in sys.argv:
        # g=8 flagship decomposition: isolate the group-conv taps cost from
        # the t2i softmax-trick cost at the same build
        from dgq_tpu.utils.synthetic import synthetic_group_qstate

        g_qstate, g_layers = synthetic_group_qstate(spec, 0, False, dtype)
        t2i = dict(t2i_log_quant=True, t2i_real_time=True,
                   t2i_start_peak=True, use_pallas_attention=True)
        configs = [
            ("g8 deploy (taps+t2i)",
             cfgq.replace(group_conv_layers=g_layers, **t2i), g_qstate, False),
            ("g8 deploy PACKED",
             cfgq.replace(group_conv_layers=g_layers, packed_attention=True,
                          **t2i), g_qstate, True),
            ("g8 convs, uniform sm",
             cfgq.replace(group_conv_layers=g_layers,
                          use_pallas_attention=True), g_qstate, False),
            ("t2i, per-tensor convs", cfgq.replace(**t2i), qstate, False),
            ("g1 deploy (uniform sm)",
             cfgq.replace(use_pallas_attention=True), qstate, False),
        ]
        for label, cfg, qs, pk in configs:
            fn = jax.jit(lambda p, xx, tt, ee, q, c=cfg: unet_sd_apply(
                p, xx, tt, ee, qstate=q, cfg=c))
            dt = timeit(fn, (params_pk if pk else params_q, x, t, ehs, qs))
            print(f"{label:26s} {dt*1e3:7.2f} ms/fwd  {FLOPS/dt/1e12:6.1f} TF/s")
        return

    configs = [
        ("fp (no quant)", QConfig(), None),
        ("wq+aq xla-attn", cfgq, qstate),
        ("wq+aq +log2 xla-attn",
         cfgq.replace(t2i_log_quant=True, t2i_real_time=True,
                      t2i_start_peak=True), qstate),
        ("deploy (pallas attn)",
         cfgq.replace(t2i_log_quant=True, t2i_real_time=True,
                      t2i_start_peak=True, use_pallas_attention=True), qstate),
        ("deploy PACKED",
         cfgq.replace(t2i_log_quant=True, t2i_real_time=True,
                      t2i_start_peak=True, use_pallas_attention=True,
                      packed_attention=True), qstate),
        ("pallas attn, no aq", QConfig(use_pallas_attention=True), None),
        ("pallas attn PACKED, no aq",
         QConfig(use_pallas_attention=True, packed_attention=True), None),
        # the g=1 headline policy: t2i tricks OFF, softmax quant is the
        # static-delta uniform quantizer -> merged single-kernel attention
        ("g1 deploy (pallas, uniform sm)",
         cfgq.replace(use_pallas_attention=True), qstate),
        ("g1 deploy PACKED",
         cfgq.replace(use_pallas_attention=True, packed_attention=True),
         qstate),
        # deploy but with the attention-input quantizers (aqtizer_q/k/v)
        # removed — sizes the cost of quantizing q/k/v OUTSIDE the kernel
        ("deploy, no qkv aq",
         cfgq.replace(t2i_log_quant=True, t2i_real_time=True,
                      t2i_start_peak=True, use_pallas_attention=True),
         {"a": {n: qp for n, qp in qstate["a"].items()
                if not n.endswith(("aqtizer_q", "aqtizer_k", "aqtizer_v"))},
          "sm": {}}),
        # deploy with ONLY conv/linear input quantizers (no attention taps)
        ("deploy, conv/lin aq only",
         cfgq.replace(use_pallas_attention=True),
         {"a": {n: qp for n, qp in qstate["a"].items()
                if "aqtizer" not in n}, "sm": {}}),
    ]
    # every PACKED row at both slot widths: pair-packed 64 (default) and 128
    rows = []
    for label, cfg, qs in configs:
        if cfg.packed_attention:
            rows.append((label + " s64", cfg, qs, params_pk))
            rows.append((label + " s128", cfg, qs, params_pk128))
        else:
            rows.append((label, cfg, qs, params_q))
    for label, cfg, qs, pp in rows:
        fn = jax.jit(lambda p, xx, tt, ee, q, c=cfg: unet_sd_apply(
            p, xx, tt, ee, qstate=q, cfg=c))
        dt = timeit(fn, (pp, x, t, ehs, qs))
        print(f"{label:30s} {dt*1e3:7.2f} ms/fwd  {FLOPS/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
