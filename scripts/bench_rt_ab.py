#!/usr/bin/env python
"""A/B the two log2 real_time attention structures in-model, same process:
fused single pallas_call (phase grid + SMEM delta exchange) vs the two-call
form (stats kernel -> XLA reduce -> accumulate kernel). Times one CFG-batch-8
SD UNet forward per (config, impl)."""
import os
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from dgq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.calib.weight_calib import quantize_model_weights
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.quant.scalers import Scaler

B = 8


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
    from dgq_tpu.utils.synthetic import (synthetic_group_qstate,
                                         synthetic_pertensor_qstate)

    qstate = synthetic_pertensor_qstate(spec, 0, False, dtype)
    g_qstate, g_layers = synthetic_group_qstate(spec, 0, False, dtype)
    t2i = dict(t2i_log_quant=True, t2i_real_time=True, t2i_start_peak=True,
               use_pallas_attention=True)
    configs = [
        ("t2i, per-tensor convs", cfgq.replace(**t2i), qstate),
        ("g8 deploy (taps+t2i)",
         cfgq.replace(group_conv_layers=g_layers, **t2i), g_qstate),
    ]
    for impl in ("fused", "two_call"):
        os.environ["DGQ_RT_IMPL"] = impl
        for label, cfg, qs in configs:
            fn = jax.jit(lambda p, xx, tt, ee, q, c=cfg: unet_sd_apply(
                p, xx, tt, ee, qstate=q, cfg=c))
            dt = timeit(fn, (params_q, x, t, ehs, qs))
            print(f"{impl:9s} {label:26s} {dt*1e3:7.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
