"""Ablation timing of one UNet denoising step on the TPU: which component
costs what. Not part of the public bench; a development tool."""
import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dgq_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dgq_tpu.calib.act_calib import act_qpoint_names
from dgq_tpu.calib.weight_calib import quantize_model_weights
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.quant.affine import QParams
from dgq_tpu.quant.scalers import Scaler


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = np.asarray(jax.device_get(out)).ravel()[0]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(out)).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    dtype = jnp.bfloat16
    spec = sd_unet_spec()

    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), dtype=jnp.float32, spec=spec)
        cfg_q = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True,
                        t2i_log_quant=True, t2i_real_time=True,
                        t2i_start_peak=True, use_pallas_attention=True)
        params_q, _ = quantize_model_weights(params, spec, cfg_q, Scaler.MINMAX)
        params_q = jax.tree.map(
            lambda x: x.astype(dtype) if x is not None and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None)
    params_q = jax.device_put(params_q, jax.devices()[0])

    qstate = {"a": {n: QParams(jnp.asarray(0.05, dtype), jnp.asarray(128.0, dtype))
                    for n in act_qpoint_names(spec)}, "sm": {}}
    b = args.batch
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 64, 64, 4), dtype)
    t = jnp.full((b,), 500, jnp.int32)
    ehs = jax.random.normal(jax.random.PRNGKey(2), (b, 77, 768), dtype)

    cfg_int8 = cfg_q.replace(use_int8_matmul=True)
    from dgq_tpu.calib.weight_calib import attach_int8_packed, init_weight_qparams
    with jax.default_device(jax.devices("cpu")[0]):
        wqp8 = init_weight_qparams(params, spec, cfg_q.w_bits, Scaler.MINMAX)
        params_q = attach_int8_packed(params_q, wqp8, spec, cfg_int8)
    params_q = jax.device_put(params_q, jax.devices()[0])

    variants = {
        "full_w4a8_int8": cfg_int8,
        "full_w4a8_pallas": cfg_q,
        "w4a8_xla_attn": cfg_q.replace(use_pallas_attention=False),
        "w4_only_pallas": cfg_q.replace(use_aq=False),
        "fp_pallas_attn": QConfig(use_pallas_attention=True),
        "fp_xla": QConfig(),
    }
    for name, cfg in variants.items():
        f = jax.jit(functools.partial(unet_sd_apply, cfg=cfg))
        qs = qstate if cfg.use_aq else None
        dt = timeit(lambda xx: f(params_q, xx, t, ehs, qstate=qs), x)
        gflops = 680 * b
        print(f"{name:22s} {dt*1000:8.1f} ms  ({gflops/dt/1000:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
