#!/usr/bin/env python
"""Calibration-throughput benchmark: AdaRound block reconstruction speed.

The reference's dominant calibration cost is 20k Adam iterations per
reconstruction unit, run as a Python loop over torch ops
(quant/reconstruction.py:64-79, SURVEY hard part 4). Ours compiles the whole
loop as `lax.scan` inside one XLA program; this script measures iterations/s
on the real chip for a full-width SD resnet unit at the 64x64 level — the
largest (slowest) unit class — and reports the implied wall-clock for the
reference's full budget (20k iters x ~80 resnet-scale units).
"""
import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from dgq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dgq_jax_cache_tpu")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from dgq_tpu.calib.reconstruction import recon_units, reconstruct_unit
from dgq_tpu.calib.weight_calib import init_weight_qparams
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec
from dgq_tpu.quant.scalers import Scaler


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    spec = sd_unet_spec()  # full-width SD v1.4
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), fast=True, spec=spec)
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    unit = next(u for u in recon_units(spec) if u.kind == "resnet")
    print(f"unit: {unit.kind} {unit.layers}", file=sys.stderr)

    # the reference's cali set: 64 prompts x CFG = 128 samples at 64x64/C320
    n = 128
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 64, 64, 320), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(2), (n, 1280), jnp.float32)
    out = jax.random.normal(jax.random.PRNGKey(3), (n, 64, 64, 320), jnp.float32)

    t0 = time.perf_counter()
    alphas, losses = reconstruct_unit(
        jax.random.PRNGKey(0), unit, params, wqp, (x, temb), out, cfg,
        iters=iters, batch_size=8,
    )
    jax.block_until_ready(alphas)
    dt_cold = time.perf_counter() - t0
    assert np.isfinite(np.asarray(losses)).all()

    # second call hits the jit cache: steady-state iteration rate
    t0 = time.perf_counter()
    alphas, losses = reconstruct_unit(
        jax.random.PRNGKey(1), unit, params, wqp, (x, temb), out, cfg,
        iters=iters, batch_size=8,
    )
    jax.block_until_ready(alphas)
    dt = time.perf_counter() - t0
    per_iter = dt / iters
    print(f"cold (incl. compile): {dt_cold:.1f}s; warm: {dt:.1f}s "
          f"-> {per_iter*1e3:.2f} ms/iter, {1/per_iter:.0f} it/s",
          file=sys.stderr)
    full = 20000 * per_iter
    print(f"implied 20k-iter unit: {full/60:.1f} min steady state; "
          f"~80-unit full SD recon: {full*80/3600:.1f} h + one compile "
          f"per unit shape class", file=sys.stderr)


if __name__ == "__main__":
    main()
