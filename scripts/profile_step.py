#!/usr/bin/env python
"""Capture a device trace of one SD UNet deploy forward and aggregate
per-op time from the perfetto trace (no tensorboard needed).

Usage: python scripts/profile_step.py [--group] [--fp] [--top N]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dgq_tpu.calib.weight_calib import quantize_model_weights  # noqa: E402
from dgq_tpu.models.qconfig import QConfig  # noqa: E402
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply  # noqa: E402
from dgq_tpu.quant.scalers import Scaler  # noqa: E402

B = 8


def main():
    dtype = jnp.bfloat16
    spec = sd_unet_spec()
    packed = "--no-packed" not in sys.argv
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), spec=spec, fast=True)
        cfgq = QConfig(w_bits=4, a_bits=8, softmax_bits=8, use_wq=True,
                       use_aq=True, use_pallas_attention=True,
                       packed_attention=packed)
        params_q, _ = quantize_model_weights(params, spec, cfgq, Scaler.MINMAX)
        if packed:
            from dgq_tpu.calib.weight_calib import pack_attention_heads
            params_q = pack_attention_heads(params_q, spec, num_heads=8)
        params_q = jax.tree.map(
            lambda x: x.astype(dtype) if x is not None and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None)
    params_q = jax.device_put(params_q, jax.devices()[0])
    jax.block_until_ready(params_q)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4), dtype)
    t = jnp.full((B,), 500.0, dtype)
    ehs = jax.random.normal(jax.random.PRNGKey(2), (B, 77, 768), dtype)
    from dgq_tpu.utils.synthetic import synthetic_pertensor_qstate
    qstate = synthetic_pertensor_qstate(spec, 0, False, dtype)
    cfg = cfgq
    if "--group" in sys.argv:
        from dgq_tpu.utils.synthetic import synthetic_group_qstate
        qstate, g_layers = synthetic_group_qstate(spec, 0, False, dtype)
        cfg = cfgq.replace(group_conv_layers=g_layers, t2i_log_quant=True,
                           t2i_real_time=True, t2i_start_peak=True)
    if "--fp" in sys.argv:
        cfg, qstate = QConfig(use_pallas_attention=True), None

    fn = jax.jit(lambda p, xx, tt, ee, q: unet_sd_apply(
        p, xx, tt, ee, qstate=q, cfg=cfg))
    out = fn(params_q, x, t, ehs, qstate)
    np.asarray(jax.device_get(out[:, :1, :1, :1])).sum()

    logdir = "/tmp/dgq_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(params_q, x, t, ehs, qstate)
        np.asarray(jax.device_get(out[:, :1, :1, :1])).sum()

    time.sleep(1)
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # find device-side track pids (TPU op events)
    pid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        # only leaf op events: XLA op tracks have 'args' with long_name or hlo
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tid_name = e.get("tid")
        agg[name] += dur
        cnt[name] += 1
        total += dur
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 40
    print(f"process tracks: {pid_names}")
    print(f"total device-event time over 3 runs: {total:.1f} ms")
    for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/3:9.3f} ms/run  x{cnt[name]//3:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
