#!/usr/bin/env python
"""Time the SD 512px VAE decode (4 latents) and aggregate its device trace —
the non-UNet share of the headline batch.

Usage: python scripts/profile_vae.py [--top N]
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

from dgq_tpu.pipeline.vae import init_vae_decoder, vae_decode  # noqa: E402


def main():
    dtype = jnp.bfloat16
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_vae_decoder(jax.random.PRNGKey(0), dtype=dtype)
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 4), dtype)

    fn = jax.jit(vae_decode)
    out = fn(params, lat)
    np.asarray(jax.device_get(out[:1, :1, :1])).sum()
    t0 = time.perf_counter()
    runs = 10
    for _ in range(runs):
        out = fn(params, lat)
    np.asarray(jax.device_get(out[:1, :1, :1])).sum()
    dt = (time.perf_counter() - t0) / runs
    print(f"vae_decode 4x512px: {dt*1e3:.1f} ms/batch "
          f"({dt/4*1e3:.1f} ms/img)")

    logdir = "/tmp/dgq_vae_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(params, lat)
        np.asarray(jax.device_get(out[:1, :1, :1])).sum()
    time.sleep(1)
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found")
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "XLA" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        agg[e.get("name", "")] += e.get("dur", 0) / 1e3
        cnt[e.get("name", "")] += 1
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25
    for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/3:9.3f} ms/run  x{cnt[name]//3:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
