#!/usr/bin/env python
"""Block-size sweep for the PAIR-packed attention kernels at the SD 64px
self-attention shape (B=8, T=S=4096, H=8, ds=64) — the per-mode defaults
were measured on the unpacked/128-slot layouts; pair cells do 2x the work
per grid step, which shifts the launch-overhead/VMEM trade."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dgq_tpu.ops.pallas import attention as A  # noqa: E402

B, T, H, DS = 8, 4096, 8, 64
SCALE = 40 ** -0.5


def timeit(fn, *args, runs=20):
    out = fn(*args)
    np.asarray(jax.device_get(out[:1, :1])).sum()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    np.asarray(jax.device_get(out[:1, :1])).sum()
    return (time.perf_counter() - t0) / runs


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, T, H * DS), jnp.bfloat16) for kk in ks)
    delta = jnp.float32(1 / 255.0)

    for mode, sp_flag in (("uniform", False), ("log2_real_time", False),
                          ("log2_real_time", True)):
        for bt in (None, 256, 512, 1024, 2048):
            for bs in (None, 1024, 2048, 4096):
                if bt is None and bs is not None:
                    continue
                try:
                    fn = jax.jit(lambda a, b_, c, m=mode, s=sp_flag, t=bt, ss=bs:
                                 A.fused_attention(
                                     a, b_, c, SCALE, sm_mode=m, sm_bits=8,
                                     sm_delta=None if m == "log2_real_time" else delta,
                                     start_peak=s, block_t=t, block_s=ss,
                                     num_heads=H))
                    dt = timeit(fn, q, k, v)
                    print(f"{mode:15s} sp={int(sp_flag)} bt={str(bt):5s} "
                          f"bs={str(bs):5s} {dt*1e3:7.3f} ms")
                except Exception as e:
                    print(f"{mode:15s} sp={int(sp_flag)} bt={str(bt):5s} "
                          f"bs={str(bs):5s} FAIL {repr(e)[:80]}")


if __name__ == "__main__":
    main()
