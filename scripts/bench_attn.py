"""Micro-benchmark of fused_attention variants at SD hot shapes on the TPU."""
import time

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dgq_tpu.ops.pallas.attention import fused_attention

SHAPES = [
    ("64px-self", 64, 4096, 4096, 40),
    ("32px-self", 64, 1024, 1024, 80),
    ("64px-cross", 64, 4096, 77, 40),
    ("32px-cross", 64, 1024, 77, 80),
]


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    _ = np.asarray(jax.device_get(out[:1, :1, :1])).sum()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _ = np.asarray(jax.device_get(out[:1, :1, :1])).sum()
    return (time.perf_counter() - t0) / n * 1000


def main():
    dt = jnp.bfloat16
    for name, bh, t, s, d in SHAPES:
        q = jax.random.normal(jax.random.PRNGKey(0), (bh, t, d), dt) * 0.3
        k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), dt) * 0.3
        v = jax.random.normal(jax.random.PRNGKey(2), (bh, s, d), dt)
        scale = d ** -0.5
        delta = jnp.asarray(1.0 / 255.0)
        for mode, kw in [
            ("none", {}),
            ("uniform", {"sm_delta": delta}),
            ("log2", {"sm_delta": delta}),
            ("uniform+sp", {"sm_delta": delta, "start_peak": True}),
            ("log2_real_time", {}),
            ("log2_real_time+sp", {"start_peak": True}),
            ("log2_real_time/2c", {"rt_impl": "two_call"}),
            ("log2_real_time+sp/2c", {"start_peak": True,
                                      "rt_impl": "two_call"}),
        ]:
            m = mode.replace("+sp", "").replace("/2c", "")
            bt = os.environ.get("BENCH_ATTN_BLOCK_T")
            if bt:
                kw = dict(kw, block_t=int(bt))
            try:
                ms = timeit(fused_attention, q, k, v, scale, sm_mode=m,
                            sm_bits=8, **kw)
                print(f"{name:10s} {mode:18s} {ms:7.2f} ms")
            except Exception as e:
                print(f"{name:10s} {mode:18s} FAIL {repr(e)[:120]}")


if __name__ == "__main__":
    main()
