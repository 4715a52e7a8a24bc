#!/usr/bin/env python
"""Can the packed head-slot attention run with 64-wide slots? FINDING: no —
Pallas rejects 64-lane BlockSpec blocks ("last two dimensions ... divisible
by 8 and 128 respectively, or equal to the respective dimensions of the
overall array"); the unpacked kernel's 64-wide blocks only work because the
whole array's minor dim is 64. This dead end motivated the PAIR-packed
layout (two 64-wide head slots per 128-lane block, in-kernel value slicing)
that shipped instead — see ops/pallas/attention._fused_attention_packed.

Shapes: SD 512px 64px-level self-attention (B=8, T=S=4096, H=8, d=40).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dgq_tpu.ops.pallas.attention import fused_attention  # noqa: E402

B, T, H, D = 8, 4096, 8, 40
SCALE = D ** -0.5


def timeit(fn, *args, runs=20):
    out = fn(*args)
    np.asarray(jax.device_get(out)).sum()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    np.asarray(jax.device_get(out[:1, :1])).sum()
    return (time.perf_counter() - t0) / runs


def pack(x, dp):
    # (B, T, H, D) -> (B, T, H*dp) zero-padded head slots
    b, t, h, d = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    return jnp.reshape(xp, (b, t, h * dp))


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q4 = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
    k4 = jax.random.normal(kk, (B, T, H, D), jnp.bfloat16)
    v4 = jax.random.normal(kv, (B, T, H, D), jnp.bfloat16)

    modes = [("none", None), ("uniform", jnp.float32(1 / 255.0)),
             ("log2_real_time", None)]
    for dp in (128, 64):
        qp, kp, vp = pack(q4, dp), pack(k4, dp), pack(v4, dp)
        jax.block_until_ready((qp, kp, vp))
        for mode, delta in modes:
            try:
                fn = jax.jit(lambda a, b_, c, m=mode, d_=delta: fused_attention(
                    a, b_, c, SCALE, sm_mode=m, sm_bits=8, sm_delta=d_,
                    num_heads=H))
                dt = timeit(fn, qp, kp, vp)
                print(f"slot={dp:3d} mode={mode:15s} {dt*1e3:7.3f} ms")
            except Exception as e:
                print(f"slot={dp:3d} mode={mode:15s} FAILED: {repr(e)[:160]}")

    # correctness cross-check at slot 64 vs 128 (fp mode)
    try:
        o64 = fused_attention(pack(q4, 64), pack(k4, 64), pack(v4, 64),
                              SCALE, sm_mode="none", num_heads=H)
        o128 = fused_attention(pack(q4, 128), pack(k4, 128), pack(v4, 128),
                               SCALE, sm_mode="none", num_heads=H)
        a = np.asarray(jnp.reshape(o64, (B, T, H, 64))[..., :D])
        b_ = np.asarray(jnp.reshape(o128, (B, T, H, 128))[..., :D])
        print("max abs diff slot64 vs slot128:", np.abs(a - b_).max())
    except Exception as e:
        print("cross-check FAILED:", repr(e)[:200])


if __name__ == "__main__":
    main()
