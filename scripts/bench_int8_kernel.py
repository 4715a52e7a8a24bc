#!/usr/bin/env python
"""Micro-benchmark: Pallas int8 quantized matmul vs the XLA bf16 fake-quant
path on representative SD UNet linear shapes (CFG batch 8, 64x64..8x8 levels).

Usage: python scripts/bench_int8_kernel.py [--block-m N] [--block-n N]
"""
import argparse
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

from dgq_tpu.ops.pallas.int8_matmul import pack_weight_int8, quantized_matmul
from dgq_tpu.quant.affine import QParams, fake_quant

# (label, M, K, N): attention proj / FF shapes at each UNet level, batch 8
SHAPES = [
    ("attn64 proj", 8 * 4096, 320, 320),
    ("ff64 in", 8 * 4096, 320, 2560),
    ("ff64 out", 8 * 4096, 1280, 320),
    ("attn32 proj", 8 * 1024, 640, 640),
    ("ff32 in", 8 * 1024, 640, 5120),
    ("attn16 proj", 8 * 256, 1280, 1280),
    ("ff16 in", 8 * 256, 1280, 10240),
    ("xattn64 kv", 8 * 77, 768, 320),
]


def timeit(fn, *args, runs=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.device_get(out[..., :1, :1])).sum()  # axon sync
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    np.asarray(jax.device_get(out[..., :1, :1])).sum()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-m", type=int, default=256)
    ap.add_argument("--block-n", type=int, default=256)
    ap.add_argument("--runs", type=int, default=20)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    rng = np.random.RandomState(0)

    for label, m, k, n in SHAPES:
        x = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05, jnp.bfloat16)
        dx = jnp.asarray(0.05, jnp.float32)
        zx = jnp.asarray(0.0, jnp.float32)
        wq, wd, wz = pack_weight_int8(
            w.astype(jnp.float32), jnp.asarray(0.01), jnp.asarray(8.0), bits=4)
        bias = jnp.zeros((n,), jnp.float32)

        @jax.jit
        def bf16_path(x, w):
            xq = fake_quant(x, QParams(dx.astype(x.dtype), (zx + 128).astype(x.dtype)), 8)
            return jnp.dot(xq, w, preferred_element_type=jnp.float32).astype(x.dtype)

        @jax.jit
        def int8_path(x, wq, wd, wz, bias):
            return quantized_matmul(
                x, wq, wd, wz, dx, zx, bias,
                block_m=args.block_m, block_n=args.block_n,
                out_dtype=jnp.bfloat16)

        t_bf = timeit(bf16_path, x, w, runs=args.runs)
        t_i8 = timeit(int8_path, x, wq, wd, wz, bias, runs=args.runs)
        fl = 2 * m * k * n
        print(f"{label:14s} M={m:6d} K={k:5d} N={n:5d}  "
              f"bf16 {t_bf*1e6:8.1f}us ({fl/t_bf/1e12:6.1f} TF/s)  "
              f"int8 {t_i8*1e6:8.1f}us ({fl/t_i8/1e12:6.1f} TF/s)  "
              f"ratio {t_i8/t_bf:5.2f}x")


if __name__ == "__main__":
    main()
