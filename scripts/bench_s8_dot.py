#!/usr/bin/env python
"""Micro-benchmark: Mosaic s8 x s8 -> s32 dot vs bf16 dot at the attention
kernel's hot shapes (64px SD self-attention: per-grid-cell q-tile (512, D)
against K (4096, D), D = 40 padded to 64/128).

The question: does the v5e MXU actually deliver ~2x on s8 inside a Pallas
kernel at these shapes (small contraction dim for QK^T, small output dim for
PV)? This gates the int8 attention kernel design.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def qk_kernel(q_ref, k_ref, o_ref, *, block_s, n_iters, out_dtype):
    # emulate the stats loop: per-key-block dot, row-max reduce into acc
    q = q_ref[0]
    m = jnp.full((q.shape[0], 1), -1e30, jnp.float32)
    s_total = k_ref.shape[1]
    n_blocks = s_total // block_s

    def body(j, m):
        k = k_ref[0, pl.ds(j * block_s, block_s), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=out_dtype)
        return jnp.maximum(m, jnp.max(s.astype(jnp.float32), axis=1, keepdims=True))

    for _ in range(n_iters):
        m = body(0, m) if n_blocks == 1 else jax.lax.fori_loop(0, n_blocks, body, m)
    o_ref[0] = jnp.broadcast_to(m, o_ref.shape[1:]).astype(o_ref.dtype)


def pv_kernel(p_ref, v_ref, o_ref, *, block_s, n_iters, out_dtype):
    # emulate the accumulate loop: probs (bt, S) @ V (S, D)
    s_total = v_ref.shape[1]
    n_blocks = s_total // block_s
    d = v_ref.shape[2]
    bt = p_ref.shape[1]
    accd = jnp.float32 if out_dtype == jnp.float32 else jnp.int32

    def body(j, acc):
        p = p_ref[0, :, pl.ds(j * block_s, block_s)]
        v = v_ref[0, pl.ds(j * block_s, block_s), :]
        return acc + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=out_dtype)

    acc = jnp.zeros((bt, d), accd)
    for _ in range(n_iters):
        acc = jax.lax.fori_loop(0, n_blocks, body, acc) + acc * 0
    o_ref[0] = acc.astype(jnp.float32)


def run_qk(dtype, bh, t, s, d, bt, block_s, n_iters=8, runs=20):
    out_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    if dtype == jnp.int8:
        q = jax.random.randint(jax.random.PRNGKey(0), (bh, t, d), -127, 127, jnp.int8)
        k = jax.random.randint(jax.random.PRNGKey(1), (bh, s, d), -127, 127, jnp.int8)
    else:
        q = jax.random.normal(jax.random.PRNGKey(0), (bh, t, d), dtype)
        k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), dtype)
    fn = pl.pallas_call(
        functools.partial(qk_kernel, block_s=block_s, n_iters=n_iters,
                          out_dtype=out_dtype),
        grid=(bh, t // bt),
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, 128), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, 128), jnp.float32),
    )
    fn = jax.jit(fn)
    o = fn(q, k); np.asarray(jax.device_get(o[:1, :1, :1]))
    t0 = time.perf_counter()
    for _ in range(runs):
        o = fn(q, k)
    np.asarray(jax.device_get(o[:1, :1, :1]))
    dt = (time.perf_counter() - t0) / runs / n_iters
    flops = 2 * bh * t * s * d
    return dt, flops / dt / 1e12


def run_pv(dtype, bh, t, s, d, bt, block_s, n_iters=8, runs=20):
    out_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    if dtype == jnp.int8:
        p = jax.random.randint(jax.random.PRNGKey(0), (bh, t, s), -127, 127, jnp.int8)
        v = jax.random.randint(jax.random.PRNGKey(1), (bh, s, d), -127, 127, jnp.int8)
    else:
        p = jax.random.normal(jax.random.PRNGKey(0), (bh, t, s), dtype)
        v = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), dtype)
    fn = pl.pallas_call(
        functools.partial(pv_kernel, block_s=block_s, n_iters=n_iters,
                          out_dtype=out_dtype),
        grid=(bh, t // bt),
        in_specs=[
            pl.BlockSpec((1, bt, s), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
    )
    fn = jax.jit(fn)
    o = fn(p, v); np.asarray(jax.device_get(o[:1, :1, :1]))
    t0 = time.perf_counter()
    for _ in range(runs):
        o = fn(p, v)
    np.asarray(jax.device_get(o[:1, :1, :1]))
    dt = (time.perf_counter() - t0) / runs / n_iters
    flops = 2 * bh * t * s * d
    return dt, flops / dt / 1e12


def main():
    bh, t, s = 16, 4096, 4096  # subset of the 64 batch-heads to keep it fast
    print("== QK^T-like: (bt,D) x (S,D)^T, D = head_dim padded ==")
    for d in (64, 128):
        for dt_name, dtype in (("bf16", jnp.bfloat16), ("s8", jnp.int8)):
            for block_s in (1024, 4096):
                try:
                    sec, tf = run_qk(dtype, bh, t, s, d, 512, block_s)
                    print(f"D={d:4d} {dt_name:5s} block_s={block_s:5d}: "
                          f"{sec*1e3:7.3f} ms  {tf:6.1f} TF/s")
                except Exception as e:
                    print(f"D={d:4d} {dt_name:5s} block_s={block_s:5d}: FAIL {repr(e)[:120]}")
    print("== PV-like: (bt,S) x (S,D), contraction over S ==")
    for d in (64, 128):
        for dt_name, dtype in (("bf16", jnp.bfloat16), ("s8", jnp.int8)):
            for block_s in (1024, 4096):
                try:
                    sec, tf = run_pv(dtype, bh, t, s, d, 512, block_s)
                    print(f"D={d:4d} {dt_name:5s} block_s={block_s:5d}: "
                          f"{sec*1e3:7.3f} ms  {tf:6.1f} TF/s")
                except Exception as e:
                    print(f"D={d:4d} {dt_name:5s} block_s={block_s:5d}: FAIL {repr(e)[:120]}")


if __name__ == "__main__":
    main()
