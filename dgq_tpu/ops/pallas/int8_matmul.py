"""Fused quantize -> int8 MXU matmul -> dequantize Pallas kernel.

The deploy path for W4/W8 x A8 linears with per-tensor activation scales
(the DGQ g=1 configuration). Replaces the fake-quant bf16 path with real
integer compute: the v5e MXU runs int8 x int8 -> int32 at 2x bf16 throughput.

Math (all per output column o, contraction k):
    x_dq = dx * (xq - zx),  w_dq = dw[o] * (wq[:,o] - zw[o])
    y[m,o] = dx*dw[o] * ( SUM_k xq*wq
                          - zx * wsum[o]          # wsum = SUM_k wq[k,o]
                          - zw[o] * xsum[m]       # xsum = SUM_k xq[m,k]
                          + K * zx * zw[o] )
xq is computed in-kernel from the bf16 input (clamp(round(x/dx)+zx, 0, 255),
stored int8 with a -128 recentering folded into the constants); wq/wsum are
precomputed at load time (weights are static).

Kernel layout: grid over (M/BM, N/BN), full-K tiles in VMEM (UNet linears
have K <= 5120, so a (BM, K) int8 tile is small); accumulation in int32 on
the MXU, epilogue on the VPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, wq_ref, scal_ref, wsum_ref, dwzw_ref, bias_ref, o_ref):
    """One (BM, BN) output tile.

    scal_ref (SMEM): [dx, zx_recentered, K, nb, pb] where zx_recentered =
    zx - 2^(a_bits-1) and [nb, pb] are the recentered clip bounds
    (A8: [-128,127]; A6: [-32,31]). wq codes are recentered the same way.
    """
    dx = scal_ref[0, 0]
    zx = scal_ref[0, 1]
    kdim = scal_ref[0, 2]
    nb = scal_ref[0, 3]
    pb = scal_ref[0, 4]

    x = x_ref[:].astype(jnp.float32)
    # quantize activations to recentered int8 codes
    xq = jnp.clip(jnp.round(x / dx) + zx, nb, pb).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    xsum = jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)  # (BM,1)
    wsum = wsum_ref[:]            # (1, BN) = SUM_k wq (recentered codes)
    dw = dwzw_ref[0:1, :]         # (1, BN) per-out-channel weight scale
    zw = dwzw_ref[1:2, :]         # (1, BN) recentered weight zero point

    y = dx * dw * (acc - zx * wsum - zw * xsum + kdim * zx * zw)
    y = y + bias_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "a_bits", "interpret")
)
def quantized_matmul(
    x: jax.Array,                 # (M, K) float (bf16/f32)
    wq: jax.Array,                # (K, N) int8 recentered codes
    w_delta: jax.Array,           # (N,) per-out-channel scale
    w_zp: jax.Array,              # (N,) recentered zero point (zp - offset)
    x_delta: jax.Array,           # scalar activation scale
    x_zp: jax.Array,              # scalar recentered activation zero point
    bias: Optional[jax.Array] = None,  # (N,)
    block_m: int = 256,
    block_n: int = 256,
    out_dtype=jnp.bfloat16,
    a_bits: int = 8,
    interpret: bool = False,
):
    m, k = x.shape
    _, n = wq.shape
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        wq = jnp.pad(wq, ((0, 0), (0, np_ - n)))
        w_delta = jnp.pad(w_delta, (0, np_ - n))
        w_zp = jnp.pad(w_zp, (0, np_ - n))
        if bias is not None:
            bias = jnp.pad(bias, (0, np_ - n))
    if bias is None:
        bias = jnp.zeros((np_,), jnp.float32)

    off = 2 ** (a_bits - 1)
    scal = jnp.asarray(
        [[x_delta.astype(jnp.float32), x_zp.astype(jnp.float32), float(k),
          float(-off), float(2 ** a_bits - 1 - off)]],
        jnp.float32,
    )
    wsum = jnp.sum(wq.astype(jnp.int32), axis=0, keepdims=True).astype(jnp.float32)
    dwzw = jnp.stack([w_delta.astype(jnp.float32), w_zp.astype(jnp.float32)])

    grid = (mp // bm, np_ // bn)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + k * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
    )(x, wq, scal, wsum, dwzw, bias.reshape(1, -1).astype(jnp.float32))
    return out[:m, :n]


def pack_weight_int8(w: jax.Array, delta: jax.Array, zero_point: jax.Array,
                     bits: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Precompute recentered int8 weight codes + adjusted scales at load time.

    w: (K, N) float; delta/zero_point broadcastable (1, N) per-out-channel.
    Returns (wq int8 (K,N), w_delta (N,), w_zp_recentered (N,))."""
    level = 2 ** bits
    off = 2 ** (bits - 1)
    d = jnp.broadcast_to(jnp.asarray(delta), (1, w.shape[1])).reshape(-1)
    z = jnp.broadcast_to(jnp.asarray(zero_point), (1, w.shape[1])).reshape(-1)
    codes = jnp.clip(jnp.round(w / d[None, :]) + z[None, :], 0, level - 1) - off
    return codes.astype(jnp.int8), d, (z - off).astype(jnp.float32)


def quantized_matmul_reference(x, wq, w_delta, w_zp, x_delta, x_zp, bias=None):
    """XLA oracle for the kernel (same math, float)."""
    k = x.shape[1]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_delta) + x_zp, -128, 127)
    acc = xq @ wq.astype(jnp.float32)
    xsum = jnp.sum(xq, axis=1, keepdims=True)
    wsum = jnp.sum(wq.astype(jnp.float32), axis=0, keepdims=True)
    y = x_delta * w_delta[None, :] * (
        acc - x_zp * wsum - w_zp[None, :] * xsum + k * x_zp * w_zp[None, :]
    )
    if bias is not None:
        y = y + bias[None, :]
    return y
