"""Uniform affine fake-quantization primitives.

Semantics mirror the reference's UniformAffineQuantizer
(/root/reference/quant/quant_layer.py:216-299): clamp(round(x/delta)+zp, NB, PB)
then dequantize delta*(xq-zp), with a straight-through estimator on the round.

Unlike the reference (a stateful nn.Module with lazy init), quantizer state is
an explicit QParams pytree and application is a pure function, so it composes
with jit/vmap/scan and the weight path can be folded at load time.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QParams(NamedTuple):
    """Affine quantizer parameters.

    delta/zero_point broadcast against the tensor being quantized:
      * per-tensor: scalars
      * per-out-channel weights: shape (O,1,1,1) conv / (O,1) linear
        (reference quant_layer.py:262-264)
      * group activation quant: (1,1,C) last-axis or (1,C,1) middle-axis
        (reference quant_layer.py:391-402)
    Per-timestep activation params carry a leading [T, ...] axis and are
    indexed inside the denoising scan.
    """

    delta: jax.Array
    zero_point: jax.Array


def ste_round(x: jax.Array) -> jax.Array:
    """round() with a straight-through gradient (reference quant_layer.py:212)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quant_bounds(bits: int, symmetric: bool, always_zero: bool) -> tuple[int, int]:
    """Integer clamp bounds NB/PB (reference quant_layer.py:295-296)."""
    level = 2 ** bits
    if symmetric and not always_zero:
        return -level // 2, level // 2 - 1
    return 0, level - 1


def fake_quant(
    x: jax.Array,
    qp: QParams,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = False,
) -> jax.Array:
    """Quantize-dequantize x with straight-through rounding.

    Matches reference quant_layer.py:295-299 bit-for-bit in float32, in the
    shifted-clip form: clip(r + zp, nb, pb) - zp == clip(r, nb - zp, pb - zp)
    exactly (monotone shift), which drops two input-sized VPU ops (the +zp /
    -zp pair) — the zero point moves into the clip bounds, which broadcast
    like zp did. Gradients (STE round, clip cutoff, d/d_delta, d/d_zp) are
    identical to the unshifted form in every region.
    """
    nb, pb = quant_bounds(bits, symmetric, always_zero)
    x_q = jnp.clip(ste_round(x / qp.delta), nb - qp.zero_point, pb - qp.zero_point)
    return qp.delta * x_q


def int_code_offset(bits: int, symmetric: bool = False, always_zero: bool = False) -> int:
    """Signed-representation bias for integer codes.

    Asymmetric codes live in [0, 2^bits - 1]; re-centering by 2^(bits-1) maps
    them into the signed int8 range so the MXU int8 path applies. Symmetric
    codes are already signed.
    """
    nb, _ = quant_bounds(bits, symmetric, always_zero)
    return 2 ** (bits - 1) if nb == 0 else 0


def quantize_int(
    x: jax.Array,
    qp: QParams,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = False,
    dtype: jnp.dtype = jnp.int8,
) -> jax.Array:
    """Real integer quantization (signed codes), for the Pallas int-MXU path.

    Returns clamp(round(x/delta)+zp, NB, PB) - offset as signed integers, where
    offset re-centers asymmetric codes into int8 range (see int_code_offset).
    Dequantization is delta*(code + offset - zp); per-out-channel weight scales
    factor out of the matmul so the MXU can run int8 x int8 -> int32.
    """
    nb, pb = quant_bounds(bits, symmetric, always_zero)
    off = int_code_offset(bits, symmetric, always_zero)
    codes = jnp.clip(jnp.round(x / qp.delta) + qp.zero_point, nb, pb) - off
    return codes.astype(dtype)


def dequantize_int(
    codes: jax.Array,
    qp: QParams,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Inverse of quantize_int."""
    off = int_code_offset(bits, symmetric, always_zero)
    return (qp.delta * (codes.astype(out_dtype) + off - qp.zero_point)).astype(out_dtype)


def ema_minmax_update(
    x: jax.Array,
    x_min: jax.Array,
    x_max: jax.Array,
    momentum: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """EMA running min/max (reference act_momentum_update, quant_layer.py:431-440)."""
    new_min = x_min * momentum + jnp.min(x) * (1.0 - momentum)
    new_max = x_max * momentum + jnp.max(x) * (1.0 - momentum)
    return new_min, new_max


def minmax_qparams_from_range(
    x_min: jax.Array,
    x_max: jax.Array,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = False,
) -> QParams:
    """Affine params for a known [min, max] range, matching the reference's
    minmax scaler on a clamped tensor whose corner elements are x_min/x_max
    (quant_layer.py:441-445 seeds x[...,0]=min, x[...,1]=max then re-derives).

    The reference clamps x_min<=0 and x_max>=0 inside minmax(); we reproduce
    that here so EMA-updated ranges stay bit-compatible.
    """
    level = 2 ** bits
    lo = jnp.minimum(x_min, 0.0)
    hi = jnp.maximum(x_max, 0.0)
    delta = (hi - lo) / (level - 1)
    if symmetric:
        hi2 = jnp.maximum(jnp.abs(lo), hi)
        lo = -hi2
        delta = (hi2 - lo) / (level - 2)
    if always_zero:
        delta = hi / (level - 1)
    delta = jnp.maximum(delta, 1e-8)
    if symmetric or always_zero:
        zero_point = jnp.zeros_like(delta)
    else:
        zero_point = jnp.round(-lo / delta)
    return QParams(delta=delta, zero_point=zero_point)
