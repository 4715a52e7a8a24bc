"""Log2 softmax quantizer (T2ILogQuantizer).

Mirrors /root/reference/quant/quant_layer_text.py:12-138: post-softmax
attention weights x in (0, 1] are quantized on a log2 grid,
    x_q = clamp(round(-log2(x / delta)), NB, PB);  x_dq = 2^{-x_q} * delta.

Two scale modes:
  * static delta from a quantile search over {0.999, 0.9999, 0.99999}
    (reference :49-76), optionally EMA-updated during running-stat passes;
  * `real_time`: delta = max(x) of the current call (reference :96-99) —
    computed inside the compiled graph, so no host sync. Inside the fused
    Pallas attention kernel this becomes a running row-max reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dgq_tpu.quant.scalers import lp_loss


def _bounds(bits: int, symmetric: bool, always_zero: bool) -> tuple[int, int]:
    level = 2 ** bits
    if symmetric and not always_zero:
        return -level // 2, level // 2 - 1
    return 0, level - 1


def _apply(x: jax.Array, delta: jax.Array, nb: int, pb: int) -> jax.Array:
    x_q = jnp.round(-jnp.log2(x / delta))
    x_q = jnp.clip(x_q, nb, pb)
    return (2.0 ** (-x_q)) * delta


def log2_init_delta(
    x: jax.Array,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = True,
) -> jax.Array:
    """Quantile search for delta (reference quant_layer_text.py:49-76)."""
    nb, pb = _bounds(bits, symmetric, always_zero)
    flat = jnp.reshape(x, (-1,))

    def body(carry, pct):
        best_score, best_delta = carry
        d = jnp.quantile(flat, pct)
        x_dq = _apply(x, d, nb, pb)
        score = lp_loss(x, x_dq, p=2.0)
        take = score < best_score
        return (jnp.where(take, score, best_score), jnp.where(take, d, best_delta)), None

    init = (jnp.asarray(1e10, x.dtype), jnp.max(x))
    (_, delta), _ = jax.lax.scan(body, init, jnp.asarray([0.999, 0.9999, 0.99999], x.dtype))
    return delta


def log2_fake_quant(
    x: jax.Array,
    delta: jax.Array,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = True,
) -> jax.Array:
    """Static-delta log2 quantize-dequantize (reference :101-107)."""
    nb, pb = _bounds(bits, symmetric, always_zero)
    return _apply(x, delta, nb, pb)


def log2_real_time_quant(
    x: jax.Array,
    bits: int,
    symmetric: bool = False,
    always_zero: bool = True,
    axis=None,
) -> jax.Array:
    """`real_time` mode: delta = max over the whole tensor (reference :96-99).

    axis=None reproduces the reference's global x.max(); passing an axis tuple
    allows per-head/per-row variants for kernel-tiled execution studies.
    """
    nb, pb = _bounds(bits, symmetric, always_zero)
    delta = jnp.max(x) if axis is None else jnp.max(x, axis=axis, keepdims=True)
    return _apply(x, delta, nb, pb)


def log2_ema_update(delta: jax.Array, x: jax.Array, momentum: float = 0.95) -> jax.Array:
    """EMA delta update during running-stat passes (reference :109-117)."""
    return momentum * delta + (1.0 - momentum) * jnp.max(x)
