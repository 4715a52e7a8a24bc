"""AdaRound: learned rounding for weight quantization.

Mirrors /root/reference/quant/adaptive_rounding.py:12-90 (LEARNED_HARD_SIGMOID
mode, gamma=-0.1, zeta=1.1) and the relaxation rounding regularizer of
reconstruction_util.py:66-83. State (alpha) is an explicit array so the
20k-iteration Adam reconstruction loop runs as an optax step under `lax.scan`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dgq_tpu.quant.affine import QParams

GAMMA = -0.1
ZETA = 1.1


def adaround_init_alpha(w: jax.Array, delta: jax.Array) -> jax.Array:
    """alpha init from the float rounding remainder (reference :31-38):
    rest = w/delta - floor(w/delta); alpha = -log((zeta-gamma)/(rest-gamma) - 1)
    so that sigmoid(alpha)*(zeta-gamma)+gamma == rest at init.
    """
    rest = w / delta - jnp.floor(w / delta)
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def adaround_soft_targets(alpha: jax.Array) -> jax.Array:
    """clip(sigmoid(alpha)*(zeta-gamma)+gamma, 0, 1) (reference :40-41)."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def adaround_quant(
    w: jax.Array,
    qp: QParams,
    alpha: jax.Array,
    bits: int,
    symmetric: bool = False,
    soft: bool = True,
) -> jax.Array:
    """Quantize-dequantize w with learned rounding (reference :43-70).

    soft=True  (training): floor(w/delta) + soft_target(alpha)   [differentiable]
    soft=False (deploy):   floor(w/delta) + (alpha >= 0)
    """
    level = 2 ** bits
    x_floor = jnp.floor(w / qp.delta)
    if soft:
        x_int = x_floor + adaround_soft_targets(alpha)
    else:
        x_int = x_floor + (alpha >= 0).astype(x_floor.dtype)
    nb = -level // 2 if symmetric else 0
    pb = level // 2 - 1 if symmetric else level - 1
    x_q = jnp.clip(x_int + qp.zero_point, nb, pb)
    return qp.delta * (x_q - qp.zero_point)


def rounding_reg_loss(alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Relaxation regularizer sum(1 - |2h-1|^beta) pushing soft targets to {0,1}
    (reference reconstruction_util.py:68-69). beta is annealed by
    LinearTempDecay during reconstruction.
    """
    h = adaround_soft_targets(alpha)
    return jnp.sum(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)


def linear_temp_decay(t: jax.Array, t_max: int, warmup: float = 0.0,
                      start_b: float = 20.0, end_b: float = 2.0) -> jax.Array:
    """Temperature schedule (reference reconstruction_util.py:176-198):
    constant start_b until warmup*t_max, then linear decay to end_b."""
    start_decay = warmup * t_max
    rel_t = (t - start_decay) / (t_max - start_decay)
    decayed = end_b + (start_b - end_b) * jnp.maximum(0.0, 1.0 - rel_t)
    return jnp.where(t < start_decay, start_b, decayed)
