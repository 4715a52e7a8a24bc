"""Scale initializers for affine quantizers.

Reproduces the reference's scaler family (/root/reference/quant/quant_layer.py:22-209):
minmax, mse (80-point shrink grid, Lp p=2.4), kl (histogram KL over 50 clip
ratios), hist (0.9996 mass clip), omse (80x level grid), logminmax.

The grid searches are expressed as `lax.scan` over candidate settings instead of
Python loops, so per-channel initialization runs as one compiled vmap'd program
on TPU rather than thousands of host round-trips.

kl/hist are histogram-based and run host-side in numpy (they execute once per
layer during calibration; they are not hot).
"""
from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.quant.affine import QParams


class Scaler(str, enum.Enum):
    MINMAX = "minmax"
    MSE = "mse"
    KL = "kl"
    HIST = "hist"
    OMSE = "omse"
    LOGMINMAX = "logminmax"


def lp_loss(pred: jax.Array, tgt: jax.Array, p: float = 2.0, *, all_mean: bool = True) -> jax.Array:
    """Lp loss (reference quant_layer.py:199-209).

    all_mean=True  -> REDUCTION.ALL  : mean(|pred-tgt|^p)
    all_mean=False -> REDUCTION.NONE : sum over axis 1 then mean
    """
    err = jnp.abs(pred - tgt) ** p
    if all_mean:
        return jnp.mean(err)
    return jnp.mean(jnp.sum(err, axis=1))


def _bounds(level: int, symmetric: bool, always_zero: bool) -> tuple[int, int]:
    if symmetric and not always_zero:
        return -level // 2, level // 2 - 1
    return 0, level - 1


# ---------------------------------------------------------------- minmax ----
def minmax_scale(x: jax.Array, level: int, symmetric: bool, always_zero: bool) -> QParams:
    """Reference quant_layer.py:22-38. x_min clamped <=0, x_max clamped >=0."""
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    delta = (x_max - x_min) / (level - 1)
    if symmetric:
        hi = jnp.maximum(jnp.abs(x_min), x_max)
        x_min = -hi
        delta = (hi - x_min) / (level - 2)
    if always_zero:
        delta = x_max / (level - 1)
    delta = jnp.maximum(delta, 1e-8)
    if symmetric or always_zero:
        zp = jnp.zeros_like(delta)
    else:
        zp = jnp.round(-x_min / delta)
    return QParams(delta=delta, zero_point=zp)


# ------------------------------------------------------------------- mse ----
def mse_scale(x: jax.Array, level: int, symmetric: bool, always_zero: bool) -> QParams:
    """80-point shrink-grid MSE search, Lp p=2.4 (reference quant_layer.py:65-91).

    Candidate i shrinks [x_min, x_max] by (1 - 0.01*i); the best candidate by
    strictly-lower loss wins (first minimum, matching the reference's `<`).
    """
    x_min = jnp.min(x)
    x_max = jnp.max(x)
    nb, pb = _bounds(level, symmetric, always_zero)

    def candidate(i):
        shrink = 1.0 - i * 0.01
        new_min = x_min * shrink
        new_max = x_max * shrink
        if symmetric:
            hi = jnp.maximum(jnp.abs(new_min), new_max)
            new_min = -hi
            delta = (hi - new_min) / (level - 2)
        else:
            delta = (new_max - new_min) / (level - 1)
        if always_zero:
            delta = new_max / (level - 1)
        if symmetric or always_zero:
            zp = jnp.zeros_like(delta)
        else:
            zp = jnp.round(-new_min / delta)
        x_q = jnp.clip(jnp.round(x / delta) + zp, nb, pb)
        x_dq = delta * (x_q - zp)
        score = lp_loss(x_dq, x, p=2.4)
        return score, delta, zp

    def body(carry, i):
        best_s, best_d, best_z = carry
        s, d, z = candidate(i.astype(x.dtype))
        take = s < best_s
        return (
            jnp.where(take, s, best_s),
            jnp.where(take, d, best_d),
            jnp.where(take, z, best_z),
        ), None

    init = (jnp.asarray(1e10, x.dtype), jnp.asarray(0.0, x.dtype), jnp.asarray(0.0, x.dtype))
    (best_s, delta, zp), _ = jax.lax.scan(body, init, jnp.arange(80))
    return QParams(delta=delta, zero_point=zp)


# ------------------------------------------------------------------ omse ----
def omse_scale(x: jax.Array, level: int, symmetric: bool, always_zero: bool) -> QParams:
    """Reference quant_layer.py:162-185: compounding range shrink x zero-point
    sweep. Note the reference's x_max update compounds across iterations
    (x_max_i = range0 * prod_{j<=i}(1-0.01j)); reproduced exactly.
    """
    del symmetric, always_zero  # reference omse always clamps to [0, level-1]
    x_min0 = jnp.min(x)
    x_max0 = jnp.max(x)
    range0 = x_max0 - x_min0

    # Compounded x_max per outer iteration (static 80-vector).
    shrinks = 1.0 - 0.01 * np.arange(80)
    xmaxs = range0 * jnp.asarray(np.cumprod(shrinks), x.dtype)
    deltas = xmaxs / (level - 1)

    def body(carry, dz):
        best_s, best_d, best_z = carry
        delta, zp = dz
        x_q = jnp.clip(jnp.round(x / delta) + zp, 0, level - 1)
        x_dq = delta * (x_q - zp)
        s = lp_loss(x_dq, x, p=2.4)
        take = s < best_s
        return (
            jnp.where(take, s, best_s),
            jnp.where(take, delta, best_d),
            jnp.where(take, zp, best_z),
        ), None

    dd = jnp.repeat(deltas, level)
    zz = jnp.tile(jnp.arange(level, dtype=x.dtype), 80)
    init = (jnp.asarray(1e10, x.dtype), jnp.asarray(0.0, x.dtype), jnp.asarray(0.0, x.dtype))
    (best_s, delta, zp), _ = jax.lax.scan(body, init, (dd, zz))
    return QParams(delta=delta, zero_point=zp)


# ------------------------------------------------------------- logminmax ----
def logminmax_scale(x: jax.Array, level: int, symmetric: bool, always_zero: bool) -> QParams:
    """Reference quant_layer.py:41-61. Searches delta in {0.1..1.0} for a log2
    quantizer. NOTE: the reference reconstructs with `delta * 2**x_q` (positive
    exponent) during the search; reproduced verbatim for parity. Returns zp=0.
    """
    del symmetric, always_zero
    x16 = x.astype(jnp.float16)

    def body(carry, d):
        best_s, best_d = carry
        x_int = jnp.round(-jnp.log2(x16 / d))
        x_q = jnp.clip(x_int, 0, level - 1)
        x_dq = (d * 2.0 ** x_q).astype(jnp.float16)
        s = lp_loss(x16.astype(jnp.float32), x_dq.astype(jnp.float32), p=2.0)
        take = s < best_s
        return (jnp.where(take, s, best_s), jnp.where(take, d, best_d)), None

    cands = jnp.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0], jnp.float16)
    init = (jnp.asarray(1e10, jnp.float32), jnp.max(x16).astype(jnp.float16))
    (_, delta), _ = jax.lax.scan(body, init, cands)
    return QParams(delta=delta.astype(x.dtype), zero_point=jnp.zeros((), x.dtype))


# -------------------------------------------------------------- kl / hist ---
def kl_scale(x: np.ndarray, level: int, symmetric: bool, always_zero: bool) -> QParams:
    """Histogram-KL clip search (reference quant_layer.py:94-137). Host-side.

    The histogram runs in float32 (the reference's tensor dtype) — upcasting
    to float64 shifts bin edges enough to select a different clip ratio than
    the reference, while sub-float32 inputs (bf16 taps) break np.histogram's
    edge math, so the dtype is pinned rather than inherited."""
    np_x = np.asarray(x, dtype=np.float32)
    ref_hist, ref_bins = np.histogram(np_x, bins=level, density=True)
    sumd = np.sum(np.diff(ref_bins))
    smooth_ref = (ref_hist + 1e-5) / (1.0 + sumd * 1e-5)

    def to_hist_with_orig_bins(targ_hist, targ_bins, orig_hist, orig_bins):
        targ_v = 0.0
        targ_i = 0
        targ_bin = targ_bins[0]
        ret = np.zeros_like(orig_hist)
        for i, orig_bin in enumerate(orig_bins[:-1]):
            if targ_bin <= orig_bin:
                if targ_i < len(targ_bins) - 1:
                    targ_v = targ_hist[targ_i]
                    targ_i += 1
                    targ_bin = targ_bins[targ_i]
                else:
                    targ_v = 0.0
                    targ_bin = orig_bin.max() + 1.0
            ret[i] = targ_v
        return ret

    min_kl = 1e5
    res_ratio = 1.0
    for clip_ratio in np.linspace(0.5, 1.0, 50):
        lo, hi = np.min(np_x) * clip_ratio, np.max(np_x) * clip_ratio
        q_hist, q_bins = np.histogram(np.clip(np_x, lo, hi), bins=level, density=True)
        c_q = to_hist_with_orig_bins(q_hist, q_bins, ref_hist, ref_bins)
        c_q = (c_q + 1e-5) / (1.0 + sumd * 1e-5)
        kl_val = np.sum(smooth_ref * np.log(smooth_ref / c_q))
        if kl_val < min_kl:
            min_kl = kl_val
            res_ratio = clip_ratio
    lo, hi = np.min(np_x) * res_ratio, np.max(np_x) * res_ratio
    x_clip = np.clip(np_x, lo, hi).astype(np.float32)
    return minmax_scale(jnp.asarray(x_clip), level, symmetric, always_zero)


def hist_scale(x: np.ndarray, level: int, symmetric: bool, always_zero: bool) -> QParams:
    """0.9996-mass histogram clip (reference quant_layer.py:140-160). Host-side.
    Runs in float32 (see kl_scale)."""
    np_x = np.asarray(x, dtype=np.float32)
    data_max = max(-np.min(np_x), np.max(np_x))
    h, _ = np.histogram(np_x, bins=level, range=(0, data_max), density=True)
    h = h.astype(np.float32) / h.sum()
    accum = 0.0
    x_min, x_max = np.min(np_x), np.max(np_x)
    for i in range(len(h)):
        accum += h[i]
        if accum >= 0.9996:
            clip_value = (i + 0.5) * (data_max / level)
            x_min = max(-clip_value, np.min(np_x))
            x_max = min(clip_value, np.max(np_x))
            break
    x_clip = np.clip(np_x, x_min, x_max).astype(np.float32)
    return minmax_scale(jnp.asarray(x_clip), level, symmetric, always_zero)


# ------------------------------------------------------------- dispatch -----
_JAX_SCALERS = {
    Scaler.MINMAX: minmax_scale,
    Scaler.MSE: mse_scale,
    Scaler.OMSE: omse_scale,
    Scaler.LOGMINMAX: logminmax_scale,
}
_HOST_SCALERS = {Scaler.KL: kl_scale, Scaler.HIST: hist_scale}


def init_scale(
    x: jax.Array,
    bits: int,
    scaler: Scaler = Scaler.MINMAX,
    symmetric: bool = False,
    always_zero: bool = False,
) -> QParams:
    """Per-tensor scale initialization."""
    level = 2 ** bits
    scaler = Scaler(scaler)
    if scaler in _JAX_SCALERS:
        return _JAX_SCALERS[scaler](jnp.asarray(x, jnp.float32), level, symmetric, always_zero)
    return _HOST_SCALERS[scaler](np.asarray(x), level, symmetric, always_zero)


def minmax_scale_rows(flat: jax.Array, level: int, symmetric: bool,
                      always_zero: bool) -> QParams:
    """Vectorized per-row minmax (one fused program; no per-channel scan)."""
    x_min = jnp.minimum(jnp.min(flat, axis=1), 0.0)
    x_max = jnp.maximum(jnp.max(flat, axis=1), 0.0)
    delta = (x_max - x_min) / (level - 1)
    if symmetric:
        hi = jnp.maximum(jnp.abs(x_min), x_max)
        x_min = -hi
        delta = (hi - x_min) / (level - 2)
    if always_zero:
        delta = x_max / (level - 1)
    delta = jnp.maximum(delta, 1e-8)
    if symmetric or always_zero:
        zp = jnp.zeros_like(delta)
    else:
        zp = jnp.round(-x_min / delta)
    return QParams(delta=delta, zero_point=zp)


def init_scale_channelwise(
    x: jax.Array,
    bits: int,
    scaler: Scaler = Scaler.MINMAX,
    symmetric: bool = False,
    always_zero: bool = False,
) -> QParams:
    """Per-out-channel (leading axis) initialization for weights.

    Matches reference quant_layer.py:253-264: one independent scaler search per
    output channel, results reshaped to broadcast ((O,1,1,1) conv / (O,1)
    linear). Runs as a single vmap'd compiled search for the jax scalers
    (minmax uses a direct vectorized reduction).
    """
    level = 2 ** bits
    scaler = Scaler(scaler)
    n = x.shape[0]
    flat = jnp.reshape(jnp.asarray(x, jnp.float32), (n, -1))
    if scaler == Scaler.MINMAX:
        qp = minmax_scale_rows(flat, level, symmetric, always_zero)
    elif scaler in _JAX_SCALERS:
        fn = partial(_JAX_SCALERS[scaler], level=level, symmetric=symmetric,
                     always_zero=always_zero)
        qp = jax.vmap(lambda xc: fn(xc))(flat)
    else:
        host = _HOST_SCALERS[scaler]
        rows = [host(np.asarray(flat[c]), level, symmetric, always_zero) for c in range(n)]
        qp = QParams(
            delta=jnp.stack([r.delta for r in rows]),
            zero_point=jnp.stack([r.zero_point for r in rows]),
        )
    bshape = (n,) + (1,) * (x.ndim - 1)
    return QParams(
        delta=jnp.reshape(qp.delta, bshape),
        zero_point=jnp.reshape(qp.zero_point, bshape),
    )
