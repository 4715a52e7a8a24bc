"""Weight quantization: per-out-channel scale init and load-time folding.

The reference lazily initializes every wqtizer on the first forward
(/root/reference/quant/quant_layer.py:271-283) and re-fake-quantizes weights
on every call. Weights are input-independent, so here:

  * `init_weight_qparams` runs the (vmapped) per-out-channel scaler search for
    every quantizable layer once;
  * `fold_weight_quant` produces a params pytree whose weights are already
    quantize-dequantized (or AdaRound-rounded); inference then runs at full
    MXU speed with zero per-step weight-quant work.

conv_in / conv_out keep float weights (reference disable_out_quantization,
quant_model.py:118-124) but still get qparams so checkpoints round-trip.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.quant.adaround import adaround_quant
from dgq_tpu.quant.affine import QParams, fake_quant
from dgq_tpu.quant.scalers import Scaler, init_scale_channelwise

EXCLUDED_LAYERS = ("conv_in", "conv_out")


def _w_out_first(w: jax.Array, kind: str) -> jax.Array:
    """Move the out-channel axis first: HWIO conv -> OHWI; (I,O) linear -> (O,I)."""
    if kind == "conv":
        return jnp.transpose(w, (3, 0, 1, 2))
    return jnp.transpose(w)


def _qp_to_layout(qp: QParams, kind: str) -> QParams:
    """Reshape leading-axis qparams to broadcast against our weight layouts."""
    o = qp.delta.shape[0]
    if kind == "conv":
        shape = (1, 1, 1, o)
    else:
        shape = (1, o)
    return QParams(jnp.reshape(qp.delta, shape), jnp.reshape(qp.zero_point, shape))


def init_layer_wqp(w: jax.Array, kind: str, bits: int, scaler: Scaler) -> QParams:
    """Per-out-channel scale init for one layer, in our weight layout."""
    wo = _w_out_first(w, kind)
    qp = init_scale_channelwise(wo, bits, scaler)
    # init_scale_channelwise returns (O,1,..) leading-axis broadcast shapes
    flat = QParams(jnp.reshape(qp.delta, (-1,)), jnp.reshape(qp.zero_point, (-1,)))
    return _qp_to_layout(flat, kind)


def init_weight_qparams(
    params: dict,
    spec,
    bits: int,
    scaler: Scaler = Scaler.MINMAX,
) -> Dict[str, QParams]:
    """Scale init for every quantizable (conv/linear) layer."""
    out = {}
    for name, kind, _ in spec:
        if kind not in ("conv", "linear"):
            continue
        out[name] = init_layer_wqp(params[name]["w"], kind, bits, scaler)
    return out


def fold_weight_quant(
    params: dict,
    wqp: Dict[str, QParams],
    spec,
    cfg: QConfig,
    alphas: Optional[Dict[str, jax.Array]] = None,
    soft: bool = False,
) -> dict:
    """Return params with weights replaced by their quantize-dequantized
    values. With `alphas`, AdaRound rounding is used (soft during
    reconstruction, hard for deployment)."""
    out = dict(params)
    for name, kind, _ in spec:
        if kind not in ("conv", "linear") or name not in wqp:
            continue
        if cfg.disable_out_quant and name in EXCLUDED_LAYERS:
            continue
        p = dict(params[name])
        w = p["w"]
        if alphas is not None and name in alphas:
            p["w"] = adaround_quant(w, wqp[name], alphas[name], cfg.w_bits, soft=soft)
        else:
            p["w"] = fake_quant(w, wqp[name], cfg.w_bits)
        out[name] = p
    return out


def quantize_model_weights(
    params: dict,
    spec,
    cfg: QConfig,
    scaler: Scaler = Scaler.MINMAX,
) -> tuple[dict, Dict[str, QParams]]:
    """One-call weight-only PTQ (the reference's no_recon path,
    src/quantize_weight.py:53,177-179): init scales then fold."""
    wqp = init_weight_qparams(params, spec, cfg.w_bits, scaler)
    params_q = fold_weight_quant(params, wqp, spec, cfg)
    if cfg.use_int8_matmul or cfg.use_int8_conv:
        params_q = attach_int8_packed(params_q, wqp, spec, cfg)
    return params_q, wqp


def attach_int8_packed(
    params_q: dict,
    wqp: Dict[str, QParams],
    spec,
    cfg: QConfig,
) -> dict:
    """Attach packed int8 weight codes for the Pallas int8-matmul deploy path.

    Works on FOLDED params: folded weights sit exactly on the quantization
    grid, so round(w_folded/delta)+zp recovers the integer codes for both
    nearest and AdaRound rounding. Linear layers and 1x1 convs (which route
    through the matmul kernel) get 'w_q8' / 'w_d' / 'w_z' entries; k×k convs
    get 'w_q8c' (HWIO int8 codes) / 'w_d' / 'w_z' / 'w_ksum' for the XLA
    int8-conv path (models/layers._int8_conv).
    """
    import numpy as np

    out = dict(params_q)
    level = 2 ** cfg.w_bits
    off = 2 ** (cfg.w_bits - 1)
    for name, kind, meta in spec:
        if name not in wqp or (cfg.disable_out_quant and name in EXCLUDED_LAYERS):
            continue
        if kind not in ("conv", "linear"):
            continue
        if name in cfg.group_conv_layers:
            continue  # group convs run the group fake-quant path; packed
            # codes would only waste HBM (models/layers.quant_conv2d routes
            # group layers before the int8 check)
        p = dict(params_q[name])
        qp = wqp[name]
        if kind == "linear":
            w2 = np.asarray(p["w"], np.float32)
        else:
            kh, kw, cin, cout = p["w"].shape
            w2 = np.asarray(p["w"], np.float32).reshape(kh * kw * cin, cout)
        # host-side numpy packing (runs once per layer at load; jnp here would
        # pay a tiny-kernel compile per layer shape)
        d = np.asarray(qp.delta, np.float32).reshape(-1)
        z = np.asarray(qp.zero_point, np.float32).reshape(-1)
        codes = (np.clip(np.round(w2 / d[None, :]) + z[None, :], 0, level - 1)
                 - off).astype(np.int8)
        zr = (z - off).astype(np.float32)
        if kind == "linear" or (meta[2] == 1 and p["w"].shape[:2] == (1, 1)):
            if not cfg.use_int8_matmul:
                continue
            p["w_q8"], p["w_d"], p["w_z"] = (
                jnp.asarray(codes), jnp.asarray(d), jnp.asarray(zr))
            # per-out-channel code sums for the XLA int8 path's analytic
            # zero-point correction (models/layers._int8_matmul_xla)
            p["w_ksum"] = jnp.asarray(
                codes.astype(np.int32).sum(axis=0).astype(np.float32))
        else:
            if not cfg.use_int8_conv:
                continue  # k×k codes only help the s8-conv path
            p["w_q8c"] = jnp.asarray(codes.reshape(p["w"].shape))
            p["w_d"], p["w_z"] = jnp.asarray(d), jnp.asarray(zr)
            p["w_ksum"] = jnp.asarray(
                codes.astype(np.int32).sum(axis=0).astype(np.float32))
        out[name] = p
    return out


def _head_slot_width(d: int, h: int, slot: int) -> int:
    """Per-head packed slot width. slot=64 prefers the PAIR layout — two
    64-wide head slots per 128-lane kernel block — whenever the head fits in
    64 lanes and the head count is even (the kernel processes slot pairs);
    otherwise (and always at slot=128) heads pad to a 128-multiple so each
    occupies its own lane-aligned block."""
    if slot == 64 and d <= 64 and h % 2 == 0:
        return 64
    return -(-d // 128) * 128


def pack_attention_heads(params, spec, num_heads=8, slot: int = 64):
    """Repack attention projection weights into the head-slot layout.

    Deploy-time transform (run AFTER quantize_model_weights/checkpoint
    folding): every `to_q/to_k/to_v` weight (I, O) is viewed as
    (I, H, head_dim) and zero-padded to (I, H, dp) with dp the packed slot
    width (`_head_slot_width`) — so each head occupies a lane-addressable
    dp-wide block of the projection output and the fused attention kernel
    can carve per-head tiles straight out of (B, T, H*dp) with BlockSpec
    lane indices: no activation transpose/pad/slice. The matching
    `to_out.0` weight gets zero ROWS so it consumes the padded layout
    directly. Zero weight columns produce exact-zero activations (and the
    per-tensor act quantizers map 0 -> 0 exactly: zp ranges inside the clip
    bounds), so the packed forward is bit-identical to the unpacked one.

    slot=64 (default): SD's 40-wide heads pad to 64 and ride the kernel's
    pair mode (two heads per 128-lane block) — half the lane waste of
    slot=128 on both the projection widths and the attention contractions;
    SDXL's 64-wide heads need no padding at all. slot=128 keeps the
    one-head-per-block layout.

    num_heads: int (SD v1.4: 8 everywhere) or a callable(out_dim) -> int
    (SDXL: out_dim // 64). Returns a new flat params dict sharing all
    untouched leaves; layers whose head_dim is already slot-aligned are
    still repacked only if padding is needed (no-op otherwise).
    """
    heads_of = num_heads if callable(num_heads) else (lambda o: num_heads)
    new = dict(params)
    for name, kind, meta in spec:
        if kind != "linear":
            continue
        if name.endswith((".to_q", ".to_k", ".to_v")):
            o_dim = meta[1]
            h = heads_of(o_dim)
            d = o_dim // h
            pad = _head_slot_width(d, h, slot) - d
            if pad == 0:
                continue
            p = dict(params[name])
            w = p["w"]
            w3 = jnp.reshape(w, (w.shape[0], h, d))
            w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, pad)))
            p["w"] = jnp.reshape(w3, (w.shape[0], h * (d + pad)))
            if p.get("b") is not None:
                b2 = jnp.pad(jnp.reshape(p["b"], (h, d)), ((0, 0), (0, pad)))
                p["b"] = jnp.reshape(b2, (h * (d + pad),))
            new[name] = p
        elif name.endswith(".to_out.0"):
            i_dim = meta[0]
            h = heads_of(i_dim)
            d = i_dim // h
            pad = _head_slot_width(d, h, slot) - d
            if pad == 0:
                continue
            p = dict(params[name])
            w = p["w"]
            w3 = jnp.reshape(w, (h, d, w.shape[1]))
            w3 = jnp.pad(w3, ((0, 0), (0, pad), (0, 0)))
            p["w"] = jnp.reshape(w3, (h * (d + pad), w.shape[1]))
            new[name] = p
    return new
