"""Functional NHWC layer primitives with quantization hook points.

TPU-native counterparts of the reference's QuantLayer / Attention_forward
(/root/reference/quant/quant_layer.py:577-702, diffusers_rewrite/sd.py:101-207):

  * activations flow NHWC so convs tile onto the MXU without layout churn;
  * weight quantization is NOT applied here — weights arrive already
    fake-quantized (folded at load time) or materialized by the calibration
    step, because wq(w) is input-independent;
  * activation quantizers are applied through `aq_apply` keyed by the
    reference layer path;
  * group-mode convs run an explicit c-major im2col so group scales of shape
    (1, C*kh*kw, 1) / (1, 1, L) broadcast exactly like the reference's
    unfold+matmul path (quant_layer.py:630-657).

Params are dicts: conv {'w': HWIO, 'b': (O,)}, linear {'w': (I, O), 'b': (O,)},
norms {'scale': ..., 'bias': ...}.
"""
from __future__ import annotations

from typing import Optional

import os

import jax
import jax.numpy as jnp

from dgq_tpu.models.qconfig import QConfig, QState, aq_apply, softmax_q_apply


def linear(p, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def conv2d(p, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """NHWC conv with HWIO weights."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def unfold_nhwc(x: jax.Array, kh: int, kw: int, stride: int, padding: int) -> jax.Array:
    """Extract conv patches in torch-F.unfold channel order.

    Input (B, H, W, C) -> output (B, C*kh*kw, L) with the unfolded axis ordered
    c-major (c, i, j), L = H'*W' row-major — matching torch.nn.functional.unfold
    on NCHW input so reference group-quant deltas apply verbatim.
    """
    b, h, w, c = x.shape
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    taps = []
    for i in range(kh):
        for j in range(kw):
            taps.append(
                jax.lax.slice(
                    xp,
                    (0, i, j, 0),
                    (b, i + (ho - 1) * stride + 1, j + (wo - 1) * stride + 1, c),
                    (1, stride, stride, 1),
                )
            )
    # (kh*kw, B, H', W', C) -> (B, C, kh*kw, H'*W') -> (B, C*kh*kw, L)
    pt = jnp.stack(taps, axis=0)
    pt = jnp.transpose(pt, (1, 4, 0, 2, 3))
    return jnp.reshape(pt, (b, c * kh * kw, ho * wo))


def conv2d_unfolded(
    p,
    x_unf: jax.Array,
    out_hw: tuple[int, int],
) -> jax.Array:
    """Conv as matmul over unfolded input (B, CKK, L) -> NHWC output.

    Weight is reshaped to (CKK, O) in c-major order from HWIO. Equivalent to
    the reference's input_unfolded_pseudo_conv2d (quant_layer.py:526-574).
    """
    kh, kw, c, o = p["w"].shape
    w_unf = p.get("w_unf")
    if w_unf is None:
        # HWIO -> (C, kh, kw, O) -> (CKK, O), c-major to match unfold_nhwc
        w_unf = jnp.reshape(jnp.transpose(p["w"], (2, 0, 1, 3)), (c * kh * kw, o))
    y = jnp.einsum(
        "bkl,ko->blo", x_unf, w_unf.astype(x_unf.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x_unf.dtype)
    if p.get("b") is not None:
        y = y + p["b"]
    b = x_unf.shape[0]
    ho, wo = out_hw
    return jnp.reshape(y, (b, ho, wo, o))


def _group_tap_scales(gqp, c, kh, kw, ho, wo):
    """Group scales -> per-tap broadcastable forms: (dm2, zm2) of shape
    (C or 1, kh*kw or 1) over the c-major unfolded mid axis, and (dl4, zl4)
    of shape (1, H', W', 1) or scalar-4d over output locations."""
    from dgq_tpu.models.qconfig import GroupQParams

    if isinstance(gqp, GroupQParams):
        dm, zm = gqp.delta_mid, gqp.zp_mid
        dl, zl = gqp.delta_last, gqp.zp_last
    else:  # plain QParams (scalar or broadcastable): uniform over taps
        dm, zm = gqp.delta.reshape(-1), gqp.zero_point.reshape(-1)
        # a broadcastable (scalar) zero_point paired with a per-channel
        # delta is legal QParams — expand it like quant_conv2d's unfold
        # branch does, so all group_conv_impl choices accept the same qstate
        zm = jnp.broadcast_to(zm, dm.shape) if zm.size != dm.size else zm
        dl, zl = jnp.ones((1,)), jnp.zeros((1,))

    # delta_mid indexes the c-major unfolded axis: k = c*kh*kw + i*kw + j
    if dm.size == c * kh * kw:
        dm2 = jnp.reshape(dm, (c, kh * kw))
        zm2 = jnp.reshape(zm, (c, kh * kw))
    elif dm.size == c:  # per-channel delta: same scale for all taps of c
        dm2 = jnp.reshape(dm, (c, 1))
        zm2 = jnp.reshape(zm, (c, 1))
    elif dm.size == 1:  # per-tensor: broadcast across taps and channels
        dm2 = jnp.broadcast_to(dm.reshape(-1)[:1], (1, 1))
        zm2 = jnp.broadcast_to(zm.reshape(-1)[:1], (1, 1))
    else:
        raise ValueError(
            f"group conv delta size {dm.size} is none of C*kh*kw="
            f"{c * kh * kw}, C={c}, or 1")
    if dl.size == ho * wo:
        dl4 = jnp.reshape(dl, (1, ho, wo, 1))
        zl4 = jnp.reshape(zl, (1, ho, wo, 1))
    elif dl.size == 1:
        dl4 = jnp.reshape(dl, (1, 1, 1, 1))
        zl4 = jnp.reshape(zl, (1, 1, 1, 1))
    else:
        raise ValueError(
            f"group conv delta_last size {dl.size} is neither H'*W'="
            f"{ho * wo} nor 1")
    return dm2, zm2, dl4, zl4


def group_quant_conv2d_im2col(
    p,
    x: jax.Array,
    gqp,
    cfg: QConfig,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Group-quantized conv as ONE tap-major quantized im2col + ONE matmul.

    Same per-element quantization as `group_quant_conv2d_taps` (the exact
    reference semantics, quant_layer.py:630-657), different dataflow: the
    kh*kw fake-quantized tap slices are concatenated along the channel axis
    in (i, j, c) order — one fused XLA write — and contracted against the
    tap-major weight reshape (kh*kw*C, O) in a single MXU matmul.

    Why: the taps decomposition is accumulator-bound — kh*kw separate
    matmuls each round-trip the (B,H',W',O) f32 accumulator through HBM
    (~750 MB/conv at the 64x64 level), while this form materializes one
    (B,H',W',kh*kw*C) bf16 buffer (~2.5x less traffic) and keeps the
    accumulation inside a single dot's tiles. No layout churn: NHWC slices
    concat natively on the minor axis, and HWIO.reshape(-1, O) is already
    (i, j, c)-major.
    """
    from dgq_tpu.quant.affine import QParams as _QP, fake_quant as _fq

    kh, kw, c, o = p["w"].shape
    b, h, w, _ = x.shape
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    dm2, zm2, dl4, zl4 = _group_tap_scales(gqp, c, kh, kw, ho, wo)

    cols = []
    for i in range(kh):
        for j in range(kw):
            xs = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (b, i + (ho - 1) * stride + 1, j + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            ij = i * kw + j
            d_ij = dm2[:, ij % dm2.shape[1]].reshape(1, 1, 1, -1) * dl4
            z_ij = zm2[:, ij % zm2.shape[1]].reshape(1, 1, 1, -1) + zl4
            cols.append(_fq(xs, _QP(d_ij, z_ij), cfg.a_bits))
    big = jnp.concatenate(cols, axis=-1)  # (B, H', W', kh*kw*C)
    w2 = jnp.reshape(p["w"], (kh * kw * c, o))  # (i, j, c)-major, free view
    y = jnp.einsum(
        "bhwk,ko->bhwo", big, w2.astype(big.dtype),
        preferred_element_type=jnp.float32,
    )
    if p.get("b") is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def group_quant_conv2d_taps(
    p,
    x: jax.Array,
    gqp,
    cfg: QConfig,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Group-quantized conv without materializing the im2col tensor.

    The reference applies group scales to the unfolded input (B, C*kh*kw, L)
    (quant_layer.py:630-657): tap (c, i, j) at output location l is quantized
    with delta_mid[c*kh*kw + i*kw + j] * delta_last[l]. The same input pixel is
    quantized differently per tap, which is why the reference materializes the
    unfold — a 9x HBM activation blow-up for 3x3 convs.

    Here the conv is decomposed by tap: for each (i, j), the strided slice of
    the padded input is quantized to codes with that tap's scales (an
    elementwise VPU op XLA fuses into the matmul's producer) and contracted
    against w[i, j] as a 1x1 matmul on the MXU. Summation over taps reproduces
    the unfold result exactly (same per-element quantization; f32
    accumulation).

    The op is VPU-bound on the per-tap quantize arithmetic (measured v5e:
    1.72 ms at 8x64x64x320, ~= 9 taps x ~7 ops/elem at VPU rate), so the
    dequantize half of fake-quant is removed algebraically — only the
    integer-code computation touches input-sized data:

        fq(x)·w = dl[l] * (q' @ (dm·w)),   per tap ij:
        q' = clip(round(x / (dm·dl)), -(zm+zl), 2^b-1-(zm+zl))

    The shifted-clip form keeps the (fractional) zero point in the clip
    BOUNDS instead of adding it to the codes: q' is an integer everywhere
    except at the rare clip boundaries, and the zero-point term telescopes
    out of the sum entirely — no output corrections. (An earlier form
    computed q = round(x/d)+z with corrections C1/C2; with a fractional z
    every code carried a constant fractional part that bf16 rounds away at
    ulp(128)=1.0, leaving a systematic per-channel bias ~0.03 on outputs of
    scale ~2. The shifted form measures chan-bias ~1e-3, the bf16 input
    rounding floor.) The dm fold into w is weight-sized; dl factors out of
    the tap sum. STE gradients are identical to the fake-quant form inside
    the clip region (d/dx = w) and zero outside it.

    The codes are cast to the input dtype (bf16) before the matmul: integer
    codes in (-2^b, 2^b) are exactly representable in bf16's 8-bit mantissa,
    and the MXU runs bf16 x bf16 -> f32 at 2x the f32 rate. Measured v5e
    (chained-op, ms/conv): 1.45 vs 1.98 fake-quant at 8x64x64x320, 1.13 vs
    1.35 at 8x32x32x640; an f32-codes variant of the same fold measured no
    faster than fake-quant (2.01 / 1.21) — the win needs both the algebraic
    dequant removal AND the bf16 MXU feed.
    """
    from dgq_tpu.quant.affine import quant_bounds, ste_round

    kh, kw, c, o = p["w"].shape
    b, h, w, _ = x.shape
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    dm2, zm2, dl4, zl4 = _group_tap_scales(gqp, c, kh, kw, ho, wo)
    nb, pb = quant_bounds(cfg.a_bits, False, False)

    # fold dm into the weight
    ncols = dm2.shape[1]
    taps = kh * kw
    # (taps, c, 1) per-tap channel scales
    dm_t = jnp.transpose(dm2[:, jnp.arange(taps) % ncols])[:, :, None]
    wf = jnp.reshape(p["w"], (taps, c, o)).astype(jnp.float32)
    ws = (wf * dm_t).astype(x.dtype)               # bf16 MXU feed

    # reciprocals once (channel-sized): the per-element op is a multiply,
    # not a VPU divide
    rdm2 = 1.0 / dm2.astype(jnp.float32)
    rdl4 = 1.0 / dl4.astype(jnp.float32)
    acc = jnp.zeros((b, ho, wo, o), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            xs = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (b, i + (ho - 1) * stride + 1, j + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            ij = i * kw + j
            rd_ij = rdm2[:, ij % ncols].reshape(1, 1, 1, -1) * rdl4
            z_ij = zm2[:, ij % ncols].reshape(1, 1, 1, -1) + zl4
            q = jnp.clip(ste_round(xs.astype(jnp.float32) * rd_ij),
                         nb - z_ij, pb - z_ij).astype(x.dtype)
            acc = acc + jnp.einsum(
                "bhwc,co->bhwo", q, ws[ij],
                preferred_element_type=jnp.float32,
            )
    acc = dl4 * acc
    if p.get("b") is not None:
        acc = acc + p["b"]
    return acc.astype(x.dtype)


def quant_conv2d(
    p,
    x: jax.Array,
    name: str,
    qstate: Optional[QState],
    cfg: QConfig,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """QuantLayer-conv forward (reference quant_layer.py:626-661).

    Group-mode layers (in cfg.group_conv_layers) quantize the unfolded input
    (materialized 'unfold' impl, or the equivalent tap-decomposed form);
    otherwise the activation quantizer applies elementwise pre-conv and the
    conv runs natively on the MXU (int8 when packed codes are present).
    """
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    if name in cfg.group_conv_layers and cfg.use_aq:
        gqp = (qstate or {}).get("a", {}).get(name) if qstate is not None else None
        if gqp is not None and cfg.group_conv_impl in ("fused", "taps", "im2col"):
            # one tap site for every non-materializing impl: collectors get
            # the reference's unfolded layout regardless of dataflow
            _tap_unfolded(qstate, cfg, name, x, (kh, kw, stride, padding))
        if cfg.group_conv_impl == "fused" and gqp is not None:
            from dgq_tpu.ops.pallas.group_conv import (
                fused_eligible,
                group_quant_conv,
            )

            if fused_eligible(x.shape, p["w"].shape[-1], kh, kw, stride,
                              padding, gqp,
                              dtype_bytes=jnp.dtype(x.dtype).itemsize):
                c = x.shape[-1]
                # mid axis is c-major (c, i, j); kernel wants (tap, channel)
                dm = jnp.reshape(gqp.delta_mid, (c, kh * kw)).T
                zm = jnp.reshape(gqp.zp_mid, (c, kh * kw)).T
                return group_quant_conv(
                    x, p["w"], dm, zm,
                    gqp.delta_last.reshape(-1)[0], gqp.zp_last.reshape(-1)[0],
                    p.get("b"), kh=kh, kw=kw, padding=padding,
                    a_bits=cfg.a_bits,
                    interpret=jax.default_backend() == "cpu",
                )
            return group_quant_conv2d_taps(p, x, gqp, cfg, stride, padding)
        if cfg.group_conv_impl == "taps" and gqp is not None:
            return group_quant_conv2d_taps(p, x, gqp, cfg, stride, padding)
        if cfg.group_conv_impl == "im2col" and gqp is not None:
            return group_quant_conv2d_im2col(p, x, gqp, cfg, stride, padding)
        b, h, w, _ = x.shape
        ho = (h + 2 * padding - kh) // stride + 1
        wo = (w + 2 * padding - kw) // stride + 1
        x_unf = unfold_nhwc(x, kh, kw, stride, padding)
        c = x.shape[-1]
        if (gqp is not None and hasattr(gqp, "delta")
                and not hasattr(gqp, "delta_mid")
                and getattr(gqp.delta, "size", 0) == c and c != 1):
            # Per-channel (C,) plain QParams on a group-listed layer: the
            # taps impl applies delta[c] to every tap of channel c; expand to
            # the c-major unfolded mid axis so both impls agree (a bare (C,)
            # would otherwise broadcast against the location axis L).
            from dgq_tpu.models.qconfig import _tap
            from dgq_tpu.quant.affine import QParams as _QP, fake_quant as _fq

            d = jnp.repeat(gqp.delta.reshape(-1), kh * kw)
            z = jnp.repeat(
                jnp.broadcast_to(gqp.zero_point.reshape(-1),
                                 (gqp.delta.size,)), kh * kw)
            _tap(name, x_unf)
            x_unf = _fq(x_unf, _QP(d.reshape(1, c * kh * kw, 1),
                                   z.reshape(1, c * kh * kw, 1)), cfg.a_bits)
        else:
            x_unf = aq_apply(qstate, cfg, name, x_unf)
        return conv2d_unfolded(p, x_unf.astype(x.dtype), (ho, wo))
    qp = _int8_qp(p, qstate, cfg, name)
    if qp is not None:
        from dgq_tpu.models.qconfig import _tap

        if (kh == 1 and kw == 1 and stride == 1 and padding == 0
                and "w_q8" in p and cfg.use_int8_matmul):
            b, h, w, c = x.shape
            x2 = jnp.reshape(x, (b * h * w, c))
            if cfg.int8_impl == "xla":
                if _int8_xla_eligible(x2.shape[0], c):
                    _tap(name, x)  # collectors see the pre-quant input
                    y = _int8_matmul_xla(p, x2, qp, cfg)
                    return jnp.reshape(y, (b, h, w, y.shape[-1]))
            else:
                _tap(name, x)
                y = _int8_matmul(p, x2, qp, cfg)
                return jnp.reshape(y, (b, h, w, y.shape[-1]))
        if "w_q8c" in p and cfg.use_int8_conv:
            _tap(name, x)
            return _int8_conv(p, x, qp, cfg, stride, padding)
    qpf = _fold_qp(qstate, cfg, name)
    if qpf is not None:
        from dgq_tpu.models.qconfig import _tap

        _tap(name, x)  # calibration collectors see the pre-quant input
        return _codes_conv2d(p, x, qpf, cfg, stride, padding)
    # fake-quant fallback: keep the ORIGINAL activation dtype into the conv
    # (the quantizer divides by an f32 delta, which would silently upcast a
    # bf16 run to f32 for every downstream layer)
    return conv2d(p, aq_apply(qstate, cfg, name, x).astype(x.dtype),
                  stride, padding)


def _tap_unfolded(qstate, cfg, name, x, conv_geom):
    """Publish the unfolded calibration tap only when a collector is active.

    The taps path never materializes the im2col tensor, but calibration
    collectors expect taps in the reference's unfolded layout. Trace-time
    check: free when no collector is installed."""
    from dgq_tpu.models.qconfig import taps_active, _tap

    if taps_active():
        kh, kw, stride, padding = conv_geom
        _tap(name, unfold_nhwc(x, kh, kw, stride, padding))


def _fold_qp(qstate, cfg, name):
    """Per-tensor activation QParams eligible for the codes-fold deploy path."""
    if qstate is None or not cfg.use_aq or not cfg.fold_act_dequant:
        return None
    from dgq_tpu.models.qconfig import GroupQParams

    qp = qstate.get("a", {}).get(name)
    if qp is None or isinstance(qp, GroupQParams) or not hasattr(qp, "delta"):
        return None
    if getattr(qp.delta, "ndim", 1) != 0 or getattr(qp.zero_point, "ndim", 1) != 0:
        return None  # per-channel / group scales stay on the fake-quant path
    return qp


def _fold_codes(x, qp, bits):
    """Shifted integer codes q' = clip(round(x/Δ), -zp, PB-zp), cast to the
    input dtype for the MXU. Δ·q' == fake_quant(x) exactly: the zero point
    lives in the clip bounds (no add/sub), the dequantize multiply moves to
    the consumer's epilogue, and zero padding of q' dequantizes to 0.0.
    Codes are integers in [-PB, PB] — exact in bf16's 8-bit mantissa for
    bits <= 8. STE gradient: d/dx = 1/Δ inside the clip region, matching the
    fake-quant form once the consumer multiplies by Δ."""
    from dgq_tpu.quant.affine import quant_bounds, ste_round

    nb, pb = quant_bounds(bits, False, False)
    d = qp.delta.astype(jnp.float32)
    z = qp.zero_point.astype(jnp.float32)
    q = jnp.clip(ste_round(x.astype(jnp.float32) * (1.0 / d)),
                 nb - z, pb - z)
    return q.astype(x.dtype), d


def _codes_linear(p, x, qp, cfg):
    q, d = _fold_codes(x, qp, cfg.a_bits)
    y = jnp.dot(q, p["w"].astype(q.dtype), preferred_element_type=jnp.float32) * d
    if p.get("b") is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def _codes_conv2d(p, x, qp, cfg, stride, padding):
    q, d = _fold_codes(x, qp, cfg.a_bits)
    y = jax.lax.conv_general_dilated(
        q,
        p["w"].astype(q.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) * d
    if p.get("b") is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def _int8_qp(p, qstate, cfg, name):
    """Per-tensor activation QParams for the int8 kernel path, if eligible."""
    if not ((cfg.use_int8_matmul or cfg.use_int8_conv) and cfg.use_aq
            and qstate is not None):
        return None
    if "w_q8" not in p and "w_q8c" not in p:
        return None
    qp = (qstate.get("a") or {}).get(name)
    if qp is None or not hasattr(qp, "delta"):
        return None
    if getattr(qp.delta, "ndim", 1) != 0:
        return None  # group scales stay on the fake-quant path
    return qp


def _int8_matmul(p, x2, qp, cfg):
    from dgq_tpu.ops.pallas.int8_matmul import quantized_matmul

    off = 2 ** (cfg.a_bits - 1)
    # round the zero point before code construction: the kernel truncates
    # codes with astype(int8), so a fractional zp would bias every stored
    # code by -frac(zp) while the epilogue still corrects with the exact zp
    # (the XLA sibling below rounds for the same reason)
    zp = jnp.round(qp.zero_point.astype(jnp.float32))
    return quantized_matmul(
        x2, p["w_q8"], p["w_d"], p["w_z"],
        qp.delta.astype(jnp.float32), zp - off,
        p.get("b"), a_bits=cfg.a_bits, out_dtype=x2.dtype,
    )


# XLA int8 shape gate: measured on v5e (50-run medians, full zero-point
# corrections, producer+consumer context), s8 dot_general wins only where the
# reduction is narrow and the row count large — the 64x64-level projections
# (M=32768, K=320: 0.67 vs 0.84 ms) and FF-in (320->2560: 0.94 vs 1.09);
# wide-K reductions lose badly (1280->320: 2.42 vs 0.83).
_INT8_XLA_MIN_M = 16384
_INT8_XLA_MAX_K = 512


def _int8_xla_eligible(m: int, k: int) -> bool:
    return m >= _INT8_XLA_MIN_M and k <= _INT8_XLA_MAX_K


def _int8_matmul_xla(p, x2, qp, cfg):
    """XLA-native real-int8 matmul: quantize-to-codes fuses into the
    activation's producer (halving the HBM write vs a bf16 fake-quant copy),
    the MXU runs s8xs8->s32 at 2x bf16 rate, and the affine cross terms are
    removed analytically:

        fq(x)·fq(w) = dx*dw[n] * (u@w8 - zx*wksum[n] - wz[n]*rowsum[m]
                                  + K*zx*wz[n])

    with u/w8 the recentered int8 codes, zx/wz the recentered zero points.
    Exact in f32 (|acc| < 2^22), so it matches the fake-quant oracle to
    bf16 output rounding."""
    off = 2 ** (cfg.a_bits - 1)
    dx = qp.delta.astype(jnp.float32)
    zp = jnp.round(qp.zero_point.astype(jnp.float32))
    zx = zp - off
    u = (jnp.clip(jnp.round(x2.astype(jnp.float32) / dx) + zp,
                  0, 2 ** cfg.a_bits - 1) - off).astype(jnp.int8)
    acc = jax.lax.dot_general(
        u, p["w_q8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    rowsum = jnp.sum(u.astype(jnp.int32), axis=1, keepdims=True
                     ).astype(jnp.float32)
    k = x2.shape[-1]
    y = dx * p["w_d"] * (acc - zx * p["w_ksum"] - p["w_z"] * rowsum
                         + float(k) * zx * p["w_z"])
    if p.get("b") is not None:
        y = y + p["b"]
    return y.astype(x2.dtype)


def _int8_conv(p, x, qp, cfg, stride: int, padding: int):
    """k×k conv in real int8 on the MXU (XLA s8xs8->s32 conv lowering).

    Quantize-then-pad: the input is quantized to recentered int8 codes and the
    border is padded with the (recentered) activation zero-point code, so
    padded taps dequantize to exactly 0.0 — matching the reference's
    zero-pad-then-fake-quant conv semantics (quant_layer.py:626-661 with
    F.conv2d zero padding). The affine cross terms are removed analytically:

        y = dx*dw[o] * ( conv(xq, wq)            # int32 MXU accumulate
                         - zx * wksum[o]         # wksum = sum_khkwC wq
                         - zw[o] * window_sum(xq)
                         + kh*kw*C * zx * zw[o] )

    window_sum runs as a cheap reduce_window on the channel-summed codes.
    """
    kh, kw, c, o = p["w"].shape
    off = 2 ** (cfg.a_bits - 1)
    dx = qp.delta.astype(jnp.float32)
    zp_r = jnp.round(qp.zero_point.astype(jnp.float32))
    codes = (
        jnp.clip(jnp.round(x.astype(jnp.float32) / dx) + zp_r,
                 0, 2 ** cfg.a_bits - 1) - off
    ).astype(jnp.int8)
    zx = zp_r - off  # recentered zero-point code (float scalar)
    if padding:
        codes = jnp.pad(
            codes,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=zx.astype(jnp.int8),
        )
    acc = jax.lax.conv_general_dilated(
        codes, p["w_q8c"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    csum = jnp.sum(codes.astype(jnp.int32), axis=-1, keepdims=True)
    xsum = jax.lax.reduce_window(
        csum, jnp.int32(0), jax.lax.add,
        (1, kh, kw, 1), (1, stride, stride, 1), "VALID",
    ).astype(jnp.float32)
    dw = p["w_d"]       # (O,) per-out-channel weight scale
    zw = p["w_z"]       # (O,) recentered weight zero point
    wksum = p["w_ksum"] # (O,) sum of weight codes over (kh, kw, C)
    y = dx * dw * (acc - zx * wksum - zw * xsum + float(kh * kw * c) * zx * zw)
    if p.get("b") is not None:
        y = y + p["b"]
    return y.astype(x.dtype)


def quant_linear(
    p,
    x: jax.Array,
    name: str,
    qstate: Optional[QState],
    cfg: QConfig,
) -> jax.Array:
    """QuantLayer-linear forward: aqtizer(x) then matmul. With packed int8
    weights and a per-tensor activation scale, the whole thing runs as one
    Pallas int8 MXU kernel (quantization in-kernel, 2x bf16 throughput)."""
    qp = _int8_qp(p, qstate, cfg, name) if cfg.use_int8_matmul else None
    if qp is not None:
        from dgq_tpu.models.qconfig import _tap

        x2 = jnp.reshape(x, (-1, x.shape[-1]))
        if cfg.int8_impl == "xla":
            if _int8_xla_eligible(x2.shape[0], x2.shape[1]):
                _tap(name, x)  # collectors see the pre-quant input
                y = _int8_matmul_xla(p, x2, qp, cfg)
                return jnp.reshape(y, x.shape[:-1] + (y.shape[-1],))
        else:
            _tap(name, x)
            y = _int8_matmul(p, x2, qp, cfg)
            return jnp.reshape(y, x.shape[:-1] + (y.shape[-1],))
    qpf = _fold_qp(qstate, cfg, name)
    if qpf is not None:
        from dgq_tpu.models.qconfig import _tap

        _tap(name, x)  # calibration collectors see the pre-quant input
        return _codes_linear(p, x, qpf, cfg)
    # fake-quant fallback: keep the ORIGINAL activation dtype into the
    # matmul (the f32 delta would silently upcast a bf16 run)
    return linear(p, aq_apply(qstate, cfg, name, x).astype(x.dtype))


def group_norm(p, x: jax.Array, groups: int = 32, eps: float = 1e-5,
               stats_barrier: bool = False) -> jax.Array:
    """GroupNorm over NHWC (channel-last). Statistics in f32 (bf16-safe).

    Layout-aware: the naive form (reshape to (B, HW, G, C/G), mean/var over
    (1, 3)) reduces over a C/G = 10..40-wide MINOR axis, which the VPU runs
    at a fraction of bandwidth — profiled at 17 ms/forward across the UNet's
    norms, ~17x off the memory bound. Instead:
      1. one pass of per-CHANNEL sum and sum-of-squares over (H, W) — the
         channel-minor axis stays intact, so the reduction is bandwidth-bound
         (XLA fuses both into a single read of x);
      2. group aggregation on the tiny (B, C) partials;
      3. one elementwise pass out = x*A + B with per-(B,C) A/B folding the
         normalize and the affine — emitted in the INPUT dtype, so XLA can
         fuse it into the consumer (SiLU -> conv) instead of materializing
         an f32 tensor.
    Variance uses the one-pass E[x^2] - E[x]^2 form in f32: relative error
    ~1e-7 * (1 + mean^2/var), negligible against the <5e-3 full-width parity
    bound for any activation distribution the UNet produces.
    """
    b, h, w, c = x.shape
    cg = c // groups
    # stats_barrier: identity optimization_barrier between the producer
    # (conv) and the stats reads. At VAE-decode sizes XLA spatially windows
    # the convolutions and output-fuses the norm's x^2 computation into
    # them, materializing (and layout-copying) an f32 x^2 tensor — measured
    # 194 -> 137 ms per 4x512px decode with the barrier (both reductions
    # then input-fuse over the bf16 activation). At UNet sizes the same
    # barrier is ~0.5 ms/fwd SLOWER (no windowing pathology to block), so
    # it is per-call-site: pipeline/vae.py passes True, the UNet path does
    # not. DGQ_NORM_IMPL=barrier|"" (trace-time env) overrides for A/B
    # (scripts/profile_vae.py, scripts/bench_step_ablate.py).
    impl = os.environ.get("DGQ_NORM_IMPL")
    use_barrier = stats_barrier if impl is None else (impl == "barrier")
    xs = jax.lax.optimization_barrier(x) if use_barrier else x
    xf = xs.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))       # (B, C), same-pass ...
    s2 = jnp.sum(xf * xf, axis=(1, 2))  # ... multi-output fusion
    g1 = jnp.sum(jnp.reshape(s1, (b, groups, cg)), axis=2)  # (B, G)
    g2 = jnp.sum(jnp.reshape(s2, (b, groups, cg)), axis=2)
    n = h * w * cg
    mean = g1 / n
    var = g2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.reshape(jnp.broadcast_to(mean[:, :, None], (b, groups, cg)), (b, c))
    rstd_c = jnp.reshape(jnp.broadcast_to(rstd[:, :, None], (b, groups, cg)), (b, c))
    a = rstd_c * p["scale"][None, :].astype(jnp.float32)
    bb = p["bias"][None, :].astype(jnp.float32) - mean_c * a
    out = xf * a[:, None, None, :] + bb[:, None, None, :]
    return out.astype(x.dtype)


def layer_norm(p, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the minor axis, one-pass stats (see group_norm: the
    fused sum/sum-of-squares read + a single x*A+B elementwise emission in
    the input dtype keeps this at memory speed)."""
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    n = x.shape[-1]
    mean = s1 / n
    var = s2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    a = rstd * p["scale"].astype(jnp.float32)
    out = xf * a + (p["bias"].astype(jnp.float32) - mean * a)
    return out.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def timestep_embedding(timesteps: jax.Array, num_channels: int = 320) -> jax.Array:
    """Sinusoidal timestep projection (reference sd.py:20-39): cos then sin.

    Arguments reach ~1000 rad; XLA's f32 trig loses ~1e-3 there without help,
    so reduce mod 2*pi first (keeps us within ~1e-4 of libm).
    """
    half = num_channels // 2
    exponent = -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    two_pi = 2.0 * jnp.pi
    emb = emb - two_pi * jnp.floor(emb / two_pi)
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def geglu_ff(p, prefix: str, x: jax.Array, qstate, cfg) -> jax.Array:
    """GEGLU feed-forward (reference sd.py:210-236): proj -> chunk -> x1*gelu(x2)."""
    h = quant_linear(p[f"{prefix}.net.0.proj"], x, f"{prefix}.net.0.proj", qstate, cfg)
    x1, x2 = jnp.split(h, 2, axis=-1)
    h = x1 * jax.nn.gelu(x2, approximate=False)
    return quant_linear(p[f"{prefix}.net.2"], h, f"{prefix}.net.2", qstate, cfg)


def _sm_select(qstate, cfg: QConfig, prefix: str):
    """Softmax-quant mode + static delta for the fused attention kernel."""
    if cfg.use_aq and cfg.t2i_log_quant:
        sm_mode = "log2_real_time" if cfg.t2i_real_time else "log2"
        sm_delta = (
            jnp.ones(()) if cfg.log_max_1
            else (qstate or {}).get("sm", {}).get(f"{prefix}.aqtizer_w")
        )
        if sm_mode == "log2" and sm_delta is None:
            sm_mode = "none"
        return sm_mode, sm_delta
    if cfg.use_aq and (qstate or {}).get("a", {}).get(f"{prefix}.aqtizer_w") is not None:
        # the kernel quantizes with implicit zero_point=0, which is exact
        # for aqtizer_w: the reference constructs it always_zero
        # (quant_block.py:145-156 -> quant_layer.py:37, zp pinned to 0),
        # and softmax_q_apply passes always_zero=True for the same point
        return "uniform", qstate["a"][f"{prefix}.aqtizer_w"].delta
    return "none", None


def _unpack_heads(x: jax.Array, num_heads: int, head_dim: int) -> jax.Array:
    """(B, T, H*dp) packed head-slot tensor -> (B, T, H*head_dim) reference
    layout (drop the zero padding lanes)."""
    b, t, cp = x.shape
    dp = cp // num_heads
    x4 = jnp.reshape(x, (b, t, num_heads, dp))[..., :head_dim]
    return jnp.reshape(x4, (b, t, num_heads * head_dim))


def _repack_heads(x: jax.Array, num_heads: int, dp: int) -> jax.Array:
    """(B, T, H*head_dim) -> (B, T, H*dp) zero-padded head slots (for the
    packed to_out.0 weight when a non-packed attention path produced x)."""
    b, t, c = x.shape
    d = c // num_heads
    x4 = jnp.pad(jnp.reshape(x, (b, t, num_heads, d)),
                 ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    return jnp.reshape(x4, (b, t, num_heads * dp))


def _attn_out(p, prefix, out, qstate, cfg, num_heads):
    """Final projection; re-pads head slots when to_out.0 carries packed
    rows but `out` is in the reference layout."""
    w_rows = p[f"{prefix}.to_out.0"]["w"].shape[0]
    if w_rows != out.shape[-1]:
        out = _repack_heads(out, num_heads, w_rows // num_heads)
    return quant_linear(p[f"{prefix}.to_out.0"], out, f"{prefix}.to_out.0",
                        qstate, cfg)


def _attention_packed(p, prefix, q, k, v, num_heads, scale, s, qstate, cfg,
                      start_peak, dtype):
    """Packed head-slot attention: q/k/v stay (B, T/S, H*dp) end to end;
    the fused kernel carves per-head lane slots via BlockSpecs. Per-tensor
    quantizers apply identically in this layout (0 -> 0 on padding lanes)."""
    from dgq_tpu.ops.pallas.attention import fused_attention

    q = aq_apply(qstate, cfg, f"{prefix}.aqtizer_q", q)
    if start_peak:
        # key position 0 (sequence row 0) is spared, as in the reference
        k = jnp.concatenate(
            [k[:, 0:1, :],
             aq_apply(qstate, cfg, f"{prefix}.aqtizer_k", k[:, 1:, :])],
            axis=1)
    else:
        k = aq_apply(qstate, cfg, f"{prefix}.aqtizer_k", k)
    v = aq_apply(qstate, cfg, f"{prefix}.aqtizer_v", v)
    sm_mode, sm_delta = _sm_select(qstate, cfg, prefix)
    out = fused_attention(
        q, k, v, scale,
        sm_mode=sm_mode, sm_bits=cfg.softmax_bits, sm_delta=sm_delta,
        start_peak=start_peak and cfg.use_aq,
        interpret=jax.default_backend() == "cpu",
        num_heads=num_heads,
    ).astype(dtype)
    return quant_linear(p[f"{prefix}.to_out.0"], out, f"{prefix}.to_out.0",
                        qstate, cfg)


def attention(
    p,
    prefix: str,
    x: jax.Array,
    ehs: Optional[jax.Array],
    num_heads: int,
    qstate: Optional[QState],
    cfg: QConfig,
    start_peak: bool = False,
) -> jax.Array:
    """Quantization-aware attention (reference Attention_forward, sd.py:151-207).

    Quant points: aqtizer_q on q, aqtizer_k on k (sparing the prompt start
    token when start_peak), log2/affine aqtizer_w on the float32 post-softmax
    weights (again sparing key position 0 under start_peak), aqtizer_v on v.
    """
    b, t, c = x.shape
    head_dim = c // num_heads
    scale = head_dim ** -0.5

    q = quant_linear(p[f"{prefix}.to_q"], x, f"{prefix}.to_q", qstate, cfg)
    kv_in = ehs if ehs is not None else x
    k = quant_linear(p[f"{prefix}.to_k"], kv_in, f"{prefix}.to_k", qstate, cfg)
    v = quant_linear(p[f"{prefix}.to_v"], kv_in, f"{prefix}.to_v", qstate, cfg)

    s = kv_in.shape[1]

    from dgq_tpu.models.qconfig import taps_active

    if cfg.packed_attention:
        dp = q.shape[-1] // num_heads
        # dp % 128 == 0: one head per lane-aligned slot. dp == 64 with an
        # even head count: the PAIR-packed layout (two 64-wide slots per
        # 128-lane block) — covers slot-64-packed weights AND models whose
        # native head_dim is already 64 (SDXL) with no weight packing at all.
        if (cfg.use_pallas_attention and not taps_active()
                and dp * num_heads == q.shape[-1]
                and (dp % 128 == 0 or (dp == 64 and num_heads % 2 == 0))):
            return _attention_packed(
                p, prefix, q, k, v, num_heads, scale, s, qstate, cfg,
                start_peak, x.dtype)
        if q.shape[-1] != c:
            # packed weights but a path that needs the reference layout
            # (taps during calibration / XLA attention): slice the padding
            # lanes back out, and re-pad the output for the packed to_out
            q = _unpack_heads(q, num_heads, head_dim)
            k = _unpack_heads(k, num_heads, head_dim)
            v = _unpack_heads(v, num_heads, head_dim)
    q = jnp.transpose(jnp.reshape(q, (b, t, num_heads, head_dim)), (0, 2, 1, 3))
    k = jnp.transpose(jnp.reshape(k, (b, s, num_heads, head_dim)), (0, 2, 1, 3))
    v = jnp.transpose(jnp.reshape(v, (b, s, num_heads, head_dim)), (0, 2, 1, 3))

    # aq_apply/softmax_q_apply no-op (but publish calibration taps) when
    # quantization is off, so these run unconditionally.
    q = aq_apply(qstate, cfg, f"{prefix}.aqtizer_q", q)
    if start_peak:
        k0 = k[..., 0:1, :]
        k_rest = aq_apply(qstate, cfg, f"{prefix}.aqtizer_k", k[..., 1:, :])
        k = jnp.concatenate([k0, k_rest], axis=-2)
    else:
        k = aq_apply(qstate, cfg, f"{prefix}.aqtizer_k", k)

    if cfg.use_pallas_attention:
        # fused kernel covers scores -> softmax -> softmax-quant -> @V
        from dgq_tpu.ops.pallas.attention import fused_attention

        v = aq_apply(qstate, cfg, f"{prefix}.aqtizer_v", v)
        from dgq_tpu.models.qconfig import _tap, taps_active

        if taps_active():
            # Calibration collectors need the post-softmax tensor the fused
            # kernel never materializes (cf. _tap_unfolded for group convs).
            # Trace-time gated: free in deploy. Matches the XLA path's tap
            # (sliced past key 0 under start_peak).
            sc = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) * scale
            attn_f = jax.nn.softmax(sc.astype(jnp.float32), axis=-1)
            _tap(f"{prefix}.aqtizer_w",
                 attn_f[..., 1:] if start_peak else attn_f)
        sm_mode, sm_delta = _sm_select(qstate, cfg, prefix)
        out = fused_attention(
            jnp.reshape(q, (b * num_heads, t, head_dim)),
            jnp.reshape(k, (b * num_heads, s, head_dim)),
            jnp.reshape(v, (b * num_heads, s, head_dim)),
            scale,
            sm_mode=sm_mode, sm_bits=cfg.softmax_bits, sm_delta=sm_delta,
            start_peak=start_peak and cfg.use_aq,
            interpret=jax.default_backend() == "cpu",
            # A/B hook for the real_time kernel structure (fused | two_call);
            # read at trace time, None -> the kernel's default
            rt_impl=os.environ.get("DGQ_RT_IMPL") or None,
        )
        out = jnp.reshape(out, (b, num_heads, t, head_dim))
        out = jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, t, c)).astype(x.dtype)
        return _attn_out(p, prefix, out, qstate, cfg, num_heads)

    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    if start_peak:
        a0 = attn[..., 0:1]
        a_rest = softmax_q_apply(qstate, cfg, f"{prefix}.aqtizer_w", attn[..., 1:])
        attn = jnp.concatenate([a0, a_rest], axis=-1)
    else:
        attn = softmax_q_apply(qstate, cfg, f"{prefix}.aqtizer_w", attn)
    v = aq_apply(qstate, cfg, f"{prefix}.aqtizer_v", v)

    attn = attn.astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v, preferred_element_type=jnp.float32)
    out = jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, t, c)).astype(x.dtype)
    return _attn_out(p, prefix, out, qstate, cfg, num_heads)


def basic_transformer_block(
    p,
    prefix: str,
    x: jax.Array,
    ehs: Optional[jax.Array],
    num_heads: int,
    qstate,
    cfg: QConfig,
) -> jax.Array:
    """Self-attn -> cross-attn -> GEGLU FF, each residual (reference sd.py:239-270).

    start_peak applies only to attn2, the cross attention
    (reference quant_block.py:157-158).
    """
    res = x
    h = layer_norm(p[f"{prefix}.norm1"], x)
    x = attention(p, f"{prefix}.attn1", h, None, num_heads, qstate, cfg) + res

    res = x
    h = layer_norm(p[f"{prefix}.norm2"], x)
    x = attention(
        p, f"{prefix}.attn2", h, ehs, num_heads, qstate, cfg,
        start_peak=cfg.t2i_start_peak,
    ) + res

    res = x
    h = layer_norm(p[f"{prefix}.norm3"], x)
    return geglu_ff(p, f"{prefix}.ff", h, qstate, cfg) + res


def resnet_block(
    p,
    prefix: str,
    x: jax.Array,
    temb: jax.Array,
    qstate,
    cfg: QConfig,
    has_shortcut: bool,
) -> jax.Array:
    """ResnetBlock2D (reference sd.py:57-98), NHWC."""
    h = group_norm(p[f"{prefix}.norm1"], x)
    h = silu(h)
    h = quant_conv2d(p[f"{prefix}.conv1"], h, f"{prefix}.conv1", qstate, cfg, 1, 1)

    te = silu(temb)
    te = quant_linear(p[f"{prefix}.time_emb_proj"], te, f"{prefix}.time_emb_proj", qstate, cfg)
    h = h + te[:, None, None, :]

    h = group_norm(p[f"{prefix}.norm2"], h)
    h = silu(h)
    h = quant_conv2d(p[f"{prefix}.conv2"], h, f"{prefix}.conv2", qstate, cfg, 1, 1)

    if has_shortcut:
        x = quant_conv2d(p[f"{prefix}.conv_shortcut"], x, f"{prefix}.conv_shortcut", qstate, cfg, 1, 0)
    return x + h


def upsample_nearest2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return jnp.reshape(x, (b, h * 2, w * 2, c))
