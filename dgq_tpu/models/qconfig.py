"""Quantization configuration and runtime quantizer state.

The reference wires quantizers by runtime module surgery
(/root/reference/quant/quant_model.py:66-103) and toggles them with mutable
flags. Here the split is explicit and jit-friendly:

  * QConfig — static, hashable: bit widths, which quantizer families are
    active, softmax-quantizer policy. Changing it triggers a re-trace.
  * QState — dynamic pytree: per-layer activation QParams (and optional
    per-timestep stacks), weight QParams/AdaRound alphas during calibration.

Layer names follow the reference state-dict paths (e.g.
"down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q") so checkpoint
mapping is mechanical.
"""
from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Any, Dict, Optional

import jax

from dgq_tpu.quant.affine import QParams, fake_quant
from dgq_tpu.quant.log2 import log2_fake_quant, log2_real_time_quant

# ---------------------------------------------------------------------------
# Activation taps: calibration needs the tensor at every activation-quantizer
# input. Rather than threading a dict through every layer signature, quant
# points publish their pre-quant tensor to a trace-time context. Jitted
# collector wrappers return only the taps they need, so XLA dead-code
# eliminates the rest (the compiled analogue of the reference's forward
# hooks, quant/data_utill.py:80-111).
# ---------------------------------------------------------------------------
_TAPS: contextvars.ContextVar[Optional[dict]] = contextvars.ContextVar(
    "dgq_act_taps", default=None
)


@contextlib.contextmanager
def collect_act_taps(store: dict):
    token = _TAPS.set(store)
    try:
        yield store
    finally:
        _TAPS.reset(token)


def _tap(name: str, x: jax.Array) -> None:
    store = _TAPS.get()
    if store is not None:
        store[name] = x


def taps_active() -> bool:
    """True when a tap collector is installed (trace-time check)."""
    return _TAPS.get() is not None


@dataclasses.dataclass(frozen=True)
class QConfig:
    """Static quantization policy (hashable; safe as a jit static arg)."""

    w_bits: int = 4
    a_bits: int = 8
    softmax_bits: int = 8
    use_wq: bool = False
    use_aq: bool = False
    # cross-attention softmax handling (reference quant_block.py:145-158)
    t2i_log_quant: bool = False
    t2i_real_time: bool = False
    t2i_start_peak: bool = False
    log_max_1: bool = False
    # conv_in / conv_out are excluded from quantization
    # (reference quant_model.py:118-124)
    disable_out_quant: bool = True
    # group-mode conv layers (im2col activation quant) — tuple of layer names,
    # derived from loaded checkpoint delta shapes; static so each conv's path
    # is fixed at trace time.
    group_conv_layers: tuple = ()
    # how group-mode convs execute:
    #   'taps'   — tap-decomposed: per-(kh,kw) fake-quant of the shifted input
    #              + kh*kw accumulated 1x1 matmuls; same math as the reference
    #              unfold path but never materializes the (B, C*kh*kw, L)
    #              im2col tensor in HBM (9x activation traffic for 3x3 convs).
    #   'im2col' — tap-major quantized im2col: one fused concat of the
    #              fake-quantized tap slices along the channel axis + one
    #              K=kh*kw*C matmul; same quantization math as 'taps' with
    #              single-buffer dataflow (no multi-pass f32 accumulator).
    #   'unfold' — materialized im2col, exactly mirroring the reference's
    #              input_unfolded_pseudo_conv2d (quant_layer.py:630-657);
    #              required during group *calibration* (stats are collected on
    #              the unfolded layout) and used as the parity oracle in tests.
    group_conv_impl: str = "taps"
    # deploy path: run attention as the fused Pallas kernel (flash-style,
    # in-kernel softmax quantization) instead of materialized XLA softmax.
    use_pallas_attention: bool = False
    # deploy path: linears (and 1x1 convs) with per-tensor activation scales
    # run as the int8 MXU Pallas kernel (requires packed weights attached by
    # calib.weight_calib.attach_int8_packed).
    use_int8_matmul: bool = False
    # deploy path: k×k convs as XLA s8xs8->s32 convs with analytic zero-point
    # correction (models/layers._int8_conv). Separately gated from the matmul
    # kernel so each can be benchmarked/enabled on its own.
    use_int8_conv: bool = False
    # int8 matmul execution:
    #   'pallas' — the fused Pallas kernel (quantize in-kernel; measured
    #              slower end-to-end on v5e: the custom call is a fusion
    #              barrier).
    #   'xla'    — XLA-native s8xs8->s32 dot_general with analytic zero-point
    #              corrections; the activation quantize fuses into its
    #              producer and HBM traffic halves. Applied only where it
    #              measures faster (M >= 16384 rows, K <= 512 reduction —
    #              the 64x64-level projections/FF-in); other shapes fall back
    #              to fused bf16 fake-quant.
    int8_impl: str = "pallas"
    # deploy path: for per-tensor activation scales, fold the dequantize out
    # of the fake-quant entirely — feed the matmul/conv shifted integer codes
    # q' = clip(round(x/Δ), -zp, PB-zp) (exact in bf16, |q'| <= 2^bits-1) and
    # scale the f32 accumulator by Δ in the bias epilogue. Algebraically
    # identical to fake-quant-then-matmul (Δ·q' == fq(x)); the input-sized
    # elementwise chain shrinks from 6 ops to 3 (div, round, clip) and zero
    # padding stays exact because code 0 dequantizes to 0.0.
    #
    # Default OFF for per-tensor layers: measured end-to-end on v5e (g=1
    # 50-step headline) the codes fold is ~2.5% SLOWER than plain fused
    # fake-quant — 0.871 vs 0.894 img/s (bench.py A/B, round 4) — the
    # post-accumulator Δ·acc + bias epilogue breaks XLA's conv+bias+consumer
    # fusion and that tax exceeds the 3-op elementwise saving. The GROUP
    # taps path keeps its own shifted-clip fold (group_quant_conv2d_taps):
    # there the dequantize being folded is 9x input-sized (per-tap), and the
    # same fold measures 1.45 vs 1.98 ms/conv in its favor.
    fold_act_dequant: bool = False
    # deploy path: attention projections carry packed head-slot weights
    # (calib.weight_calib.pack_attention_heads): each head's columns live in
    # a 128-multiple lane slot, zero-padded past the true head_dim. The
    # attention forward then skips the (B,T,H,D)->(B,H,T,D) transpose, the
    # kernel's jnp.pad, and the output slice — the fused kernel reads the
    # projection outputs directly via lane-offset BlockSpecs (profiled ~10 ms
    # of pure data movement per SD 512px forward). Bit-identical numerics:
    # padding lanes are exact zeros end to end. Requires use_pallas_attention;
    # ignored (with a runtime fallback slice) wherever taps are active.
    packed_attention: bool = False

    def replace(self, **kw) -> "QConfig":
        return dataclasses.replace(self, **kw)


# QState is a plain dict pytree:
#   {
#     'a':  {layer_name: QParams}            # activation quantizers
#     'sm': {attn_name: delta}               # static log2/uniform softmax deltas
#   }
# Per-timestep variants stack a leading [T] axis on every leaf and are indexed
# with jax.tree.map(lambda x: x[slot], qstate) inside the denoising scan.
QState = Dict[str, Any]


class GroupQParams:
    """Group-quant params in canonical two-axis form.

    The reference stores group deltas as (1,C,1) (second-to-last axis) OR
    (1,1,C) (last axis) depending on a per-timestep spread heuristic
    (quant_layer.py:391-402). To keep per-timestep params stackable on a
    leading [T] axis (fixed shapes inside the denoising scan), we canonicalize:
        delta = delta_mid * delta_last,  zp = zp_mid + zp_last
    with the unused axis's vector set to ones/zeros. XLA fuses the broadcast
    product, so the full (C_mid, C_last) matrix never materializes.
    """

    def __init__(self, delta_mid, zp_mid, delta_last, zp_last):
        self.delta_mid = delta_mid
        self.zp_mid = zp_mid
        self.delta_last = delta_last
        self.zp_last = zp_last


jax.tree_util.register_pytree_node(
    GroupQParams,
    lambda g: ((g.delta_mid, g.zp_mid, g.delta_last, g.zp_last), None),
    lambda _, c: GroupQParams(*c),
)


def aq_apply(
    qstate: Optional[QState],
    cfg: QConfig,
    name: str,
    x: jax.Array,
) -> jax.Array:
    """Apply the activation quantizer registered for `name`, if any.

    Mirrors QuantLayer.forward's `aqtizer(x)` (reference quant_layer.py:640-641)
    including group-quant broadcasting against the (possibly unfolded) input.
    """
    _tap(name, x)
    if not cfg.use_aq or qstate is None:
        return x
    qp = qstate.get("a", {}).get(name)
    if qp is None:
        return x
    if isinstance(qp, GroupQParams):
        nm = x.ndim
        dm = qp.delta_mid.reshape((1,) * (nm - 2) + (-1, 1))
        zm = qp.zp_mid.reshape((1,) * (nm - 2) + (-1, 1))
        dl = qp.delta_last.reshape((1,) * (nm - 1) + (-1,))
        zl = qp.zp_last.reshape((1,) * (nm - 1) + (-1,))
        return fake_quant(x, QParams(dm * dl, zm + zl), cfg.a_bits)
    # Broadcast trailing-shaped params against higher-rank activations.
    delta, zp = qp.delta, qp.zero_point
    if delta.ndim > 0 and delta.ndim < x.ndim:
        shape = (1,) * (x.ndim - delta.ndim) + delta.shape
        delta = delta.reshape(shape)
        zp = zp.reshape(shape)
    return fake_quant(x, QParams(delta, zp), cfg.a_bits)


def softmax_q_apply(
    qstate: Optional[QState],
    cfg: QConfig,
    name: str,
    attn_weights: jax.Array,
) -> jax.Array:
    """Quantize post-softmax attention weights (aqtizer_w).

    Policy per reference quant_block.py:145-156: log2 quantizer when
    t2i_log_quant (dynamic per-call max when t2i_real_time, else a calibrated
    delta), otherwise a uniform always_zero affine quantizer.
    """
    _tap(name, attn_weights)
    if not cfg.use_aq or qstate is None:
        return attn_weights
    if cfg.t2i_log_quant:
        if cfg.t2i_real_time:
            return log2_real_time_quant(attn_weights, cfg.softmax_bits)
        if cfg.log_max_1:
            # delta pinned to 1 (reference quant_layer_text.py:90-91) — no
            # calibrated state needed, and the Pallas path quantizes with
            # ones(()) here too; checking the calibrated delta FIRST would
            # silently skip quantization when none exists
            return log2_fake_quant(attn_weights, jax.numpy.ones(()),
                                   cfg.softmax_bits)
        delta = qstate.get("sm", {}).get(name)
        if delta is None:
            return attn_weights
        return log2_fake_quant(attn_weights, delta, cfg.softmax_bits)
    qp = qstate.get("a", {}).get(name)
    if qp is None:
        return attn_weights
    return fake_quant(attn_weights, qp, cfg.softmax_bits, always_zero=True)
