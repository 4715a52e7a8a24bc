"""Synthetic quantizer-state builders for benchmarks and dryruns.

Builds activation qstates with the same shapes/dtypes a real DGQ calibration
produces, without running calibration — throughput and sharding validation
do not depend on the calibrated values (reference checkpoints expand group
scales to per-channel tensors, SURVEY §2.3, so runtime shapes are identical
for any g>1).
"""
from __future__ import annotations

import jax.numpy as jnp

from dgq_tpu.calib.act_calib import act_qpoint_names
from dgq_tpu.models.qconfig import GroupQParams
from dgq_tpu.quant.affine import QParams


def synthetic_group_qstate(spec, t_slots: int, time_aware: bool, dtype):
    """Synthetic g>1 DGQ group activation qparams: every k×k conv gets
    mid-axis (C*kh*kw) group scales (the reference's unfold layout,
    quant_layer.py:391-402), every other tap per-tensor. The group COUNT
    does not appear here: saved group checkpoints expand per-cluster scales
    to per-channel tensors (SURVEY §2.3), so runtime shapes — and therefore
    throughput — are identical for any g>1. Only group mode on/off changes
    the executed program.

    Returns (qstate, group_conv_layer_names)."""
    lead = (t_slots,) if time_aware else ()
    conv_meta = {n: m for n, k, m in spec if k == "conv"}

    a = {}
    group_layers = []
    for n in act_qpoint_names(spec):
        m = conv_meta.get(n)
        if m is not None and m[2] > 1:
            ckk = m[0] * m[2] * m[2]
            a[n] = GroupQParams(
                delta_mid=jnp.full(lead + (ckk,), 0.05, dtype),
                zp_mid=jnp.full(lead + (ckk,), 128.0, dtype),
                delta_last=jnp.ones(lead + (1,), dtype),
                zp_last=jnp.zeros(lead + (1,), dtype),
            )
            group_layers.append(n)
        else:
            a[n] = QParams(jnp.full(lead, 0.05, dtype),
                           jnp.full(lead, 128.0, dtype))
    return {"a": a, "sm": {}}, tuple(sorted(group_layers))


def synthetic_pertensor_qstate(spec, t_slots: int, time_aware: bool, dtype):
    """Per-tensor A8 qparams for every activation point (the g=1 config).

    Softmax points (aqtizer_w) are included with uniform always-zero params:
    the reference's g=1 policy disables the t2i log2 tricks but still
    quantizes the softmax with SOFTMAX_A_BIT = A_BITS uniform quantizers
    (scripts/quantize_act.sh:16-26,38) — omitting them would benchmark a
    cheaper program than the reference's configuration."""
    from dgq_tpu.calib.act_calib import softmax_qpoint_names

    shape = (t_slots,) if time_aware else ()
    a = {n: QParams(jnp.full(shape, 0.05, dtype),
                    jnp.full(shape, 128.0, dtype))
         for n in act_qpoint_names(spec)}
    for n in softmax_qpoint_names(spec):
        # always_zero uniform: delta ~ 1/(2^8-1) over probabilities, zp 0
        a[n] = QParams(jnp.full(shape, 1.0 / 255.0, dtype),
                       jnp.zeros(shape, dtype))
    return {"a": a, "sm": {}}
