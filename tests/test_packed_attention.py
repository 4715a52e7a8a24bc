"""Packed head-slot attention: parity vs the unpacked kernel path and vs the
XLA oracle, plus the fold-time weight packer's exactness guarantees.

The packed layout (B, T, H*dp) must be bit-compatible with the classic
(BH, T, D) path: padding lanes are exact zeros, so every contraction sees
identical values (see ops/pallas/attention._fused_attention_packed and
calib.weight_calib.pack_attention_heads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.models.layers import attention, _repack_heads, _unpack_heads
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.ops.pallas.attention import attention_reference, fused_attention
from dgq_tpu.quant.affine import QParams


def _pack(x, h, d, dp):
    # (BH, T, d) -> (B, T, h*dp) zero-padded head slots
    bh, t, _ = x.shape
    b = bh // h
    x4 = jnp.reshape(x, (b, h, t, d))
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    return jnp.reshape(jnp.transpose(x4, (0, 2, 1, 3)), (b, t, h * dp))


@pytest.mark.parametrize("sm_mode,start_peak", [
    ("none", False),
    ("uniform", False),
    ("log2", False),
    ("log2_real_time", False),
    ("log2_real_time", True),
])
@pytest.mark.parametrize("t,s", [(128, 128), (128, 77)])
@pytest.mark.parametrize("dp", [128, 64])
def test_packed_kernel_matches_unpacked(sm_mode, start_peak, t, s, dp):
    # dp=128: one head per lane-aligned slot; dp=64: the pair-packed layout
    # (two 64-wide head slots per 128-lane kernel block)
    h, d, b = 2, 40, 2
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b * h, t, d), jnp.float32)
    k = jax.random.normal(k2, (b * h, s, d), jnp.float32)
    v = jax.random.normal(k3, (b * h, s, d), jnp.float32)
    scale = d ** -0.5
    delta = jnp.asarray(0.004) if sm_mode in ("uniform", "log2") else None
    kw = dict(sm_mode=sm_mode, sm_bits=8, sm_delta=delta,
              start_peak=start_peak, interpret=True)
    ref = fused_attention(q, k, v, scale, **kw)
    packed = fused_attention(_pack(q, h, d, dp), _pack(k, h, d, dp),
                             _pack(v, h, d, dp), scale, num_heads=h, **kw)
    got = _unpack_heads(packed, h, d)
    # reshape reference (BH, T, d) -> (B, T, h*d)
    ref2 = jnp.reshape(jnp.transpose(jnp.reshape(ref, (b, h, t, d)),
                                     (0, 2, 1, 3)), (b, t, h * d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref2),
                               rtol=0, atol=2e-5)
    # and against the materialized-softmax oracle
    orc = attention_reference(q, k, v, scale, sm_mode=sm_mode, sm_bits=8,
                              sm_delta=delta, start_peak=start_peak)
    orc2 = jnp.reshape(jnp.transpose(jnp.reshape(orc, (b, h, t, d)),
                                     (0, 2, 1, 3)), (b, t, h * d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(orc2),
                               rtol=0, atol=5e-4)


@pytest.mark.parametrize("slot,dp", [(128, 128), (64, 64)])
def test_pack_attention_heads_weights(slot, dp):
    from dgq_tpu.calib.weight_calib import pack_attention_heads

    rng = np.random.default_rng(0)
    inner, cross, h = 80, 48, 2  # head_dim 40 -> dp 128 (slot 128) / 64 (pair)
    spec = [
        ("blk.attn1.to_q", "linear", (inner, inner, False)),
        ("blk.attn1.to_k", "linear", (cross, inner, False)),
        ("blk.attn1.to_v", "linear", (cross, inner, False)),
        ("blk.attn1.to_out.0", "linear", (inner, inner, True)),
        ("blk.ff", "linear", (inner, inner, True)),
    ]
    params = {}
    for name, _, (i_d, o_d, bias) in spec:
        params[name] = {
            "w": jnp.asarray(rng.normal(size=(i_d, o_d)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(o_d,)), jnp.float32) if bias else None,
        }
    packed = pack_attention_heads(params, spec, num_heads=h, slot=slot)
    assert packed["blk.ff"] is params["blk.ff"]  # untouched leaf shared
    assert packed["blk.attn1.to_q"]["w"].shape == (inner, h * dp)
    assert packed["blk.attn1.to_out.0"]["w"].shape == (h * dp, inner)
    # projection outputs: packed == unpacked per head slot, zeros beyond
    x = jnp.asarray(rng.normal(size=(3, inner)), jnp.float32)
    y_ref = x @ params["blk.attn1.to_q"]["w"]
    y_pk = x @ packed["blk.attn1.to_q"]["w"]
    y_pk4 = np.asarray(y_pk).reshape(3, h, dp)
    np.testing.assert_array_equal(
        y_pk4[:, :, :inner // h].reshape(3, inner), np.asarray(y_ref))
    assert np.all(y_pk4[:, :, inner // h:] == 0.0)
    # to_out consumes the padded layout exactly
    o = jnp.asarray(rng.normal(size=(3, inner)), jnp.float32)
    o_pk = _repack_heads(o[None], h, dp)[0]
    np.testing.assert_allclose(
        np.asarray(o_pk @ packed["blk.attn1.to_out.0"]["w"]),
        np.asarray(o @ params["blk.attn1.to_out.0"]["w"]), rtol=0, atol=1e-5)


@pytest.mark.parametrize("slot", [128, 64])
def test_attention_packed_model_path(slot):
    """attention() end to end: packed weights + packed_attention cfg vs the
    plain path, quantized config (uniform softmax + q/k/v aqtizers)."""
    from dgq_tpu.calib.weight_calib import pack_attention_heads

    rng = np.random.default_rng(1)
    inner, h, b, t = 80, 2, 2, 16
    prefix = "blk.attn1"
    spec = [
        (f"{prefix}.to_q", "linear", (inner, inner, False)),
        (f"{prefix}.to_k", "linear", (inner, inner, False)),
        (f"{prefix}.to_v", "linear", (inner, inner, False)),
        (f"{prefix}.to_out.0", "linear", (inner, inner, True)),
    ]
    params = {}
    for name, _, (i_d, o_d, bias) in spec:
        params[name] = {
            "w": jnp.asarray(rng.normal(size=(i_d, o_d)) * 0.1, jnp.float32),
            "b": jnp.asarray(rng.normal(size=(o_d,)) * 0.1, jnp.float32) if bias else None,
        }
    qstate = {"a": {}, "sm": {}}
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        qstate["a"][f"{prefix}.{nm}"] = QParams(
            delta=jnp.asarray(0.01), zero_point=jnp.asarray(128.0))
    for nm in ("aqtizer_q", "aqtizer_k", "aqtizer_v"):
        qstate["a"][f"{prefix}.{nm}"] = QParams(
            delta=jnp.asarray(0.02), zero_point=jnp.asarray(120.0))
    qstate["a"][f"{prefix}.aqtizer_w"] = QParams(
        delta=jnp.asarray(1 / 255.0), zero_point=jnp.asarray(0.0))
    x = jnp.asarray(rng.normal(size=(b, t, inner)), jnp.float32)

    cfg0 = QConfig(use_aq=True, a_bits=8, softmax_bits=8,
                   use_pallas_attention=True)
    ref = attention(params, prefix, x, None, h, qstate, cfg0)

    packed = pack_attention_heads(params, spec, num_heads=h, slot=slot)
    cfg1 = cfg0.replace(packed_attention=True)
    got = attention(packed, prefix, x, None, h, qstate, cfg1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-5)

    # the classic-path fallback on packed weights (XLA attention) also matches
    cfg2 = QConfig(use_aq=True, a_bits=8, softmax_bits=8,
                   use_pallas_attention=False, packed_attention=True)
    cfg2_ref = cfg2.replace(packed_attention=False)
    ref2 = attention(params, prefix, x, None, h, qstate, cfg2_ref)
    got2 = attention(packed, prefix, x, None, h, qstate, cfg2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=0, atol=3e-5)
