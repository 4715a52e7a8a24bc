"""Fused Pallas group-conv kernel vs the tap-decomposed XLA oracle.

The kernel must reproduce the reference's unfold-layout group quantization
exactly (quant_layer.py:630-657): per-(channel, tap) mid-axis scales, scalar
last-axis factor, f32 accumulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.models.layers import group_quant_conv2d_taps, quant_conv2d
from dgq_tpu.models.qconfig import GroupQParams, QConfig
from dgq_tpu.ops.pallas.group_conv import fused_eligible, group_quant_conv


def _mk(rng, c, o, k=3):
    w = jnp.asarray(rng.randn(k, k, c, o).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(o).astype(np.float32) * 0.1)
    dm = jnp.asarray(rng.uniform(0.02, 0.08, (c * k * k,)).astype(np.float32))
    zm = jnp.asarray(rng.uniform(100, 156, (c * k * k,)).astype(np.float32))
    gqp = GroupQParams(delta_mid=dm, zp_mid=zm,
                       delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)))
    return w, b, gqp


@pytest.mark.parametrize("c,o,h", [(32, 48, 8), (16, 16, 12)])
def test_fused_matches_taps(c, o, h):
    rng = np.random.RandomState(0)
    w, b, gqp = _mk(rng, c, o)
    x = jnp.asarray(rng.randn(2, h, h, c).astype(np.float32))
    cfg = QConfig(a_bits=8, use_aq=True)

    ref = group_quant_conv2d_taps({"w": w, "b": b}, x, gqp, cfg, 1, 1)
    dm = jnp.reshape(gqp.delta_mid, (c, 9)).T
    zm = jnp.reshape(gqp.zp_mid, (c, 9)).T
    out = group_quant_conv(
        x, w, dm, zm, gqp.delta_last.reshape(-1)[0],
        gqp.zp_last.reshape(-1)[0], b, kh=3, kw=3, padding=1, a_bits=8,
        interpret=True,
    )
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_fused_a6():
    rng = np.random.RandomState(1)
    c, o = 16, 16
    w, b, gqp = _mk(rng, c, o)
    x = jnp.asarray(rng.randn(1, 8, 8, c).astype(np.float32))
    cfg = QConfig(a_bits=6, use_aq=True)
    ref = group_quant_conv2d_taps({"w": w, "b": b}, x, gqp, cfg, 1, 1)
    dm = jnp.reshape(gqp.delta_mid, (c, 9)).T
    zm = jnp.reshape(gqp.zp_mid, (c, 9)).T
    out = group_quant_conv(x, w, dm, zm, gqp.delta_last.reshape(-1)[0],
                           gqp.zp_last.reshape(-1)[0], b, a_bits=6,
                           interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_quant_conv2d_fused_impl_and_fallbacks(monkeypatch):
    """cfg.group_conv_impl='fused' routes eligible layers through the kernel
    and falls back to taps for stride-2 / spatial-group layers."""
    import dgq_tpu.ops.pallas.group_conv as G

    orig = G.group_quant_conv
    monkeypatch.setattr(
        G, "group_quant_conv",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    rng = np.random.RandomState(2)
    c, o = 16, 24
    w, b, gqp = _mk(rng, c, o)
    p = {"w": w, "b": b}
    x = jnp.asarray(rng.randn(1, 8, 8, c).astype(np.float32))
    cfg = QConfig(a_bits=8, use_aq=True, group_conv_layers=("L",),
                  group_conv_impl="fused")
    qstate = {"a": {"L": gqp}, "sm": {}}

    out = quant_conv2d(p, x, "L", qstate, cfg, 1, 1)
    ref = quant_conv2d(p, x, "L", qstate,
                       cfg.replace(group_conv_impl="taps"), 1, 1)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()

    # stride 2 -> not eligible -> taps fallback (same result either impl)
    assert not fused_eligible(x.shape, o, 3, 3, 2, 1, gqp)
    out2 = quant_conv2d(p, x, "L", qstate, cfg, 2, 1)
    ref2 = quant_conv2d(p, x, "L", qstate,
                        cfg.replace(group_conv_impl="taps"), 2, 1)
    assert np.allclose(np.asarray(out2), np.asarray(ref2), atol=1e-6)

    # spatial (last-axis) groups -> not eligible
    gqp_sp = GroupQParams(
        delta_mid=gqp.delta_mid, zp_mid=gqp.zp_mid,
        delta_last=jnp.full((64,), 1.1), zp_last=jnp.zeros((64,)),
    )
    assert not fused_eligible(x.shape, o, 3, 3, 1, 1, gqp_sp)
    qs2 = {"a": {"L": gqp_sp}, "sm": {}}
    out3 = quant_conv2d(p, x, "L", qs2, cfg, 1, 1)
    ref3 = quant_conv2d(p, x, "L", qs2,
                        cfg.replace(group_conv_impl="taps"), 1, 1)
    assert np.allclose(np.asarray(out3), np.asarray(ref3), atol=1e-6)


def test_per_channel_plain_qparams_impl_agreement():
    """A plain QParams with per-channel (C,) delta on a group-listed layer:
    taps interprets delta[c] as uniform over the taps of channel c; the
    unfold and im2col impls must agree (a bare (C,) would otherwise
    broadcast against the unfolded location axis)."""
    from dgq_tpu.quant.affine import QParams

    rng = np.random.RandomState(4)
    c, o = 12, 16
    w = jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(o).astype(np.float32) * 0.1)
    p = {"w": w, "b": b}
    x = jnp.asarray(rng.randn(2, 12, 12, c).astype(np.float32))
    qp = QParams(
        delta=jnp.asarray(rng.uniform(0.02, 0.08, (c,)).astype(np.float32)),
        zero_point=jnp.asarray(rng.uniform(100, 156, (c,)).astype(np.float32)),
    )
    qstate = {"a": {"L": qp}, "sm": {}}
    cfg = QConfig(a_bits=8, use_aq=True, group_conv_layers=("L",))

    outs = {
        impl: np.asarray(quant_conv2d(
            p, x, "L", qstate, cfg.replace(group_conv_impl=impl), 1, 1))
        for impl in ("taps", "im2col", "unfold")
    }
    for impl in ("im2col", "unfold"):
        assert np.allclose(outs[impl], outs["taps"], atol=2e-3), \
            (impl, np.abs(outs[impl] - outs["taps"]).max())


def test_taps_bf16_fold_unbiased():
    """The bf16 deploy fold must keep the fractional zero point OUT of the
    integer codes (shifted-clip form): a q = round(x/d)+zp formulation makes
    every code carry frac(zp), which bf16 rounds away at ulp(128)=1.0 — a
    systematic per-output-channel bias (~0.03-0.09 measured on outputs of
    scale ~2, vs the ~1e-3 bf16-input-rounding floor). Regression: the
    per-channel signed-mean error vs the f32 path must center on zero."""
    rng = np.random.RandomState(5)
    c, o = 64, 64
    w = jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32) * 0.1)
    p = {"w": w, "b": None}
    x32 = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    dm = jnp.asarray(rng.uniform(0.02, 0.08, (c * 9,)).astype(np.float32))
    zm = jnp.asarray(rng.uniform(100, 156, (c * 9,)).astype(np.float32))
    gqp = GroupQParams(delta_mid=dm, zp_mid=zm,
                       delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)))
    cfg = QConfig(a_bits=8, use_aq=True)

    ref = np.asarray(group_quant_conv2d_taps(p, x32, gqp, cfg, 1, 1))
    out = np.asarray(group_quant_conv2d_taps(
        p, x32.astype(jnp.bfloat16), gqp, cfg, 1, 1)).astype(np.float32)
    # per-output-channel signed mean error: bias-free rounding noise averages
    # out over 128 samples/channel; the add-then-round formulations left a
    # constant offset per channel an order of magnitude above this threshold
    chan_bias = np.abs((out - ref).mean(axis=(0, 1, 2))).max()
    assert chan_bias < 1e-2, chan_bias


def test_odd_shapes_blocking():
    """Non-power-of-two O and H exercise the block-size reduction loops."""
    rng = np.random.RandomState(3)
    c, o = 8, 24  # o not divisible by 256 default block
    w, b, gqp = _mk(rng, c, o)
    x = jnp.asarray(rng.randn(1, 6, 6, c).astype(np.float32))
    cfg = QConfig(a_bits=8, use_aq=True)
    ref = group_quant_conv2d_taps({"w": w, "b": b}, x, gqp, cfg, 1, 1)
    dm = jnp.reshape(gqp.delta_mid, (c, 9)).T
    zm = jnp.reshape(gqp.zp_mid, (c, 9)).T
    out = group_quant_conv(x, w, dm, zm, gqp.delta_last.reshape(-1)[0],
                           gqp.zp_last.reshape(-1)[0], b, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()

def test_per_channel_delta_scalar_zp_impl_agreement():
    """QParams with per-channel (C,) delta but a broadcastable SCALAR
    zero_point (legal affine state): every group_conv_impl must accept it
    and agree (taps/im2col previously raised reshaping the scalar to (C,1)
    while unfold broadcast it)."""
    from dgq_tpu.quant.affine import QParams

    rng = np.random.RandomState(7)
    c, o = 12, 16
    p = {"w": jnp.asarray(rng.randn(3, 3, c, o).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.randn(o).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.randn(2, 12, 12, c).astype(np.float32))
    qp = QParams(
        delta=jnp.asarray(rng.uniform(0.02, 0.08, (c,)).astype(np.float32)),
        zero_point=jnp.asarray(128.0),
    )
    qstate = {"a": {"L": qp}, "sm": {}}
    cfg = QConfig(a_bits=8, use_aq=True, group_conv_layers=("L",))
    outs = {
        impl: np.asarray(quant_conv2d(
            p, x, "L", qstate, cfg.replace(group_conv_impl=impl), 1, 1))
        for impl in ("taps", "im2col", "unfold")
    }
    for impl in ("im2col", "unfold"):
        assert np.allclose(outs[impl], outs["taps"], atol=2e-3), \
            (impl, np.abs(outs[impl] - outs["taps"]).max())
