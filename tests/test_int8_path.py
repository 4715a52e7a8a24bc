"""int8 deploy path: Pallas kernel (interpret) vs the fake-quant model path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.calib.weight_calib import (
    attach_int8_packed,
    init_weight_qparams,
    fold_weight_quant,
)
from dgq_tpu.models.layers import quant_linear
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.ops.pallas.int8_matmul import (
    pack_weight_int8,
    quantized_matmul,
    quantized_matmul_reference,
)
from dgq_tpu.quant.affine import QParams
from dgq_tpu.quant.scalers import Scaler, init_scale


def test_kernel_interpret_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(48, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96, 130).astype(np.float32) * 0.1)
    from dgq_tpu.calib.weight_calib import init_layer_wqp

    wqp = init_layer_wqp(w, "linear", 4, Scaler.MINMAX)
    xqp = init_scale(x, 8, Scaler.MINMAX)
    wq, wd, wz = pack_weight_int8(w, wqp.delta, wqp.zero_point, bits=4)
    bias = jnp.asarray(rng.randn(130).astype(np.float32))
    ref = quantized_matmul_reference(x, wq, wd, wz, xqp.delta, xqp.zero_point - 128.0, bias)
    out = quantized_matmul(
        x, wq, wd, wz, xqp.delta, xqp.zero_point - 128.0, bias,
        block_m=16, block_n=128, out_dtype=jnp.float32, interpret=True,
    )
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_int8_model_path_matches_fake_quant(monkeypatch):
    """quant_linear with packed int8 weights == fake-quant path (f32 exact)."""
    import dgq_tpu.ops.pallas.int8_matmul as M

    orig = M.quantized_matmul

    def wrapper(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(M, "quantized_matmul", wrapper)

    rng = np.random.RandomState(1)
    name = "L"
    spec = [(name, "linear", (64, 32, True))]
    params = {name: {
        "w": jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.randn(32).astype(np.float32)),
    }}
    cfg = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True, use_int8_matmul=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    pq = attach_int8_packed(pq, wqp, spec, cfg)
    assert "w_q8" in pq[name]

    x = jnp.asarray(rng.randn(4, 7, 64).astype(np.float32))
    xqp = init_scale(x, 8, Scaler.MINMAX)
    qstate = {"a": {name: QParams(xqp.delta, xqp.zero_point)}, "sm": {}}

    out_int8 = quant_linear(pq[name], x, name, qstate, cfg)
    out_fake = quant_linear(pq[name], x, name, qstate, cfg.replace(use_int8_matmul=False))
    assert out_int8.shape == out_fake.shape
    assert np.allclose(np.asarray(out_int8), np.asarray(out_fake), atol=2e-3), \
        np.abs(np.asarray(out_int8) - np.asarray(out_fake)).max()


def test_int8_xla_matches_fake_quant():
    """int8_impl='xla' (native s8 dot_general + analytic zero-point
    correction) == fake-quant path, and the M/K shape gate falls back to
    fake-quant for small inputs."""
    from dgq_tpu.models import layers as L

    rng = np.random.RandomState(2)
    name = "L"
    spec = [(name, "linear", (64, 32, True))]
    params = {name: {
        "w": jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.randn(32).astype(np.float32)),
    }}
    cfg = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True,
                  use_int8_matmul=True, int8_impl="xla")
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    pq = attach_int8_packed(pq, wqp, spec, cfg)
    assert "w_ksum" in pq[name]

    m = L._INT8_XLA_MIN_M
    x = jnp.asarray(rng.randn(m, 64).astype(np.float32))
    xqp = init_scale(x, 8, Scaler.MINMAX)
    qstate = {"a": {name: QParams(xqp.delta, xqp.zero_point)}, "sm": {}}

    out_int8 = quant_linear(pq[name], x, name, qstate, cfg)
    out_fake = quant_linear(pq[name], x, name, qstate,
                            cfg.replace(use_int8_matmul=False))
    assert np.allclose(np.asarray(out_int8), np.asarray(out_fake),
                       atol=2e-3), \
        np.abs(np.asarray(out_int8) - np.asarray(out_fake)).max()

    # below the gate: must produce the identical fake-quant program
    xs = x[:32]
    out_small = quant_linear(pq[name], xs, name, qstate, cfg)
    out_small_fake = quant_linear(pq[name], xs, name, qstate,
                                  cfg.replace(use_int8_matmul=False))
    assert np.array_equal(np.asarray(out_small), np.asarray(out_small_fake))


def test_group_scales_stay_on_fake_path():
    """Group activation params must NOT take the int8 kernel (delta not scalar)."""
    from dgq_tpu.models.qconfig import GroupQParams
    from dgq_tpu.models.layers import _int8_qp

    p = {"w_q8": jnp.zeros((4, 4), jnp.int8)}
    cfg = QConfig(use_aq=True, use_int8_matmul=True)
    g = GroupQParams(jnp.ones((4,)), jnp.zeros((4,)), jnp.ones((1,)), jnp.zeros((1,)))
    assert _int8_qp(p, {"a": {"L": g}}, cfg, "L") is None
    qp = QParams(jnp.asarray(0.1), jnp.asarray(0.0))
    assert _int8_qp(p, {"a": {"L": qp}}, cfg, "L") is not None


def test_int8_on_with_group_layers(monkeypatch):
    """The flagship g>1 config keeps int8 on: group layers skip packing and
    route to the group path; per-tensor-scale layers still pack and run int8."""
    import dgq_tpu.ops.pallas.int8_matmul as M
    from dgq_tpu.models.layers import quant_conv2d
    from dgq_tpu.models.qconfig import GroupQParams

    orig = M.quantized_matmul
    monkeypatch.setattr(
        M, "quantized_matmul",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    rng = np.random.RandomState(5)
    spec = [
        ("g3", "conv", (8, 16, 3, 1, 1)),   # group conv (k=3)
        ("p1", "conv", (8, 16, 1, 1, 0)),   # per-tensor 1x1 -> int8
    ]
    params = {
        "g3": {"w": jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1),
               "b": jnp.asarray(rng.randn(16).astype(np.float32))},
        "p1": {"w": jnp.asarray(rng.randn(1, 1, 8, 16).astype(np.float32) * 0.1),
               "b": jnp.asarray(rng.randn(16).astype(np.float32))},
    }
    cfg = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True,
                  use_int8_matmul=True, use_int8_conv=True,
                  group_conv_layers=("g3",), group_conv_impl="taps")
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    pq = attach_int8_packed(pq, wqp, spec, cfg)
    assert "w_q8c" not in pq["g3"] and "w_q8" not in pq["g3"]  # skipped
    assert "w_q8" in pq["p1"]

    x = jnp.asarray(rng.randn(2, 6, 6, 8).astype(np.float32))
    gqp = GroupQParams(
        delta_mid=jnp.full((8 * 9,), 0.05), zp_mid=jnp.full((8 * 9,), 128.0),
        delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)),
    )
    xqp = init_scale(x, 8, Scaler.MINMAX)
    qstate = {"a": {"g3": gqp, "p1": QParams(xqp.delta, xqp.zero_point)},
              "sm": {}}
    y_g = quant_conv2d(pq["g3"], x, "g3", qstate, cfg, 1, 1)
    assert y_g.shape == (2, 6, 6, 16) and np.isfinite(np.asarray(y_g)).all()
    # oracle: same group conv through the materialized-unfold impl
    y_ref = quant_conv2d(pq["g3"], x, "g3", qstate,
                         cfg.replace(group_conv_impl="unfold"), 1, 1)
    assert np.allclose(np.asarray(y_g), np.asarray(y_ref), atol=2e-4), \
        np.abs(np.asarray(y_g) - np.asarray(y_ref)).max()
    # int8 1x1 == fake-quant path
    y_i8 = quant_conv2d(pq["p1"], x, "p1", qstate, cfg, 1, 0)
    y_fk = quant_conv2d(pq["p1"], x, "p1", qstate,
                        cfg.replace(use_int8_matmul=False), 1, 0)
    assert np.allclose(np.asarray(y_i8), np.asarray(y_fk), atol=2e-3), \
        np.abs(np.asarray(y_i8) - np.asarray(y_fk)).max()


def test_a6_bits_recentering():
    """A6 codes recenter by 32 and clip to [-32, 31] (reference W4A6 config)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    xqp = init_scale(x, 6, Scaler.MINMAX)
    from dgq_tpu.quant.affine import int_code_offset, quantize_int, dequantize_int
    assert int_code_offset(6) == 32
    codes = quantize_int(x, xqp, bits=6)
    assert int(jnp.min(codes)) >= -32 and int(jnp.max(codes)) <= 31
    from dgq_tpu.quant.affine import fake_quant
    assert np.allclose(
        np.asarray(dequantize_int(codes, xqp, bits=6)),
        np.asarray(fake_quant(x, xqp, 6)), atol=1e-6,
    )


def test_int8_conv_matches_fake_quant():
    """k×k int8 conv (XLA s8 conv + analytic zero-point correction) == the
    fake-quant f32 conv path, including zero-padding semantics."""
    rng = np.random.RandomState(3)
    from dgq_tpu.models.layers import quant_conv2d

    for stride, padding in [(1, 1), (2, 1)]:
        name = "C"
        spec = [(name, "conv", (16, 24, 3, stride, padding))]
        params = {name: {
            "w": jnp.asarray(rng.randn(3, 3, 16, 24).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.randn(24).astype(np.float32)),
        }}
        cfg = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True,
                      use_int8_conv=True, disable_out_quant=False)
        wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
        pq = fold_weight_quant(params, wqp, spec, cfg)
        pq = attach_int8_packed(pq, wqp, spec, cfg)
        assert "w_q8c" in pq[name] and "w_ksum" in pq[name]

        x = jnp.asarray(rng.randn(2, 9, 9, 16).astype(np.float32))
        xqp = init_scale(x, 8, Scaler.MINMAX)
        qstate = {"a": {name: QParams(xqp.delta, xqp.zero_point)}, "sm": {}}

        out_i8 = quant_conv2d(pq[name], x, name, qstate, cfg, stride, padding)
        out_fq = quant_conv2d(pq[name], x, name, qstate,
                              cfg.replace(use_int8_conv=False), stride, padding)
        assert out_i8.shape == out_fq.shape
        assert np.allclose(np.asarray(out_i8), np.asarray(out_fq), atol=2e-3), \
            (stride, padding, np.abs(np.asarray(out_i8) - np.asarray(out_fq)).max())


def test_int8_conv_a6():
    """A6 activation codes through the int8 conv path."""
    rng = np.random.RandomState(4)
    from dgq_tpu.models.layers import quant_conv2d

    name = "C"
    spec = [(name, "conv", (8, 8, 3, 1, 1))]
    params = {name: {
        "w": jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1),
        "b": None,
    }}
    cfg = QConfig(w_bits=4, a_bits=6, use_wq=True, use_aq=True,
                  use_int8_conv=True, disable_out_quant=False)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = attach_int8_packed(fold_weight_quant(params, wqp, spec, cfg), wqp, spec, cfg)
    x = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))
    xqp = init_scale(x, 6, Scaler.MINMAX)
    qstate = {"a": {name: QParams(xqp.delta, xqp.zero_point)}, "sm": {}}
    out_i8 = quant_conv2d(pq[name], x, name, qstate, cfg, 1, 1)
    out_fq = quant_conv2d(pq[name], x, name, qstate,
                          cfg.replace(use_int8_conv=False), 1, 1)
    assert np.allclose(np.asarray(out_i8), np.asarray(out_fq), atol=2e-3)


def test_group_taps_matches_unfold():
    """Tap-decomposed group conv == materialized-unfold group conv, for
    mid-axis, last-axis, and combined group scales, stride 1 and 2."""
    rng = np.random.RandomState(5)
    from dgq_tpu.models.layers import quant_conv2d
    from dgq_tpu.models.qconfig import GroupQParams

    name = "C"
    kh = kw = 3
    cin, cout = 12, 20
    params = {name: {
        "w": jnp.asarray(rng.randn(kh, kw, cin, cout).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.randn(cout).astype(np.float32)),
    }}
    x = jnp.asarray(rng.randn(2, 8, 8, cin).astype(np.float32))

    for stride, padding in [(1, 1), (2, 1)]:
        ho = (8 + 2 * padding - kh) // stride + 1
        L = ho * ho
        ckk = cin * kh * kw
        cases = {
            "mid": GroupQParams(
                jnp.asarray(rng.uniform(0.02, 0.1, ckk).astype(np.float32)),
                jnp.asarray(rng.randint(100, 156, ckk).astype(np.float32)),
                jnp.ones((1,)), jnp.zeros((1,))),
            "last": GroupQParams(
                jnp.ones((1,)), jnp.zeros((1,)),
                jnp.asarray(rng.uniform(0.02, 0.1, L).astype(np.float32)),
                jnp.asarray(rng.randint(100, 156, L).astype(np.float32))),
        }
        for label, g in cases.items():
            qstate = {"a": {name: g}, "sm": {}}
            cfg = QConfig(a_bits=8, use_aq=True, group_conv_layers=(name,))
            out_taps = quant_conv2d(params[name], x, name, qstate,
                                    cfg.replace(group_conv_impl="taps"),
                                    stride, padding)
            out_unf = quant_conv2d(params[name], x, name, qstate,
                                   cfg.replace(group_conv_impl="unfold"),
                                   stride, padding)
            out_i2c = quant_conv2d(params[name], x, name, qstate,
                                   cfg.replace(group_conv_impl="im2col"),
                                   stride, padding)
            assert out_taps.shape == out_unf.shape == out_i2c.shape
            assert np.allclose(np.asarray(out_taps), np.asarray(out_unf),
                               atol=1e-4), \
                (label, stride, np.abs(np.asarray(out_taps) - np.asarray(out_unf)).max())
            assert np.allclose(np.asarray(out_i2c), np.asarray(out_unf),
                               atol=1e-4), \
                (label, stride, np.abs(np.asarray(out_i2c) - np.asarray(out_unf)).max())


def test_fold_act_dequant_matches_fake_quant():
    """The codes-fold deploy path (fold_act_dequant=True; default False
    since the round-4 A/B measured it ~2.5% slower end-to-end) must be
    numerically identical to fake-quant-then-matmul for per-tensor scales —
    values AND gradients (STE/clip regions)."""
    from dgq_tpu.models.layers import quant_conv2d

    rng = np.random.RandomState(7)
    cfg_on = QConfig(use_aq=True, a_bits=8, fold_act_dequant=True)
    cfg_off = cfg_on.replace(fold_act_dequant=False)

    # -- linear --
    x = jnp.asarray(rng.randn(6, 10, 32).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(32, 48).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.randn(48).astype(np.float32))}
    # a zero point large enough that some values clip on both sides
    qstate = {"a": {"L": QParams(jnp.asarray(0.031), jnp.asarray(117.0))},
              "sm": {}}
    out_fold = quant_linear(p, x, "L", qstate, cfg_on)
    out_ref = quant_linear(p, x, "L", qstate, cfg_off)
    assert np.allclose(np.asarray(out_fold), np.asarray(out_ref), atol=1e-5), \
        np.abs(np.asarray(out_fold) - np.asarray(out_ref)).max()

    g_fold = jax.grad(lambda t: quant_linear(p, t, "L", qstate, cfg_on).sum())(x)
    g_ref = jax.grad(lambda t: quant_linear(p, t, "L", qstate, cfg_off).sum())(x)
    assert np.allclose(np.asarray(g_fold), np.asarray(g_ref), atol=1e-4), \
        np.abs(np.asarray(g_fold) - np.asarray(g_ref)).max()

    # -- conv, stride/padding variants (zero padding must dequantize to 0) --
    xc = jnp.asarray(rng.randn(2, 9, 9, 16).astype(np.float32))
    pc = {"w": jnp.asarray(rng.randn(3, 3, 16, 24).astype(np.float32) * 0.1),
          "b": jnp.asarray(rng.randn(24).astype(np.float32))}
    for stride, padding in [(1, 1), (2, 1), (1, 0)]:
        qs = {"a": {"C": QParams(jnp.asarray(0.044), jnp.asarray(131.0))},
              "sm": {}}
        out_fold = quant_conv2d(pc, xc, "C", qs, cfg_on, stride, padding)
        out_ref = quant_conv2d(pc, xc, "C", qs, cfg_off, stride, padding)
        assert np.allclose(np.asarray(out_fold), np.asarray(out_ref),
                           atol=1e-5), \
            (stride, padding,
             np.abs(np.asarray(out_fold) - np.asarray(out_ref)).max())

    # -- bf16 codes are exact: fold in bf16 == f32 fake-quant to bf16 tol --
    xb = xc.astype(jnp.bfloat16)
    pb16 = {"w": pc["w"].astype(jnp.bfloat16), "b": pc["b"].astype(jnp.bfloat16)}
    qsb = {"a": {"C": QParams(jnp.asarray(0.044, jnp.bfloat16),
                              jnp.asarray(131.0, jnp.bfloat16))}, "sm": {}}
    out_b = quant_conv2d(pb16, xb, "C", qsb, cfg_on, 1, 1)
    out_f = quant_conv2d(pc, xc, "C", {"a": {"C": QParams(
        jnp.asarray(0.044), jnp.asarray(131.0))}, "sm": {}}, cfg_off, 1, 1)
    assert np.allclose(np.asarray(out_b, np.float32), np.asarray(out_f),
                       atol=0.15, rtol=0.05)

    # -- group / per-channel scales must NOT take the fold path --
    qs_vec = {"a": {"C": QParams(jnp.full((16,), 0.05), jnp.full((16,), 128.0))},
              "sm": {}}
    out_vec_on = quant_conv2d(pc, xc, "C", qs_vec, cfg_on, 1, 1)
    out_vec_off = quant_conv2d(pc, xc, "C", qs_vec, cfg_off, 1, 1)
    assert np.allclose(np.asarray(out_vec_on), np.asarray(out_vec_off),
                       atol=1e-6)


def test_fold_path_publishes_taps():
    """Calibration collectors must still see the pre-quant input when the
    codes-fold path handles the layer."""
    from dgq_tpu.models.qconfig import collect_act_taps

    rng = np.random.RandomState(8)
    cfg = QConfig(use_aq=True, a_bits=8, fold_act_dequant=True)
    x = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(8, 8).astype(np.float32)), "b": None}
    qstate = {"a": {"L": QParams(jnp.asarray(0.05), jnp.asarray(128.0))},
              "sm": {}}
    store = {}
    with collect_act_taps(store):
        quant_linear(p, x, "L", qstate, cfg)
    assert "L" in store
    assert np.allclose(np.asarray(store["L"]), np.asarray(x))


def test_conv_only_int8_flag_does_not_route_linears():
    """use_int8_conv alone must leave linears (and 1x1 convs) on the
    fake-quant path — the QConfig docstring promises the two int8 gates are
    independently benchmarkable."""
    rng = np.random.RandomState(5)
    name = "L"
    spec = [(name, "linear", (64, 32, True))]
    params = {name: {
        "w": jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.randn(32).astype(np.float32)),
    }}
    both = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True,
                   use_int8_matmul=True, use_int8_conv=True, int8_impl="xla")
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, both)
    pq = attach_int8_packed(pq, wqp, spec, both)

    x = jnp.asarray(rng.randn(512, 64).astype(np.float32))
    xqp = init_scale(x, 8, Scaler.MINMAX)
    # fractional zp so int8 (rounded zp) and fake-quant (exact zp) differ
    qstate = {"a": {name: QParams(xqp.delta, xqp.zero_point + 0.37)}, "sm": {}}

    conv_only = both.replace(use_int8_matmul=False)
    off = both.replace(use_int8_matmul=False, use_int8_conv=False)
    out_conv_only = quant_linear(pq[name], x, name, qstate, conv_only)
    out_off = quant_linear(pq[name], x, name, qstate, off)
    assert np.allclose(np.asarray(out_conv_only), np.asarray(out_off),
                       atol=1e-6), "conv-only flag routed a linear to int8"


def test_fallback_fake_quant_preserves_bf16():
    """The fake-quant fallback (fold-ineligible per-channel scale) must not
    upcast a bf16 activation run to f32 — the f32 delta divide would
    silently double activation HBM for every downstream layer."""
    from dgq_tpu.models.layers import quant_conv2d

    rng = np.random.RandomState(6)
    name = "C"
    p = {"w": jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1,
                          jnp.bfloat16),
         "b": jnp.asarray(rng.randn(16).astype(np.float32), jnp.bfloat16)}
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32), jnp.bfloat16)
    # per-channel delta: ineligible for the codes fold -> fake-quant path
    qp = QParams(jnp.linspace(0.02, 0.1, 8), jnp.full((8,), 128.0))
    cfg = QConfig(a_bits=8, use_aq=True)
    out = quant_conv2d(p, x, name, {"a": {name: qp}, "sm": {}}, cfg, 1, 1)
    assert out.dtype == jnp.bfloat16, out.dtype

    lin = {"w": p["w"][0, 0], "b": p["b"]}
    from dgq_tpu.models.layers import quant_linear as ql

    qpl = QParams(jnp.linspace(0.02, 0.1, 8), jnp.full((8,), 128.0))
    out_l = ql(lin, x.reshape(-1, 8), name, {"a": {name: qpl}, "sm": {}}, cfg)
    assert out_l.dtype == jnp.bfloat16, out_l.dtype
