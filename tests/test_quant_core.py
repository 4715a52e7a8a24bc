"""Unit tests for the quantizer math core: golden values and invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.quant import (
    QParams,
    Scaler,
    adaround_init_alpha,
    adaround_quant,
    adaround_soft_targets,
    fake_quant,
    init_scale,
    init_scale_channelwise,
    log2_fake_quant,
    log2_init_delta,
    log2_real_time_quant,
    ste_round,
)
from dgq_tpu.quant.adaround import linear_temp_decay, rounding_reg_loss
from dgq_tpu.quant.affine import minmax_qparams_from_range, quantize_int, dequantize_int
from dgq_tpu.quant.groups import (
    init_group_stats,
    kmeans_group_qparams,
    update_group_stats,
)


def test_ste_round_values_and_grad():
    x = jnp.asarray([0.2, 0.5, 1.7, -1.2])
    assert np.allclose(ste_round(x), np.round(np.asarray(x)))
    g = jax.grad(lambda v: jnp.sum(ste_round(v) ** 2))(x)
    # STE: d/dx round(x) == 1, so grad is 2*round(x)
    assert np.allclose(g, 2 * np.round(np.asarray(x)))


def test_minmax_golden():
    # x in [-1, 3], 8 bits: delta=(3-(-1))/255, zp=round(1/delta)=round(63.75)=64
    x = jnp.asarray([-1.0, 0.0, 1.0, 3.0])
    qp = init_scale(x, bits=8, scaler=Scaler.MINMAX)
    assert np.isclose(float(qp.delta), 4.0 / 255.0)
    assert float(qp.zero_point) == 64.0
    # all-positive tensor still anchors min at 0 (reference clamps x_min<=0)
    xp = jnp.asarray([0.5, 2.0])
    qpp = init_scale(xp, bits=8, scaler=Scaler.MINMAX)
    assert np.isclose(float(qpp.delta), 2.0 / 255.0)
    assert float(qpp.zero_point) == 0.0


def test_minmax_symmetric_and_always_zero():
    x = jnp.asarray([-2.0, 1.0])
    qp = init_scale(x, bits=8, scaler=Scaler.MINMAX, symmetric=True)
    # symmetric: range [-2,2], delta = 4/254
    assert np.isclose(float(qp.delta), 4.0 / 254.0)
    assert float(qp.zero_point) == 0.0
    qp0 = init_scale(x, bits=8, scaler=Scaler.MINMAX, always_zero=True)
    assert np.isclose(float(qp0.delta), 1.0 / 255.0)


def test_fake_quant_roundtrip_exact_grid():
    # values exactly on the grid survive quant-dequant
    qp = QParams(delta=jnp.asarray(0.1), zero_point=jnp.asarray(0.0))
    x = jnp.asarray([0.0, 0.1, 0.5, 1.0])
    out = fake_quant(x, qp, bits=8)
    assert np.allclose(out, x, atol=1e-7)


def test_fake_quant_clamps():
    qp = QParams(delta=jnp.asarray(1.0), zero_point=jnp.asarray(0.0))
    x = jnp.asarray([-5.0, 300.0])
    out = fake_quant(x, qp, bits=8)
    assert np.allclose(out, [0.0, 255.0])


def test_fake_quant_idempotent():
    x = jnp.asarray(np.random.RandomState(0).randn(64).astype(np.float32))
    qp = init_scale(x, bits=8, scaler=Scaler.MINMAX)
    once = fake_quant(x, qp, bits=8)
    twice = fake_quant(once, qp, bits=8)
    assert np.allclose(once, twice, atol=1e-6)


def test_int_quant_matches_fake_quant():
    x = jnp.asarray(np.random.RandomState(1).randn(128).astype(np.float32))
    qp = init_scale(x, bits=8, scaler=Scaler.MINMAX)
    codes = quantize_int(x, qp, bits=8)
    assert codes.dtype == jnp.int8
    dq = dequantize_int(codes, qp, bits=8)
    fq = fake_quant(x, qp, bits=8)
    assert np.allclose(dq, fq, atol=1e-6)


def test_mse_scale_beats_or_matches_minmax_loss():
    rng = np.random.RandomState(2)
    x = jnp.asarray(np.concatenate([rng.randn(1000), [8.0]]).astype(np.float32))
    qmm = init_scale(x, bits=4, scaler=Scaler.MINMAX)
    qms = init_scale(x, bits=4, scaler=Scaler.MSE)

    def loss(qp):
        return float(jnp.mean(jnp.abs(fake_quant(x, qp, 4) - x) ** 2.4))

    assert loss(qms) <= loss(qmm) + 1e-9


def test_channelwise_shapes():
    w = jnp.asarray(np.random.RandomState(3).randn(6, 4, 3, 3).astype(np.float32))
    qp = init_scale_channelwise(w, bits=4, scaler=Scaler.MINMAX)
    assert qp.delta.shape == (6, 1, 1, 1)
    assert qp.zero_point.shape == (6, 1, 1, 1)
    # each channel independently: channel 0 of fake-quant only depends on w[0]
    fq = fake_quant(w, qp, bits=4)
    qp0 = init_scale(w[0], bits=4, scaler=Scaler.MINMAX)
    fq0 = fake_quant(w[0], qp0, bits=4)
    assert np.allclose(fq[0], fq0, atol=1e-6)


def test_log2_quantizer():
    x = jnp.asarray([1.0, 0.5, 0.25, 0.1, 1e-6])
    out = log2_fake_quant(x, jnp.asarray(1.0), bits=8)
    # exact powers of two survive
    assert np.allclose(out[:3], [1.0, 0.5, 0.25], atol=1e-7)
    # tiny values round to the nearest power of two: -log2(1e-6) ~ 19.93 -> 2^-20
    assert np.isclose(float(out[4]), 2.0 ** (-20))
    # with 2 bits the exponent clamps at 3 -> 2^-3
    out2 = log2_fake_quant(x, jnp.asarray(1.0), bits=2)
    assert np.isclose(float(out2[4]), 2.0 ** (-3))
    # real_time: delta = x.max()
    rt = log2_real_time_quant(x * 2.0, bits=8)
    assert np.isclose(float(rt[0]), 2.0)


def test_log2_init_delta_quantile():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(0, 1, size=(1000,)).astype(np.float32))
    d = log2_init_delta(x, bits=8)
    # delta must be one of the three quantiles
    qs = [float(jnp.quantile(x, p)) for p in (0.999, 0.9999, 0.99999)]
    assert any(np.isclose(float(d), q, rtol=1e-5) for q in qs)


def test_adaround_init_soft_equals_rest():
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(16).astype(np.float32))
    delta = jnp.asarray(0.05)
    alpha = adaround_init_alpha(w, delta)
    rest = w / delta - jnp.floor(w / delta)
    assert np.allclose(adaround_soft_targets(alpha), rest, atol=1e-5)


def test_adaround_hard_vs_soft_extremes():
    w = jnp.asarray([0.101, 0.149])  # delta 0.05: floor=2, rest={0.02, 0.98}
    delta = jnp.asarray(0.05)
    qp = QParams(delta=delta, zero_point=jnp.asarray(0.0))
    alpha = adaround_init_alpha(w, delta)
    hard = adaround_quant(w, qp, alpha, bits=8, soft=False)
    # rest 0.02 -> alpha<0 -> round down to 0.10 ; rest 0.98 -> alpha>0 -> 0.15
    assert np.allclose(hard, [0.10, 0.15], atol=1e-6)


def test_linear_temp_decay():
    assert float(linear_temp_decay(0, 100, warmup=0.2)) == 20.0
    assert float(linear_temp_decay(19, 100, warmup=0.2)) == 20.0
    assert np.isclose(float(linear_temp_decay(100, 100, warmup=0.2)), 2.0)
    mid = float(linear_temp_decay(60, 100, warmup=0.2))
    assert 2.0 < mid < 20.0


def test_rounding_reg_pushes_binary():
    # alpha at extremes -> soft target near 0/1 -> regularizer near 0
    a = jnp.asarray([10.0, -10.0])
    assert float(rounding_reg_loss(a, jnp.asarray(2.0))) < 1e-3
    # alpha at 0 -> soft target ~0.5 -> max penalty ~1 per element
    a0 = jnp.zeros((2,))
    assert float(rounding_reg_loss(a0, jnp.asarray(2.0))) > 1.5


def test_group_stats_and_kmeans():
    rng = np.random.RandomState(6)
    # two clearly separated channel populations on the last axis
    x1 = rng.uniform(-1, 1, size=(2, 5, 8)).astype(np.float32)
    x1[..., 4:] *= 20.0
    stats = init_group_stats(x1.shape)
    stats = update_group_stats(stats, jnp.asarray(x1))
    qp, labels, in_wise = kmeans_group_qparams(stats, group_num=2, level=256)
    assert in_wise  # last-axis spread dominates
    assert qp.delta.shape == (1, 1, 8)
    # channels within a cluster share delta
    assert len(np.unique(np.asarray(qp.delta).ravel())) == 2
    assert set(labels[:4]) != set(labels[4:])


def test_group_stats_batched_accumulation():
    rng = np.random.RandomState(7)
    a = rng.randn(2, 4, 6).astype(np.float32)
    b = rng.randn(2, 4, 6).astype(np.float32)
    stats = init_group_stats(a.shape)
    stats = update_group_stats(stats, jnp.asarray(a))
    stats = update_group_stats(stats, jnp.asarray(b))
    both = np.concatenate([a, b], 0)
    assert np.allclose(stats.in_min, both.min((0, 1)))
    assert np.allclose(stats.out_max, both.max((0, 2)))


def test_ema_range_qparams():
    qp = minmax_qparams_from_range(jnp.asarray(-1.0), jnp.asarray(3.0), bits=8)
    assert np.isclose(float(qp.delta), 4.0 / 255.0)
    assert float(qp.zero_point) == 64.0


def test_hist_kl_scalers_accept_bf16():
    """hist/kl run their histograms host-side pinned to float32: a bfloat16
    calibration tap (the deploy dtype) must neither crash np.histogram nor
    collapse the KL bin edges; the result must match the float32 run."""
    from dgq_tpu.quant.scalers import Scaler, init_scale

    x32 = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (512,))) * 2.0
    xb = x32.astype(jnp.bfloat16)
    for scaler in (Scaler.HIST, Scaler.KL):
        qb = init_scale(xb, 8, scaler)
        q32 = init_scale(xb.astype(jnp.float32), 8, scaler)
        assert np.isclose(float(qb.delta), float(q32.delta), rtol=1e-6)
        assert np.isclose(float(qb.zero_point), float(q32.zero_point),
                          rtol=1e-6)
