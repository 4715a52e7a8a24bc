"""Numerical parity vs the upstream DGQ reference (if mounted at
/root/reference). These tests import the reference's torch quantizers and
compare our JAX implementations on random tensors. Skipped when the reference
checkout or torch is unavailable — the golden-value tests in
test_quant_core.py still cover the math standalone.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "quant")):
    pytest.skip("reference checkout not available", allow_module_level=True)

if REF not in sys.path:
    sys.path.insert(0, REF)

from quant.quant_layer import (  # noqa: E402  (reference import)
    UniformAffineQuantizer,
    Scaler as RefScaler,
    minmax as ref_minmax,
    mse as ref_mse,
)
from quant.quant_layer_text import T2ILogQuantizer  # noqa: E402
from quant.adaptive_rounding import AdaRoundQuantizer, RMODE  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dgq_tpu.quant import (  # noqa: E402
    QParams,
    Scaler,
    adaround_init_alpha,
    adaround_quant,
    fake_quant,
    init_scale,
    init_scale_channelwise,
    log2_fake_quant,
    log2_init_delta,
)


def rand(*shape, seed=0, scale=1.0, positive=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(*shape).astype(np.float32) * scale
    if positive:
        x = np.abs(x) + 1e-4
    return x


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("symmetric", [False, True])
def test_minmax_parity(seed, bits, symmetric):
    x = rand(256, seed=seed)
    rd, rz = ref_minmax(torch.from_numpy(x), symmetric, 2 ** bits, False)
    qp = init_scale(jnp.asarray(x), bits, Scaler.MINMAX, symmetric=symmetric)
    assert np.isclose(float(qp.delta), float(rd), rtol=1e-6)
    rz = float(rz) if not torch.is_tensor(rz) else float(rz)
    assert np.isclose(float(qp.zero_point), rz, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bits", [4, 8])
def test_mse_parity(seed, bits):
    x = rand(512, seed=seed, scale=2.0)
    rd, rz = ref_mse(torch.from_numpy(x), False, 2 ** bits, False)
    qp = init_scale(jnp.asarray(x), bits, Scaler.MSE)
    assert np.isclose(float(qp.delta), float(rd), rtol=1e-5)
    assert np.isclose(float(qp.zero_point), float(rz), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bits", [4, 8])
def test_kl_parity(seed, bits):
    from quant.quant_layer import kl as ref_kl

    x = rand(512, seed=seed, scale=3.0)
    rd, rz = ref_kl(torch.from_numpy(x), False, 2 ** bits, False)
    qp = init_scale(jnp.asarray(x), bits, Scaler.KL)
    assert np.isclose(float(qp.delta), float(rd), rtol=1e-5)
    rz = float(rz) if torch.is_tensor(rz) else float(rz)
    assert np.isclose(float(qp.zero_point), rz, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bits", [4, 8])
def test_hist_parity(seed, bits):
    from quant.quant_layer import hist as ref_hist

    x = rand(512, seed=seed, scale=2.0)
    rd, rz = ref_hist(torch.from_numpy(x), False, 2 ** bits, False)
    qp = init_scale(jnp.asarray(x), bits, Scaler.HIST)
    assert np.isclose(float(qp.delta), float(rd), rtol=1e-5)
    rz = float(rz) if torch.is_tensor(rz) else float(rz)
    assert np.isclose(float(qp.zero_point), rz, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bits", [4])
def test_omse_parity(seed, bits):
    # bits=4 keeps the reference's 80 x level grid affordable in torch
    from quant.quant_layer import omse as ref_omse

    x = rand(256, seed=seed, scale=1.5)
    rd, rz = ref_omse(torch.from_numpy(x), False, 2 ** bits, False)
    qp = init_scale(jnp.asarray(x), bits, Scaler.OMSE)
    assert np.isclose(float(qp.delta), float(rd), rtol=1e-5)
    assert np.isclose(float(qp.zero_point), float(rz), rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bits", [6, 8])
def test_logminmax_parity(seed, bits):
    # reference logminmax returns only delta (quant_layer.py:41-61) and
    # searches in float16 with positive-exponent reconstruction
    from quant.quant_layer import logminmax as ref_logminmax

    x = rand(4, 64, seed=seed, positive=True)
    x = x / x.max()  # softmax-like, in (0, 1]
    rd = ref_logminmax(torch.from_numpy(x), False, 2 ** bits, False)
    qp = init_scale(jnp.asarray(x), bits, Scaler.LOGMINMAX)
    assert np.isclose(float(qp.delta), float(rd), rtol=1e-3)
    assert float(qp.zero_point) == 0.0


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("channel_wise", [False, True])
def test_uniform_quantizer_forward_parity(bits, channel_wise):
    x = rand(8, 16, seed=3)
    ref_q = UniformAffineQuantizer(
        bits=bits, symmetric=False, channel_wise=channel_wise, scaler=RefScaler.MINMAX
    )
    with torch.no_grad():
        ref_out = ref_q(torch.from_numpy(x)).numpy()
    if channel_wise:
        qp = init_scale_channelwise(jnp.asarray(x), bits, Scaler.MINMAX)
    else:
        qp = init_scale(jnp.asarray(x), bits, Scaler.MINMAX)
    ours = np.asarray(fake_quant(jnp.asarray(x), qp, bits))
    assert np.allclose(ours, ref_out, atol=1e-5)


@pytest.mark.parametrize("bits", [6, 8])
def test_log2_quantizer_parity(bits):
    x = rand(4, 8, 77, seed=4, positive=True)
    x = x / x.max()  # softmax-like, in (0, 1]
    ref_q = T2ILogQuantizer(bits=bits, always_zero=True)
    with torch.no_grad():
        ref_out = ref_q(torch.from_numpy(x)).numpy()
    d = log2_init_delta(jnp.asarray(x), bits)
    assert np.isclose(float(d), float(ref_q.delta), rtol=1e-4)
    ours = np.asarray(log2_fake_quant(jnp.asarray(x), d, bits))
    # XLA's log2 and libm's log2 can differ by ~1 ulp; values landing within
    # float error of a rounding boundary (-log2 ~ k+0.5) may flip to the
    # neighboring bin. Require exactness away from boundaries and allow only
    # factor-of-2 neighbor-bin flips at boundaries, for <0.5% of elements.
    mism = ~np.isclose(ours, ref_out, atol=1e-5)
    assert mism.mean() < 0.005
    if mism.any():
        ratio = ours[mism] / ref_out[mism]
        assert np.all((np.isclose(ratio, 2.0)) | (np.isclose(ratio, 0.5)))
        boundary = -np.log2(x[mism] / float(d))
        assert np.all(np.abs(boundary - np.round(boundary - 0.5) - 0.5) < 1e-3)


def test_log2_running_stat_ema_parity():
    """Static-log2 delta EMA during running-stat passes: the reference's
    T2ILogQuantizer.act_momentum_update (quant_layer_text.py:109-117) vs our
    log2_ema_update flow (init from batch 0, then per-batch EMA with the
    batch max — the ordering cali_model_aq enforces by enabling running_stat
    only after the lazy-init forward, calibration.py:66-76)."""
    from dgq_tpu.quant.log2 import log2_ema_update

    batches = []
    for s in range(4):
        x = rand(2, 8, 77, seed=20 + s, positive=True)
        batches.append(x / x.max() * (0.8 + 0.1 * s))

    ref_q = T2ILogQuantizer(bits=8, always_zero=True, leaf_param=True)
    with torch.no_grad():
        _ = ref_q(torch.from_numpy(batches[0]))  # lazy init, no EMA yet
        ref_q.running_stat = True
        for x in batches:
            _ = ref_q(torch.from_numpy(x))
        ref_q.running_stat = False

    delta = log2_init_delta(jnp.asarray(batches[0]), 8)
    for x in batches:
        delta = log2_ema_update(delta, jnp.max(jnp.asarray(x)))
    assert np.isclose(float(delta), float(ref_q.delta), rtol=1e-5)

    x_eval = jnp.asarray(batches[-1])
    with torch.no_grad():
        ref_out = ref_q(torch.from_numpy(batches[-1])).numpy()
    ours = np.asarray(log2_fake_quant(x_eval, delta, 8))
    mism = ~np.isclose(ours, ref_out, atol=1e-5)
    assert mism.mean() < 0.005  # log2 ulp boundary flips only


def test_log2_ema_through_act_calibration_driver():
    """ema_update_qstate must EMA qstate['sm'] deltas (static t2i_log_quant)
    — the wiring the reference exercises through set_running_stat."""
    import jax

    from dgq_tpu.calib.act_calib import ema_update_qstate, init_act_qstate
    from dgq_tpu.models.qconfig import QConfig
    from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
    from dgq_tpu.quant.log2 import log2_ema_update

    spec = sd_unet_spec(base=32)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec, fast=True)
    cfg = QConfig(w_bits=8, a_bits=8, softmax_bits=8, use_wq=False,
                  use_aq=True, t2i_log_quant=True)
    rng = np.random.RandomState(0)

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return (
            jnp.asarray(r.randn(2, 8, 8, 4).astype(np.float32)),
            jnp.asarray(np.full((2,), 500, np.int32)),
            jnp.asarray(r.randn(2, 77, 768).astype(np.float32)),
        )

    init_batch = mk_batch(1)
    qstate, ranges = init_act_qstate(params, init_batch, spec, cfg,
                                     unet_apply=unet_sd_apply)
    assert qstate["sm"], "static t2i_log_quant must produce sm deltas"
    before = {n: float(v) for n, v in qstate["sm"].items()}
    # one batch: the expected delta is exactly ema(d0, batch_max) with the
    # batch max of the PRE-quant softmax tap collected under the SAME qstate
    # the driver saw (qstate evolves between batches, so multi-batch
    # verification would have to replay the whole evolution)
    batch = mk_batch(2)
    qstate2, _ = ema_update_qstate(params, qstate, ranges, [batch], cfg, spec,
                                   unet_apply=unet_sd_apply)
    from dgq_tpu.calib.act_calib import _collect_minmax

    n0 = sorted(qstate["sm"])[0]
    mm = _collect_minmax(params, qstate, batch, names=(n0,),
                         cfg=cfg.replace(use_aq=True),
                         unet_apply=unet_sd_apply)
    d = log2_ema_update(jnp.asarray(before[n0]), mm[0, 1])
    assert np.isclose(float(qstate2["sm"][n0]), float(d), rtol=1e-6)
    assert not np.isclose(float(qstate2["sm"][n0]), before[n0])
    del rng


def test_adaround_parity_hard_and_soft():
    w = rand(16, 32, seed=5, scale=0.1)
    ref_u = UniformAffineQuantizer(bits=4, channel_wise=True, scaler=RefScaler.MINMAX)
    with torch.no_grad():
        _ = ref_u(torch.from_numpy(w))  # lazy init
    ref_a = AdaRoundQuantizer(ref_u, torch.from_numpy(w), RMODE.LEARNED_HARD_SIGMOID)

    qp = init_scale_channelwise(jnp.asarray(w), 4, Scaler.MINMAX)
    assert np.allclose(np.asarray(qp.delta), ref_u.delta.numpy(), rtol=1e-6)
    alpha = adaround_init_alpha(jnp.asarray(w), qp.delta)
    assert np.allclose(np.asarray(alpha), ref_a.alpha.detach().numpy(), atol=1e-4)

    # hard rounding
    with torch.no_grad():
        ref_hard = ref_a(torch.from_numpy(w)).numpy()
    ours_hard = np.asarray(adaround_quant(jnp.asarray(w), qp, alpha, 4, soft=False))
    assert np.allclose(ours_hard, ref_hard, atol=1e-5)

    # soft rounding
    ref_a.soft_tgt = True
    with torch.no_grad():
        ref_soft = ref_a(torch.from_numpy(w)).numpy()
    ours_soft = np.asarray(adaround_quant(jnp.asarray(w), qp, alpha, 4, soft=True))
    assert np.allclose(ours_soft, ref_soft, atol=1e-5)


def test_group_quant_parity_full_flow():
    """End-to-end group path: record stats over batches -> kmeans -> qparams,
    vs the reference quantizer's record_min_max_ema + done_group_num."""
    from dgq_tpu.quant.groups import (
        init_group_stats,
        kmeans_group_qparams,
        update_group_stats,
    )

    batches = [rand(2, 6, 16, seed=10 + i) for i in range(3)]
    # amplify some channels so grouping is meaningful
    for b in batches:
        b[..., 8:] *= 15.0

    ref_q = UniformAffineQuantizer(bits=8, scaler=RefScaler.MINMAX, leaf_param=True)
    with torch.no_grad():
        _ = ref_q(torch.from_numpy(batches[0]))  # lazy init
    ref_q.group_num = 4
    with torch.no_grad():
        for b in batches:
            ref_q.record_min_max_ema(torch.from_numpy(b))
    ref_q.delta = torch.nn.Parameter(torch.zeros(1))
    ref_q.zero_point = torch.nn.Parameter(torch.zeros(1))
    ref_delta, ref_zp = ref_q.done_group_num(4, "minmax")

    stats = init_group_stats(batches[0].shape)
    for b in batches:
        stats = update_group_stats(stats, jnp.asarray(b))
    qp, labels, in_wise = kmeans_group_qparams(stats, group_num=4, level=256)

    assert np.asarray(qp.delta).shape == tuple(ref_delta.shape)
    assert np.allclose(np.asarray(qp.delta), ref_delta.numpy(), rtol=1e-5)
    assert np.allclose(np.asarray(qp.zero_point), ref_zp.numpy(), rtol=1e-5)


def test_group_quant_parity_mean_mode():
    """done_group_num(mode='mean') parity: cluster centers instead of the
    per-cluster min/max envelope (quant_layer.py:371-373)."""
    from dgq_tpu.quant.groups import (
        init_group_stats,
        kmeans_group_qparams,
        update_group_stats,
    )

    batches = [rand(2, 6, 16, seed=20 + i) for i in range(3)]
    for b in batches:
        b[..., 8:] *= 15.0

    ref_q = UniformAffineQuantizer(bits=8, scaler=RefScaler.MINMAX, leaf_param=True)
    with torch.no_grad():
        _ = ref_q(torch.from_numpy(batches[0]))  # lazy init
    ref_q.group_num = 4
    with torch.no_grad():
        for b in batches:
            ref_q.record_min_max_ema(torch.from_numpy(b))
    ref_q.delta = torch.nn.Parameter(torch.zeros(1))
    ref_q.zero_point = torch.nn.Parameter(torch.zeros(1))
    ref_delta, ref_zp = ref_q.done_group_num(4, "mean")

    stats = init_group_stats(batches[0].shape)
    for b in batches:
        stats = update_group_stats(stats, jnp.asarray(b))
    qp, labels, in_wise = kmeans_group_qparams(
        stats, group_num=4, level=256, mode="mean")

    assert np.asarray(qp.delta).shape == tuple(ref_delta.shape)
    assert np.allclose(np.asarray(qp.delta), ref_delta.numpy(), rtol=1e-5)
    assert np.allclose(np.asarray(qp.zero_point), ref_zp.numpy(), rtol=1e-5)


def test_ema_momentum_update_parity():
    """minmax_qparams_from_range == reference act_momentum_update (including
    the corner-element seeding quirk, quant_layer.py:431-446)."""
    from dgq_tpu.quant.affine import minmax_qparams_from_range

    rng = np.random.RandomState(11)
    init_x = rng.randn(64).astype(np.float32)
    ref_q = UniformAffineQuantizer(bits=8, scaler=RefScaler.MINMAX, leaf_param=True)
    with torch.no_grad():
        _ = ref_q(torch.from_numpy(init_x))  # lazy init seeds x_min/x_max

    x_min = float(ref_q.x_min)
    x_max = float(ref_q.x_max)
    for seed in (12, 13, 14):
        batch = rng.randn(64).astype(np.float32) * (1 + seed % 3)
        with torch.no_grad():
            ref_q.act_momentum_update(torch.from_numpy(batch))
        x_min = x_min * 0.95 + batch.min() * 0.05
        x_max = x_max * 0.95 + batch.max() * 0.05
        qp = minmax_qparams_from_range(
            jnp.asarray(x_min), jnp.asarray(x_max), bits=8
        )
        assert np.isclose(float(qp.delta), float(ref_q.delta), rtol=1e-5), seed
        assert np.isclose(float(qp.zero_point), float(ref_q.zero_point), rtol=1e-5)


def test_log2_ema_update_parity():
    """T2ILogQuantizer EMA delta update (quant_layer_text.py:109-117)."""
    from dgq_tpu.quant.log2 import log2_ema_update

    rng = np.random.RandomState(15)
    x0 = np.abs(rng.randn(256)).astype(np.float32)
    x0 = x0 / x0.max()
    ref_q = T2ILogQuantizer(bits=8, always_zero=True, leaf_param=True)
    with torch.no_grad():
        _ = ref_q(torch.from_numpy(x0))
    ref_q.delta = torch.nn.Parameter(ref_q.delta)
    delta = jnp.asarray(float(ref_q.delta))
    for seed in (16, 17):
        batch = np.abs(rng.randn(256)).astype(np.float32) * 0.8
        with torch.no_grad():
            ref_q.act_momentum_update(torch.from_numpy(batch))
        delta = log2_ema_update(delta, jnp.asarray(batch))
        assert np.isclose(float(delta), float(ref_q.delta), rtol=1e-5)
