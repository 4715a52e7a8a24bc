"""End-to-end calibration tests on a tiny (base=32) structurally-identical
SD UNet: weight PTQ, AdaRound reconstruction, activation calibration
(vanilla EMA + DGQ group path), and the scanned quantized sampler."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.calib.act_calib import (
    act_qpoint_names,
    calibrate_activations,
    init_act_qstate,
    stack_time_qstates,
    tap_execution_order,
)
from dgq_tpu.calib.reconstruction import (
    calibrate_weights,
    capture_unit_io,
    recon_units,
)
from dgq_tpu.calib.weight_calib import quantize_model_weights, init_weight_qparams
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.pipeline.sampler import sd_sample
from dgq_tpu.quant.scalers import Scaler

BASE = 32
CROSS = 64


@pytest.fixture(scope="module")
def tiny():
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    rng = np.random.RandomState(0)
    n = 4
    cali = (
        jnp.asarray(rng.randn(n, 16, 16, 4).astype(np.float32)),
        jnp.asarray(rng.randint(0, 1000, (n,)).astype(np.int32)),
        jnp.asarray(rng.randn(n, 77, CROSS).astype(np.float32)),
    )
    return spec, params, cali


def test_weight_only_w8_close_to_fp(tiny):
    spec, params, cali = tiny
    cfg = QConfig(w_bits=8, use_wq=True)
    pq, wqp = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
    x, t, ehs = (c[:1] for c in cali)
    fp = unet_sd_apply(params, x, t, ehs)
    q8 = unet_sd_apply(pq, x, t, ehs, cfg=cfg)
    rel = float(jnp.linalg.norm(q8 - fp) / jnp.linalg.norm(fp))
    assert rel < 0.1, rel
    # conv_in / conv_out weights untouched
    assert np.allclose(pq["conv_in"]["w"], params["conv_in"]["w"])
    assert np.allclose(pq["conv_out"]["w"], params["conv_out"]["w"])
    # quantized weights differ from fp
    assert not np.allclose(pq["down_blocks.0.resnets.0.conv1"]["w"],
                           params["down_blocks.0.resnets.0.conv1"]["w"])


def test_recon_units_structure(tiny):
    spec, _, _ = tiny
    units = recon_units(spec)
    kinds = {u.kind for u in units}
    assert kinds == {"resnet", "transformer", "layer"}
    names = [u.name for u in units]
    assert "conv_in" not in names and "conv_out" not in names
    assert "down_blocks.0.resnets.0" in names
    assert "mid_block.attentions.0.transformer_blocks.0" in names
    assert "time_embedding.linear_1" in names
    # every quantizable layer except conv_in/out is covered exactly once
    covered = [l for u in units for l in u.layers]
    assert len(covered) == len(set(covered))
    qnames = [n for n, k, _ in spec if k in ("conv", "linear")]
    assert set(covered) == set(qnames) - {"conv_in", "conv_out"}


def test_capture_unit_io_matches_direct(tiny):
    spec, params, cali = tiny
    cfg = QConfig()
    batch = tuple(c[:2] for c in cali)
    (ins, out) = capture_unit_io(params, batch, "down_blocks.0.resnets.0", cfg)
    assert len(ins) == 2  # (x, temb)
    from dgq_tpu.models.layers import resnet_block
    direct = resnet_block(params, "down_blocks.0.resnets.0", ins[0], ins[1],
                          None, cfg, has_shortcut=False)
    assert np.allclose(np.asarray(direct), np.asarray(out), atol=1e-5)


def test_adaround_reconstruction_improves_block(tiny):
    spec, params, cali = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    # walk only the first units to bound test time; the full walk is the same
    # code in a longer loop
    alphas = calibrate_weights(
        params, spec, cfg, wqp, cali, iters=60, batch_size=2, capture_batch=4,
        asym=True, max_units=6,
    )
    from dgq_tpu.calib.reconstruction import recon_units
    covered = [l for u in recon_units(spec)[:6] for l in u.layers]
    assert set(alphas) == set(covered)
    from dgq_tpu.calib.weight_calib import fold_weight_quant
    x, t, ehs = (c[:2] for c in cali)
    fp = unet_sd_apply(params, x, t, ehs)

    sub_wqp = {k: wqp[k] for k in alphas}
    p_nearest = fold_weight_quant(params, sub_wqp, spec, cfg)
    p_ada = fold_weight_quant(params, sub_wqp, spec, cfg, alphas=alphas, soft=False)
    err_nearest = float(jnp.mean((unet_sd_apply(p_nearest, x, t, ehs) - fp) ** 2))
    err_ada = float(jnp.mean((unet_sd_apply(p_ada, x, t, ehs) - fp) ** 2))
    # with few iters AdaRound should at least be in the same ballpark;
    # typically it improves on nearest rounding even early
    assert err_ada < err_nearest * 1.5, (err_ada, err_nearest)


def test_act_qpoints_and_order(tiny):
    spec, params, cali = tiny
    cfg = QConfig()
    names = act_qpoint_names(spec)
    order = tap_execution_order(params, tuple(c[:1] for c in cali), cfg)
    # all layer aq points + attention q/k/v/w appear in the traced order
    assert set(names) <= set(order)
    assert order[0] == "time_embedding.linear_1"


def test_act_calibration_vanilla_and_sampler(tiny):
    spec, params, cali = tiny
    cfg = QConfig(w_bits=8, a_bits=8, softmax_bits=8, use_wq=True, use_aq=True)
    pq, wqp = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
    interval = 2  # 4 samples -> 2 timestep chunks
    per_t, group_layers = calibrate_activations(
        pq, spec, cfg, cali, interval=interval, group_num=0,
        running_stat=True, batch_size=2, init_chunk=500,
    )
    assert set(per_t) == {"act_0", "act_1"}
    assert group_layers == ()
    qs0 = per_t["act_0"]
    assert len(qs0["a"]) > 200

    # quantized forward with act quant runs and stays finite
    x, t, ehs = (c[:1] for c in cali)
    out = unet_sd_apply(pq, x, t, ehs, qstate=qs0, cfg=cfg)
    assert np.isfinite(np.asarray(out)).all()

    # stacked time-aware sampling through the scan
    stacked = stack_time_qstates(per_t)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    final = sd_sample(
        pq, latents, ehs_text=ehs, ehs_uncond=ehs, num_inference_steps=2,
        scheduler="ddim", qstate=stacked, cfg=cfg, time_aware=True,
    )
    assert np.isfinite(np.asarray(final)).all()


def test_act_calibration_group_path(tiny):
    spec, params, cali = tiny
    cfg = QConfig(
        w_bits=8, a_bits=8, softmax_bits=8, use_wq=True, use_aq=True,
        t2i_log_quant=True, t2i_real_time=True, t2i_start_peak=True,
    )
    pq, wqp = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
    per_t, group_layers = calibrate_activations(
        pq, spec, cfg, tuple(c[:2] for c in cali), interval=2, group_num=2,
        batch_size=2, init_chunk=500,
    )
    qs = per_t["act_0"]
    assert len(group_layers) > 0
    from dgq_tpu.models.qconfig import GroupQParams
    n_group = sum(isinstance(v, GroupQParams) for v in qs["a"].values())
    assert n_group > 100
    # group conv runs the unfold path at inference
    cfg_run = cfg.replace(group_conv_layers=group_layers)
    x, t, ehs = (c[:1] for c in cali)
    out = unet_sd_apply(pq, x, t, ehs, qstate=qs, cfg=cfg_run)
    assert np.isfinite(np.asarray(out)).all()


def test_pndm_sampler_with_quant(tiny):
    spec, params, cali = tiny
    cfg = QConfig(w_bits=8, use_wq=True)
    pq, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
    latents = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4))
    ehs = cali[2][:1]
    out = sd_sample(pq, latents, ehs, ehs, num_inference_steps=3,
                    scheduler="pndm", cfg=cfg)
    assert out.shape == latents.shape
    assert np.isfinite(np.asarray(out)).all()
