"""Checkpoint round-trip tests: our writers produce reference-format .pth
files; loading them back reproduces identical quantized models. When the
reference is mounted, we additionally verify the torch QuantModel can
consume our weight-only checkpoint (format-level compatibility)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.calib.act_calib import calibrate_activations
from dgq_tpu.calib.weight_calib import (
    fold_weight_quant,
    init_weight_qparams,
    quantize_model_weights,
)
from dgq_tpu.io.dgq_ckpt import (
    act_dict_to_qstate,
    load_merged,
    load_weight_only,
    merge_ckpts,
    qstate_to_act_dict,
    save_act_ckpt,
    save_weight_only,
)
from dgq_tpu.models.qconfig import GroupQParams, QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.quant.scalers import Scaler

BASE, CROSS = 32, 64


@pytest.fixture(scope="module")
def tiny():
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    return spec, params


def test_weight_only_roundtrip(tmp_path, tiny):
    spec, params = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    path = str(tmp_path / "cali_ckpt.pth_weight_only")
    save_weight_only(path, params, wqp, spec)

    p2, wqp2, alphas2 = load_weight_only(path, spec)
    assert not alphas2
    # identical quantized forward
    pq1 = fold_weight_quant(params, wqp, spec, cfg)
    pq2 = fold_weight_quant(p2, wqp2, spec, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([300], jnp.int32)
    ehs = jax.random.normal(jax.random.PRNGKey(2), (1, 77, CROSS))
    o1 = unet_sd_apply(pq1, x, t, ehs, cfg=cfg)
    o2 = unet_sd_apply(pq2, x, t, ehs, cfg=cfg)
    assert np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_weight_ckpt_key_format(tmp_path, tiny):
    spec, params = tiny
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    path = str(tmp_path / "ck.pth_weight_only")
    save_weight_only(path, params, wqp, spec)
    import torch

    ckpt = torch.load(path, weights_only=False)
    assert set(ckpt) == {"weight"}
    state = ckpt["weight"]
    # reference key shapes: conv w OIHW, wqtizer delta (O,1,1,1); linear (O,I)/(O,1)
    w = state["model.down_blocks.0.resnets.0.conv1.w"]
    assert tuple(w.shape) == (BASE, BASE, 3, 3)
    d = state["model.down_blocks.0.resnets.0.conv1.wqtizer.delta"]
    assert tuple(d.shape) == (BASE, 1, 1, 1)
    lw = state["model.time_embedding.linear_1.w"]
    assert tuple(lw.shape) == (BASE * 4, BASE)
    ld = state["model.time_embedding.linear_1.wqtizer.delta"]
    assert tuple(ld.shape) == (BASE * 4, 1)
    # original_w is a plain tensor in the reference (quant_layer.py:604-610),
    # never serialized — writing it would be an unexpected key on their side
    assert "model.down_blocks.0.resnets.0.conv1.original_w" not in state
    # norms keep torch names
    assert "model.conv_norm_out.weight" in state


def test_adaround_alpha_roundtrip(tmp_path, tiny):
    spec, params = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    from dgq_tpu.quant.adaround import adaround_init_alpha

    names = ["down_blocks.0.resnets.0.conv1", "time_embedding.linear_1"]
    alphas = {n: adaround_init_alpha(params[n]["w"], wqp[n].delta) for n in names}
    path = str(tmp_path / "ada.pth_weight_only")
    save_weight_only(path, params, wqp, spec, alphas=alphas)
    p2, wqp2, alphas2 = load_weight_only(path, spec)
    assert set(alphas2) == set(names)
    for n in names:
        assert np.allclose(np.asarray(alphas2[n]), np.asarray(alphas[n]), atol=1e-6)


def test_act_ckpt_roundtrip_group(tmp_path, tiny):
    spec, params = tiny
    from dgq_tpu.quant.affine import QParams

    # synth per-t qstates: one per-tensor point, one mid-group, one last-group
    conv = "down_blocks.0.resnets.0.conv1"
    lin = "mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    att = "mid_block.attentions.0.transformer_blocks.0.attn1.aqtizer_q"
    ckk = BASE * 9
    qs = {
        "a": {
            lin: QParams(jnp.asarray(0.03), jnp.asarray(7.0)),
            conv: GroupQParams(
                delta_mid=jnp.linspace(0.01, 0.2, ckk), zp_mid=jnp.ones((ckk,)),
                delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)),
            ),
            att: GroupQParams(
                delta_mid=jnp.ones((1,)), zp_mid=jnp.zeros((1,)),
                delta_last=jnp.linspace(0.02, 0.1, 16), zp_last=jnp.ones((16,)),
            ),
        },
        "sm": {},
    }
    per_t = {"act_0": qs, "act_1": qs}
    path = str(tmp_path / "act.pth")
    save_act_ckpt(path, per_t, spec)

    import torch

    raw = torch.load(path, weights_only=False)
    assert set(raw) == {"act_0", "act_1"}
    d = raw["act_0"][f"model.{conv}.aqtizer.delta"]
    assert tuple(d.shape) == (1, ckk, 1)  # reference mid-axis group shape
    d2 = raw["act_0"][f"model.{att}.delta"]
    assert tuple(d2.shape) == (1, 1, 16)

    qs2, group_layers = act_dict_to_qstate(
        {k: v.numpy() for k, v in raw["act_0"].items()}, spec
    )
    assert group_layers == (conv,)
    g = qs2["a"][conv]
    assert isinstance(g, GroupQParams)
    assert np.allclose(np.asarray(g.delta_mid), np.linspace(0.01, 0.2, ckk), atol=1e-6)
    p = qs2["a"][lin]
    assert float(p.delta) == pytest.approx(0.03)


def test_act_ckpt_roundtrip_mixed_axis_stacks(tmp_path, tiny):
    """The k-means heuristic may pick the mid axis at one timestep and the
    last axis at another for the SAME layer; round-tripped qstates must still
    stack into a [T]-leading qstate (ones on the unused axis broadcast)."""
    spec, params = tiny
    from dgq_tpu.calib.act_calib import stack_time_qstates
    from dgq_tpu.quant.affine import QParams

    conv = "down_blocks.0.resnets.0.conv1"
    ckk = BASE * 9
    qs_mid = {"a": {conv: GroupQParams(
        delta_mid=jnp.linspace(0.01, 0.2, ckk), zp_mid=jnp.ones((ckk,)),
        delta_last=jnp.ones((1,)), zp_last=jnp.zeros((1,)),
    )}, "sm": {}}
    qs_last = {"a": {conv: GroupQParams(
        delta_mid=jnp.ones((1,)), zp_mid=jnp.zeros((1,)),
        delta_last=jnp.linspace(0.02, 0.1, 64), zp_last=jnp.ones((64,)),
    )}, "sm": {}}
    path = str(tmp_path / "act.pth")
    save_act_ckpt(path, {"act_0": qs_mid, "act_1": qs_last}, spec)

    import torch

    raw = torch.load(path, weights_only=False)
    per_t = {}
    for t in ("act_0", "act_1"):
        per_t[t], _ = act_dict_to_qstate(
            {k: v.numpy() for k, v in raw[t].items()}, spec)
    stacked = stack_time_qstates(per_t)
    g = stacked["a"][conv]
    assert g.delta_mid.shape == (2, ckk)
    assert g.delta_last.shape == (2, 64)
    # the unused axes broadcast to ones
    assert np.allclose(np.asarray(g.delta_mid[1]), 1.0)
    assert np.allclose(np.asarray(g.delta_last[0]), 1.0)
    assert np.allclose(np.asarray(g.delta_mid[0]),
                       np.linspace(0.01, 0.2, ckk), atol=1e-6)


def test_act_ckpt_roundtrip_sm_delta(tmp_path, tiny):
    """Calibrated log2 softmax deltas (qstate['sm']) must survive the
    checkpoint round-trip as delta-only keys (the log2 quantizer has no zero
    point; the reference's own saver drops these entirely)."""
    spec, params = tiny
    att_w = "mid_block.attentions.0.transformer_blocks.0.attn1.aqtizer_w"
    qs = {"a": {}, "sm": {att_w: jnp.asarray(0.125)}}
    path = str(tmp_path / "act_sm.pth")
    save_act_ckpt(path, {"act_0": qs}, spec)

    import torch

    raw = torch.load(path, weights_only=False)
    assert f"model.{att_w}.delta" in raw["act_0"]
    assert f"model.{att_w}.zero_point" not in raw["act_0"]
    qs2, _ = act_dict_to_qstate(
        {k: v.numpy() for k, v in raw["act_0"].items()}, spec)
    assert float(qs2["sm"][att_w]) == pytest.approx(0.125)


def test_merge(tmp_path, tiny):
    spec, params = tiny
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    wpath = str(tmp_path / "w.pth_weight_only")
    save_weight_only(wpath, params, wqp, spec)
    from dgq_tpu.quant.affine import QParams

    qs = {"a": {"conv_in": QParams(jnp.asarray(0.1), jnp.asarray(0.0))}, "sm": {}}
    apath = str(tmp_path / "a.pth")
    save_act_ckpt(apath, {"act_0": qs}, spec)
    mpath = str(tmp_path / "m.pth_merged")
    merge_ckpts(wpath, apath, mpath)

    p, w, al, per_t, gl = load_merged(mpath, spec)
    assert p is not None and "act_0" in per_t
    assert float(per_t["act_0"]["a"]["conv_in"].delta) == pytest.approx(0.1)
