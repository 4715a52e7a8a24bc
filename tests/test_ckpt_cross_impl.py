"""Cross-implementation checkpoint compatibility vs the actual reference.

Round-trips a weight-only checkpoint in BOTH directions between the
reference's torch QuantModel (quant/quant_model.py) and our reader/writer
(io/dgq_ckpt.py), comparing quantized forwards — catching key-name or shape
drift that same-implementation round-trip tests cannot see.

The model under test is a miniature UNet whose module paths mirror real SD
state-dict paths (conv_in + down_blocks.0.resnets.0), so the checkpoint keys
are exactly the reference format (SURVEY §2.3).
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "quant")):
    pytest.skip("reference checkout not available", allow_module_level=True)

if REF not in sys.path:
    sys.path.insert(0, REF)
sys.path.insert(0, os.path.dirname(__file__))

from ref_shim import install_diffusers_shim  # noqa: E402

install_diffusers_shim()

import jax.numpy as jnp  # noqa: E402

from dgq_tpu.calib.weight_calib import (  # noqa: E402
    fold_weight_quant,
    init_weight_qparams,
)
from dgq_tpu.io.dgq_ckpt import (  # noqa: E402
    load_weight_only,
    save_weight_only,
)
from dgq_tpu.models.layers import quant_conv2d, resnet_block  # noqa: E402
from dgq_tpu.models.qconfig import QConfig  # noqa: E402

C = 32  # GroupNorm(32, ...) is hardcoded in the reference block


def _mini_spec():
    rb = "down_blocks.0.resnets.0"
    return [
        ("conv_in", "conv", (4, C, 3, 1, 1)),
        (f"{rb}.norm1", "gnorm", (C,)),
        (f"{rb}.conv1", "conv", (C, C, 3, 1, 1)),
        (f"{rb}.time_emb_proj", "linear", (1280, C, True)),
        (f"{rb}.norm2", "gnorm", (C,)),
        (f"{rb}.conv2", "conv", (C, C, 3, 1, 1)),
    ]


def _build_ref_qnn(seed: int = 0, aq_leaf_param: bool = False):
    """Reference QuantModel around a mini UNet with real SD module paths."""
    from diffusers_rewrite.sd import ResnetBlock2D
    from quant.quant_model import QuantModel

    torch.manual_seed(seed)

    class MiniUNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = torch.nn.Conv2d(4, C, 3, padding=1)
            blk = torch.nn.Module()
            blk.resnets = torch.nn.ModuleList(
                [ResnetBlock2D(C, C, conv_shortcut=False)]
            )
            self.down_blocks = torch.nn.ModuleList([blk])
            self.config = types.SimpleNamespace(
                in_channels=4, sample_size=8, time_cond_proj_dim=None
            )

        def forward(self, x, temb):
            h = self.conv_in(x)
            return self.down_blocks[0].resnets[0](h, temb)

    wq_params = {"bits": 4, "channel_wise": True, "leaf_param": True}
    aq_params = {"bits": 8, "channel_wise": False,
                 "leaf_param": aq_leaf_param}
    softmax_aq_params = {"softmax_a_bit": 8, "t2i_log_quant": False,
                         "t2i_real_time": False, "t2i_start_peak": False,
                         "log_max_1": False}
    qnn = QuantModel(MiniUNet(), wq_params, aq_params, softmax_aq_params)
    qnn.eval()
    qnn.set_quant_state(use_wq=True, use_aq=False)
    return qnn


def _promote_qparams(qnn):
    """Mirror cali_model's pre-save promotion of delta/zero_point to
    nn.Parameter (reference calibration.py:160-170) so they enter state_dict."""
    from quant.quant_layer import UniformAffineQuantizer

    for m in qnn.modules():
        if isinstance(m, UniformAffineQuantizer) and m.delta is not None:
            if not torch.is_tensor(m.zero_point):
                m.zero_point = torch.nn.Parameter(
                    torch.tensor(float(m.zero_point)))
            elif not isinstance(m.zero_point, torch.nn.Parameter):
                m.zero_point = torch.nn.Parameter(m.zero_point)
            if not isinstance(m.delta, torch.nn.Parameter):
                m.delta = torch.nn.Parameter(m.delta)


def _ours_forward(params_q, x_nhwc, temb):
    cfg = QConfig(w_bits=4, use_wq=True, disable_out_quant=False)
    h = quant_conv2d(params_q["conv_in"], x_nhwc, "conv_in", None, cfg, 1, 1)
    return resnet_block(params_q, "down_blocks.0.resnets.0", h, temb, None,
                        cfg, has_shortcut=False)


def test_reference_save_our_load(tmp_path):
    """torch.save({'weight': qnn.state_dict()}) -> our loader -> same forward."""
    qnn = _build_ref_qnn(seed=0)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    temb = rng.randn(2, 1280).astype(np.float32)

    with torch.no_grad():
        # QuantModel.forward is UNet-signature-specific; drive the wrapped
        # module directly (surgery happened in place on qnn.model)
        qnn.model(torch.from_numpy(x), torch.from_numpy(temb))  # lazy init
        ref_out = qnn.model(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    _promote_qparams(qnn)
    path = str(tmp_path / "cali_ckpt.pth_weight_only")
    torch.save({"weight": qnn.state_dict()}, path)

    spec = _mini_spec()
    params, wqp, alphas = load_weight_only(path, spec)
    assert alphas is None or not alphas  # no AdaRound keys in this ckpt
    assert set(wqp) == {"conv_in", "down_blocks.0.resnets.0.conv1",
                        "down_blocks.0.resnets.0.time_emb_proj",
                        "down_blocks.0.resnets.0.conv2"}
    cfg = QConfig(w_bits=4, use_wq=True, disable_out_quant=False)
    params_q = fold_weight_quant(params, wqp, spec, cfg)

    ours = _ours_forward(params_q, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         jnp.asarray(temb))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    # atol: the layout-aware norms use one-pass E[x^2]-E[x]^2 stats and a
    # folded x*A+B emission (models/layers.py group_norm), a ~1e-7-relative
    # reassociation vs torch's two-pass form that amplifies to ~1e-5 absolute
    # through the quantized convs of this tiny UNet
    assert np.allclose(ours, ref_out, atol=5e-5), np.abs(ours - ref_out).max()


def _promote_aqtizers(qnn):
    """Mirror cali_model_aq's pre-save promotion of aqtizer zero_points
    (reference calibration_group_quantization.py:94-100)."""
    from quant.quant_layer import UniformAffineQuantizer

    for name, m in qnn.model.named_modules():
        if "aqtizer" in name and isinstance(m, UniformAffineQuantizer) \
                and m.delta is not None:
            if not torch.is_tensor(m.zero_point):
                m.zero_point = torch.nn.Parameter(
                    torch.tensor(float(m.zero_point)))
            elif not isinstance(m.zero_point, torch.nn.Parameter):
                m.zero_point = torch.nn.Parameter(m.zero_point)


def _collect_ref_act_dict(qnn):
    """The reference's act_{t} collection verbatim
    (calibration_group_quantization.py:102-107)."""
    temp = {}
    for name, m in qnn.model.named_modules():
        if "aqtizer" in name and len(list(m.cpu().state_dict().keys())) == 2:
            temp[f"model.{name}.delta"] = m.cpu().state_dict()["delta"]
            temp[f"model.{name}.zero_point"] = m.cpu().state_dict()["zero_point"]
    return temp


def test_reference_act_ckpt_our_load(tmp_path):
    """Reference activation checkpoint ('act_0' dict of aqtizer delta/zp)
    -> our loader -> matching W8A8-quantized forward."""
    from dgq_tpu.io.dgq_ckpt import load_merged

    qnn = _build_ref_qnn(seed=3, aq_leaf_param=True)
    qnn.set_quant_state(use_wq=True, use_aq=True)
    rng = np.random.RandomState(4)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    temb = rng.randn(2, 1280).astype(np.float32)
    with torch.no_grad():
        qnn.model(torch.from_numpy(x), torch.from_numpy(temb))  # lazy init
        ref_out = qnn.model(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    _promote_qparams(qnn)
    _promote_aqtizers(qnn)
    path = str(tmp_path / "cali_ckpt_activation_w4a8g1.pth")
    torch.save({"weight": qnn.state_dict(),
                "act_0": _collect_ref_act_dict(qnn)}, path)

    spec = _mini_spec()
    params, wqp, alphas, per_t, group_layers = load_merged(path, spec)
    assert "act_0" in per_t and not group_layers
    cfg = QConfig(w_bits=4, a_bits=8, use_wq=True, use_aq=True,
                  disable_out_quant=False)
    params_q = fold_weight_quant(params, wqp, spec, cfg)
    qstate = per_t["act_0"]

    from dgq_tpu.models.layers import quant_conv2d, resnet_block

    def fwd(x_nhwc, te):
        h = quant_conv2d(params_q["conv_in"], x_nhwc, "conv_in", qstate,
                         cfg, 1, 1)
        return resnet_block(params_q, "down_blocks.0.resnets.0", h, te,
                            qstate, cfg, has_shortcut=False)

    ours = fwd(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(temb))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.allclose(ours, ref_out, atol=1e-4), np.abs(ours - ref_out).max()


def test_our_act_ckpt_reference_load(tmp_path):
    """Our activation-checkpoint writer -> the reference's shape-tolerant
    act loader (calibration.py:267-291 semantics) -> same quantized
    forward."""
    from dgq_tpu.io.dgq_ckpt import save_act_ckpt
    from dgq_tpu.quant.affine import QParams as OurQP

    spec = _mini_spec()
    names = ["conv_in", "down_blocks.0.resnets.0.conv1",
             "down_blocks.0.resnets.0.time_emb_proj",
             "down_blocks.0.resnets.0.conv2"]
    rs = np.random.RandomState(5)
    qstate = {"a": {n: OurQP(jnp.asarray(rs.uniform(0.02, 0.08)),
                             jnp.asarray(float(rs.randint(100, 156))))
                    for n in names}, "sm": {}}
    path = str(tmp_path / "ours_act.pth")
    save_act_ckpt(path, {"act_0": qstate}, spec)

    qnn = _build_ref_qnn(seed=6, aq_leaf_param=True)
    qnn.set_quant_state(use_wq=False, use_aq=True)
    rng = np.random.RandomState(7)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    temb = rng.randn(2, 1280).astype(np.float32)
    with torch.no_grad():
        qnn.model(torch.from_numpy(x), torch.from_numpy(temb))  # lazy init
    _promote_aqtizers(qnn)

    # reference load_act_ckpt_with_difference_shape behavior: overwrite
    # delta/zero_point data per module path (calibration.py:280-287)
    act = torch.load(path, map_location="cpu")["act_0"]
    loaded = set()
    for name, m in qnn.named_modules():
        if f"{name}.delta" in act:
            m.delta.data = act[f"{name}.delta"].float().reshape(
                m.delta.data.shape)
            m.zero_point.data = act[f"{name}.zero_point"].float().reshape(
                m.zero_point.data.shape)
            loaded.add(name)
    assert len(loaded) == 4, loaded

    with torch.no_grad():
        ref_out = qnn.model(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    from dgq_tpu.models.layers import quant_conv2d, resnet_block

    params = {}
    sd = qnn.state_dict()
    from dgq_tpu.io.dgq_ckpt import weight_ckpt_to_params

    params, _, _ = weight_ckpt_to_params(sd, spec)
    cfg = QConfig(a_bits=8, use_wq=False, use_aq=True,
                  disable_out_quant=False)

    def fwd(x_nhwc, te):
        h = quant_conv2d(params["conv_in"], x_nhwc, "conv_in", qstate, cfg, 1, 1)
        return resnet_block(params, "down_blocks.0.resnets.0", h, te,
                            qstate, cfg, has_shortcut=False)

    ours = fwd(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(temb))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.allclose(ours, ref_out, atol=1e-4), np.abs(ours - ref_out).max()


def test_our_save_reference_load(tmp_path):
    """Our writer -> reference load_state_dict (calibration.py:245-251 flow)
    -> same quantized forward as our folded params."""
    spec = _mini_spec()
    rng = np.random.RandomState(1)

    params = {}
    for name, kind, meta in spec:
        if kind == "conv":
            cin, cout, k, _, _ = meta
            params[name] = {
                "w": jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.1),
                "b": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
            }
        elif kind == "linear":
            cin, cout, _ = meta
            params[name] = {
                "w": jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1),
                "b": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
            }
        else:
            (c,) = meta
            params[name] = {
                "scale": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
                "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
            }

    from dgq_tpu.quant.scalers import Scaler

    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    path = str(tmp_path / "ours.pth_weight_only")
    save_weight_only(path, params, wqp, spec)

    # reference side: build, lazy-init, then load our checkpoint
    qnn = _build_ref_qnn(seed=2)
    rng2 = np.random.RandomState(2)
    x = rng2.randn(2, 4, 8, 8).astype(np.float32)
    temb = rng2.randn(2, 1280).astype(np.float32)
    with torch.no_grad():
        qnn.model(torch.from_numpy(x), torch.from_numpy(temb))  # lazy init shapes
    _promote_qparams(qnn)
    ckpt = torch.load(path, map_location="cpu")
    missing, unexpected = qnn.load_state_dict(ckpt["weight"], strict=False)
    assert not unexpected, unexpected
    # aqtizer state was never initialized/saved (weight-only ckpt) — every
    # remaining missing key must be an activation quantizer's
    leftover = [k for k in missing if "aqtizer" not in k]
    assert not leftover, leftover

    with torch.no_grad():
        ref_out = qnn.model(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    cfg = QConfig(w_bits=4, use_wq=True, disable_out_quant=False)
    params_q = fold_weight_quant(params, wqp, spec, cfg)
    ours = _ours_forward(params_q, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         jnp.asarray(temb))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    # atol: the layout-aware norms use one-pass E[x^2]-E[x]^2 stats and a
    # folded x*A+B emission (models/layers.py group_norm), a ~1e-7-relative
    # reassociation vs torch's two-pass form that amplifies to ~1e-5 absolute
    # through the quantized convs of this tiny UNet
    assert np.allclose(ours, ref_out, atol=5e-5), np.abs(ours - ref_out).max()
