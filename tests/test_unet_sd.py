"""SD UNet structural tests + numerical parity vs the reference torch blocks."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.layers import (
    group_norm,
    layer_norm,
    resnet_block,
    basic_transformer_block,
    timestep_embedding,
    unfold_nhwc,
)
from dgq_tpu.models.unet_sd import (
    init_unet_sd,
    sd_unet_spec,
    quantizable_layers,
    unet_sd_apply,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "diffusers_rewrite"))


def test_spec_counts():
    spec = sd_unet_spec()
    names = [n for n, _, _ in spec]
    assert len(names) == len(set(names))
    qls = quantizable_layers(spec)
    # reference wraps every Conv2d/Linear; the SD v1.4 rewritten UNet has 282
    # (verified against the reference model's module count)
    assert len(qls) == 282, len(qls)


def test_param_count_matches_sd14():
    n = 0
    for name, kind, meta in sd_unet_spec():
        if kind == "conv":
            cin, cout, k, _, _ = meta
            n += cin * cout * k * k + cout
        elif kind == "linear":
            cin, cout, bias = meta
            n += cin * cout + (cout if bias else 0)
        else:
            (c,) = meta
            n += 2 * c
    # reference SD v1.4 UNet: 859.52M parameters (counted from the torch model)
    assert n == 859_520_964, n


def test_unet_forward_tiny_shapes():
    # full architecture at a reduced latent size (UNet is fully convolutional)
    key = jax.random.PRNGKey(0)
    params = init_unet_sd(key)
    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 4))
    t = jnp.asarray([500], jnp.int32)
    ehs = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768))
    out = unet_sd_apply(params, sample, t, ehs)
    assert out.shape == (1, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
class TestBlockParity:
    def setup_method(self):
        import torch  # noqa
        from ref_shim import install_diffusers_shim

        install_diffusers_shim()
        if REF not in sys.path:
            sys.path.insert(0, REF)
        os.environ["DIFFUSERS_REWRITE"] = "sd"

    def test_timesteps_parity(self):
        import torch
        from diffusers_rewrite.sd import Timesteps

        t = np.asarray([1, 250, 999], np.float32)
        ref = Timesteps(320)(torch.from_numpy(t)).numpy()
        ours = np.asarray(timestep_embedding(jnp.asarray(t), 320))
        # f32 trig at ~1000 rad: XLA vs libm differ ~1e-4 even after range
        # reduction; well under quantization noise.
        assert np.allclose(ours, ref, atol=5e-4)

    def test_groupnorm_parity(self):
        import torch

        rng = np.random.RandomState(0)
        x = rng.randn(2, 64, 8, 8).astype(np.float32)  # NCHW
        gn = torch.nn.GroupNorm(32, 64, eps=1e-5)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(rng.randn(64).astype(np.float32)))
            gn.bias.copy_(torch.from_numpy(rng.randn(64).astype(np.float32)))
            ref = gn(torch.from_numpy(x)).numpy()
        p = {"scale": jnp.asarray(gn.weight.detach().numpy()),
             "bias": jnp.asarray(gn.bias.detach().numpy())}
        ours = group_norm(p, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        assert np.allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, atol=1e-4)

    def test_unfold_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(1)
        x = rng.randn(2, 5, 9, 9).astype(np.float32)  # NCHW
        for k, s, pad in [(3, 1, 1), (3, 2, 1), (1, 1, 0)]:
            ref = F.unfold(torch.from_numpy(x), kernel_size=k, stride=s, padding=pad).numpy()
            ours = np.asarray(
                unfold_nhwc(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), k, k, s, pad)
            )
            assert ours.shape == ref.shape
            assert np.allclose(ours, ref, atol=1e-6), (k, s, pad)

    def _convert_resnet(self, ref, prefix):
        from dgq_tpu.io.convert import conv_w_to_jax, linear_w_to_jax

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        p = {}
        for tname, ours_kind in [
            ("norm1", "norm"), ("conv1", "conv"), ("time_emb_proj", "linear"),
            ("norm2", "norm"), ("conv2", "conv"), ("conv_shortcut", "conv"),
        ]:
            if f"{tname}.weight" not in sd:
                continue
            w = sd[f"{tname}.weight"]
            if ours_kind == "conv":
                p[f"{prefix}.{tname}"] = {"w": conv_w_to_jax(w), "b": jnp.asarray(sd[f"{tname}.bias"])}
            elif ours_kind == "linear":
                p[f"{prefix}.{tname}"] = {"w": linear_w_to_jax(w), "b": jnp.asarray(sd[f"{tname}.bias"])}
            else:
                p[f"{prefix}.{tname}"] = {"scale": jnp.asarray(w), "bias": jnp.asarray(sd[f"{tname}.bias"])}
        return p

    def test_resnet_block_parity(self):
        import torch
        from diffusers_rewrite.sd import ResnetBlock2D

        torch.manual_seed(0)
        ref = ResnetBlock2D(64, 128, conv_shortcut=True).eval()
        rng = np.random.RandomState(2)
        x = rng.randn(2, 64, 8, 8).astype(np.float32)
        temb = rng.randn(2, 1280).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

        p = self._convert_resnet(ref, "rb")
        ours = resnet_block(
            p, "rb", jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(temb), None, QConfig(), has_shortcut=True,
        )
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        assert np.allclose(ours, ref_out, atol=2e-4), np.abs(ours - ref_out).max()

    def test_transformer_block_parity(self):
        import torch
        from diffusers_rewrite.sd import BasicTransformerBlock
        from dgq_tpu.io.convert import linear_w_to_jax

        torch.manual_seed(1)
        ref = BasicTransformerBlock(64).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        p = {}
        for k in list(sd):
            if not k.endswith(".weight"):
                continue
            base = k[: -len(".weight")]
            b = sd.get(f"{base}.bias")
            if "norm" in base:
                p[f"tb.{base}"] = {"scale": jnp.asarray(sd[k]), "bias": jnp.asarray(b)}
            else:
                p[f"tb.{base}"] = {
                    "w": linear_w_to_jax(sd[k]),
                    "b": jnp.asarray(b) if b is not None else None,
                }
        # reference names to_out.0 via ModuleList; ours expects attnX.to_out.0
        rng = np.random.RandomState(3)
        x = rng.randn(2, 16, 64).astype(np.float32)
        ehs = rng.randn(2, 77, 768).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs)).numpy()
        ours = basic_transformer_block(
            p, "tb", jnp.asarray(x), jnp.asarray(ehs), 8, None, QConfig()
        )
        assert np.allclose(np.asarray(ours), ref_out, atol=2e-4), np.abs(np.asarray(ours) - ref_out).max()


@pytest.mark.skipif(
    not (HAS_REF and os.environ.get("RUN_SLOW")), reason="slow; set RUN_SLOW=1"
)
def test_full_unet_parity():
    """Full SD v1.4 UNet, random torch init, converted to JAX: outputs match."""
    import torch
    from ref_shim import install_diffusers_shim

    install_diffusers_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    os.environ["DIFFUSERS_REWRITE"] = "sd"
    from diffusers_rewrite.sd import UNet2DConditionModel
    from dgq_tpu.io.convert import torch_unet_to_params

    torch.manual_seed(0)
    ref = UNet2DConditionModel().eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_unet_to_params(state, sd_unet_spec())

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 64, 64).astype(np.float32)
    t = np.asarray([500], np.int64)
    ehs = rng.randn(1, 77, 768).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs))[0].numpy()
    ours = unet_sd_apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t), jnp.asarray(ehs)
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.allclose(ours, ref_out, atol=5e-3), np.abs(ours - ref_out).max()


@pytest.mark.skipif(
    not (HAS_REF and os.environ.get("RUN_SLOW")), reason="slow; set RUN_SLOW=1"
)
def test_full_unet_quantized_parity(tmp_path):
    """Full-width W4A8 QUANTIZED forward equivalence vs the reference's own
    QuantModel: identical random weights, the reference's checkpoint (saved
    by its code path), and the reference's lazy-init activation scales loaded
    through our act-dict reader. Prints the max abs error for the record.

    This is the strongest weight-free quality proxy: every quantizer
    (282 wqtizers, all aqtizers incl. attention q/k/v and the uniform
    softmax aqtizer_w) active at real model width."""
    import torch
    from ref_shim import install_diffusers_shim

    install_diffusers_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    os.environ["DIFFUSERS_REWRITE"] = "sd"
    from diffusers_rewrite.sd import UNet2DConditionModel
    from quant.quant_model import QuantModel
    from quant.quant_layer import UniformAffineQuantizer

    from dgq_tpu.calib.weight_calib import fold_weight_quant
    from dgq_tpu.io.dgq_ckpt import act_dict_to_qstate, load_weight_only

    torch.manual_seed(0)
    ref = UNet2DConditionModel().eval()
    wq_params = {"bits": 4, "channel_wise": True, "leaf_param": True}
    aq_params = {"bits": 8, "channel_wise": False, "leaf_param": True}
    softmax_aq_params = {"softmax_a_bit": 8, "t2i_log_quant": False,
                         "t2i_real_time": False, "t2i_start_peak": False,
                         "log_max_1": False}
    qnn = QuantModel(ref, wq_params, aq_params, softmax_aq_params).eval()
    qnn.set_quant_state(use_wq=True, use_aq=True)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 64, 64).astype(np.float32)
    t = np.asarray([500], np.int64)
    ehs = rng.randn(1, 77, 768).astype(np.float32)
    tx, tt, te = (torch.from_numpy(x), torch.from_numpy(t),
                  torch.from_numpy(ehs))
    with torch.no_grad():
        qnn.model(tx, tt, te)  # lazy init of every w/a quantizer
    qnn.disable_out_quantization()
    with torch.no_grad():
        ref_out = qnn.model(tx, tt, te)[0].numpy()
        # intrinsic chaos bound: a quantized net amplifies any numeric
        # difference through round() bin flips, so the reference's own
        # output under a 1e-6 input perturbation sets the scale any
        # cross-implementation comparison can meaningfully achieve
        # (measured: max ~0.056, mean ~0.011 — v5e round-3 log)
        ref_pert = qnn.model(torch.from_numpy(x + 1e-6), tt, te)[0].numpy()
    chaos = np.abs(ref_out - ref_pert)

    # save the weight ckpt exactly as cali_model does (delta/zp promoted)
    for m in qnn.modules():
        if isinstance(m, UniformAffineQuantizer) and m.delta is not None:
            if not torch.is_tensor(m.zero_point):
                m.zero_point = torch.nn.Parameter(
                    torch.tensor(float(m.zero_point)))
            elif not isinstance(m.zero_point, torch.nn.Parameter):
                m.zero_point = torch.nn.Parameter(m.zero_point)
            if not isinstance(m.delta, torch.nn.Parameter):
                m.delta = torch.nn.Parameter(m.delta)
    path = str(tmp_path / "cali_ckpt.pth_weight_only")
    torch.save({"weight": qnn.state_dict()}, path)

    # collect the lazy-init activation scales the reference way
    # (calibration_group_quantization.py:102-107)
    act = {}
    for name, m in qnn.model.named_modules():
        if "aqtizer" in name and len(list(m.cpu().state_dict().keys())) == 2:
            sd = m.cpu().state_dict()
            act[f"model.{name}.delta"] = sd["delta"]
            act[f"model.{name}.zero_point"] = sd["zero_point"]

    spec = sd_unet_spec()
    params, wqp, alphas = load_weight_only(path, spec)
    from dgq_tpu.models.qconfig import QConfig

    cfg = QConfig(w_bits=4, a_bits=8, softmax_bits=8,
                  use_wq=True, use_aq=True)
    params_q = fold_weight_quant(params, wqp, spec, cfg,
                                 alphas=alphas or None, soft=False)
    qstate, group_layers = act_dict_to_qstate(
        {k: v.numpy() for k, v in act.items()}, spec)
    assert group_layers == ()

    ours = unet_sd_apply(
        params_q, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t), jnp.asarray(ehs), qstate=qstate, cfg=cfg,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    d = np.abs(ours - ref_out)
    print(f"\nfull-width W4A8 quantized-forward: ours-vs-ref "
          f"max={d.max():.3e} mean={d.mean():.3e}; reference self-chaos "
          f"(1e-6 perturb) max={chaos.max():.3e} mean={chaos.mean():.3e}")
    # equivalence claim: we are as close to the reference as the reference
    # is to itself under a 1e-6 input perturbation (both ~0.06 max / 0.011
    # mean on this seed), i.e. within quantization-chaos noise
    assert d.mean() < 2.0 * max(chaos.mean(), 1e-3), (d.mean(), chaos.mean())
    assert d.max() < 2.0 * max(chaos.max(), 1e-2), (d.max(), chaos.max())


@pytest.mark.skipif(
    not (HAS_REF and os.environ.get("RUN_SLOW")), reason="slow; set RUN_SLOW=1"
)
def test_full_unet_flagship_quantized_parity(tmp_path):
    """Full-width parity in the FLAGSHIP configuration the paper's headline
    results use (reference scripts/quantize_act.sh:16-25): g=8 group
    activation quantization, per-timestep (time-aware) qstate selection,
    t2i_log_quant + t2i_real_time + t2i_start_peak softmax handling, and the
    fused Pallas attention kernel — vs the reference's own QuantModel
    carrying the identical checkpoint state. Chaos-bound equivalence as in
    test_full_unet_quantized_parity."""
    import torch
    from ref_shim import install_diffusers_shim

    install_diffusers_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    os.environ["DIFFUSERS_REWRITE"] = "sd"
    from diffusers_rewrite.sd import UNet2DConditionModel
    from quant.quant_layer import UniformAffineQuantizer
    from quant.quant_model import QuantModel

    from dgq_tpu.calib.act_calib import stack_time_qstates
    from dgq_tpu.calib.weight_calib import fold_weight_quant
    from dgq_tpu.io.dgq_ckpt import act_dict_to_qstate, load_weight_only
    from dgq_tpu.pipeline.sampler import select_time_qstate

    torch.manual_seed(0)
    ref = UNet2DConditionModel().eval()
    wq_params = {"bits": 4, "channel_wise": True, "leaf_param": True}
    aq_params = {"bits": 8, "channel_wise": False, "leaf_param": True}
    softmax_aq_params = {"softmax_a_bit": 8, "t2i_log_quant": True,
                         "t2i_real_time": True, "t2i_start_peak": True,
                         "log_max_1": False}
    qnn = QuantModel(ref, wq_params, aq_params, softmax_aq_params).eval()
    qnn.set_quant_state(use_wq=True, use_aq=True)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 64, 64).astype(np.float32)
    t = np.asarray([500], np.int64)
    ehs = rng.randn(1, 77, 768).astype(np.float32)
    tx, tt, te = (torch.from_numpy(x), torch.from_numpy(t),
                  torch.from_numpy(ehs))
    with torch.no_grad():
        qnn.model(tx, tt, te)  # lazy init (real_time softmax stays dynamic)
    qnn.disable_out_quantization()
    # DGQ g=8 group calibration, the reference flow
    # (calibration_group_quantization.py:78-101): record per-axis stats on
    # the im2col-unfolded conv inputs, then k-means into 8 groups
    qnn.set_group_num(8)
    with torch.no_grad():
        qnn.model(tx, tt, te)
    qnn.done_group_num(8, mode="minmax")
    with torch.no_grad():
        ref_out = qnn.model(tx, tt, te)[0].numpy()
        ref_pert = qnn.model(torch.from_numpy(x + 1e-6), tt, te)[0].numpy()
    chaos = np.abs(ref_out - ref_pert)

    for m in qnn.modules():
        if isinstance(m, UniformAffineQuantizer) and m.delta is not None:
            if not torch.is_tensor(m.zero_point):
                m.zero_point = torch.nn.Parameter(
                    torch.tensor(float(m.zero_point)))
            elif not isinstance(m.zero_point, torch.nn.Parameter):
                m.zero_point = torch.nn.Parameter(m.zero_point)
            if not isinstance(m.delta, torch.nn.Parameter):
                m.delta = torch.nn.Parameter(m.delta)
    path = str(tmp_path / "cali_ckpt.pth_weight_only")
    torch.save({"weight": qnn.state_dict()}, path)

    act = {}
    for name, m in qnn.model.named_modules():
        if "aqtizer" in name and len(list(m.cpu().state_dict().keys())) == 2:
            sd = m.cpu().state_dict()
            act[f"model.{name}.delta"] = sd["delta"]
            act[f"model.{name}.zero_point"] = sd["zero_point"]

    spec = sd_unet_spec()
    params, wqp, alphas = load_weight_only(path, spec)
    qstate, group_layers = act_dict_to_qstate(
        {k: v.numpy() for k, v in act.items()}, spec)
    assert group_layers, "g=8 must produce group conv layers"

    cfg = QConfig(w_bits=4, a_bits=8, softmax_bits=8,
                  use_wq=True, use_aq=True,
                  t2i_log_quant=True, t2i_real_time=True, t2i_start_peak=True,
                  group_conv_layers=group_layers, group_conv_impl="taps",
                  use_pallas_attention=True)
    params_q = fold_weight_quant(params, wqp, spec, cfg,
                                 alphas=alphas or None, soft=False)

    # time-aware: slot 0 holds deliberately-wrong scales (2x deltas), slot 1
    # the real ones; t=500 at 2 steps selects slot (1000-500)//500 = 1
    # through the sampler's own selection helper — parity holding proves the
    # [T]-stacked selection picks the right slot at full width
    qstate_bad = jax.tree.map(lambda v: v * 2.0, qstate)
    stacked = stack_time_qstates({"act_0": qstate_bad, "act_1": qstate})
    qs_sel = select_time_qstate(stacked, jnp.asarray(500), 2)

    ours = unet_sd_apply(
        params_q, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(t), jnp.asarray(ehs), qstate=qs_sel, cfg=cfg,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    d = np.abs(ours - ref_out)
    print(f"\nfull-width FLAGSHIP (g=8, time-aware, t2i tricks, pallas "
          f"attention) quantized-forward: ours-vs-ref max={d.max():.3e} "
          f"mean={d.mean():.3e}; reference self-chaos max={chaos.max():.3e} "
          f"mean={chaos.mean():.3e}")
    assert d.mean() < 2.0 * max(chaos.mean(), 1e-3), (d.mean(), chaos.mean())
    assert d.max() < 2.0 * max(chaos.max(), 1e-2), (d.max(), chaos.max())
