"""Full-model guard for the packed head-slot deploy path: the tiny SD UNet
with pack_attention_heads-transformed weights + packed_attention cfg matches
the unpacked deploy forward (drives the layers.attention gate, the pair-mode
kernel dispatch, and the packed to_out consumption inside a real model —
the attention-level tests in test_packed_attention.py don't exercise the
model wiring).

Two tolerance regimes, deliberately:
  * fp / act-quant-only forwards are float-associativity-close (~1e-6): the
    packed projection computes identical real lanes, padding lanes are
    exact zeros, and the quantizers map equal inputs to equal outputs.
  * the FULLY quantized forward (folded weights + aq) is only chaos-close:
    the packed projection's different matmul reduction order shifts values
    by ~1e-6, and any value within float error of a quantizer bin boundary
    flips a bin (one whole delta), which the quantized net then amplifies —
    the same intrinsic bin-flip noise test_full_unet_quantized_parity
    documents vs the torch reference. So the packed/unpacked error is
    asserted against the net's own chaos under a 1e-6 input perturbation,
    not against zero.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.calib.weight_calib import pack_attention_heads, quantize_model_weights
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.quant.scalers import Scaler
from dgq_tpu.utils.synthetic import synthetic_pertensor_qstate


def _patch_interpret(monkeypatch):
    import dgq_tpu.ops.pallas.attention as A

    orig = A.fused_attention

    def wrapper(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(A, "fused_attention", wrapper)


@pytest.fixture(scope="module")
def tiny():
    spec = sd_unet_spec(base=32, cross=64)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.asarray([500.0, 500.0])
    ehs = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64))
    return spec, params, x, t, ehs


@pytest.mark.parametrize("slot", [64, 128])
def test_packed_unet_fp_and_aq_exact(monkeypatch, tiny, slot):
    _patch_interpret(monkeypatch)
    spec, params, x, t, ehs = tiny
    packed = pack_attention_heads(params, spec, num_heads=8, slot=slot)

    cfg_fp = QConfig(use_pallas_attention=True)
    ref = unet_sd_apply(params, x, t, ehs, qstate=None, cfg=cfg_fp)
    out = unet_sd_apply(packed, x, t, ehs, qstate=None,
                        cfg=cfg_fp.replace(packed_attention=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=3e-5)

    cfg_aq = QConfig(a_bits=8, softmax_bits=8, use_aq=True,
                     use_pallas_attention=True)
    qstate = synthetic_pertensor_qstate(spec, 0, False, jnp.float32)
    ref = unet_sd_apply(params, x, t, ehs, qstate=qstate, cfg=cfg_aq)
    out = unet_sd_apply(packed, x, t, ehs, qstate=qstate,
                        cfg=cfg_aq.replace(packed_attention=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=3e-5)


def test_packed_unet_quantized_within_chaos(monkeypatch, tiny):
    _patch_interpret(monkeypatch)
    spec, params, x, t, ehs = tiny
    cfg = QConfig(w_bits=8, a_bits=8, softmax_bits=8, use_wq=True, use_aq=True,
                  use_pallas_attention=True)
    params_q, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
    qstate = synthetic_pertensor_qstate(spec, 0, False, jnp.float32)
    packed = pack_attention_heads(params_q, spec, num_heads=8, slot=64)

    ref = unet_sd_apply(params_q, x, t, ehs, qstate=qstate, cfg=cfg)
    out = unet_sd_apply(packed, x, t, ehs, qstate=qstate,
                        cfg=cfg.replace(packed_attention=True))
    err = float(jnp.max(jnp.abs(out - ref)))

    # the net's own sensitivity to a 1e-6 input perturbation (bin flips at
    # quantizer boundaries, amplified layer to layer)
    noise = 1e-6 * jax.random.normal(jax.random.PRNGKey(9), x.shape)
    chaos_ref = unet_sd_apply(params_q, x + noise, t, ehs, qstate=qstate,
                              cfg=cfg)
    chaos = float(jnp.max(jnp.abs(chaos_ref - ref)))
    assert err <= max(5 * chaos, 1e-4), (err, chaos)
    # and the packed output is not degenerate
    assert float(jnp.max(jnp.abs(out))) > 0.01
