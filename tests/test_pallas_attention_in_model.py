"""The Pallas-attention model path matches the XLA softmax path numerically
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.models.layers import attention
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.quant.affine import QParams


@pytest.fixture()
def attn_setup():
    rng = np.random.RandomState(0)
    c, heads = 64, 8
    p = {}
    for nm in ("a.to_q", "a.to_k", "a.to_v", "a.to_out.0"):
        p[nm] = {
            "w": jnp.asarray(rng.randn(c, c).astype(np.float32) / 8),
            "b": jnp.zeros((c,)) if nm == "a.to_out.0" else None,
        }
    x = jnp.asarray(rng.randn(2, 16, c).astype(np.float32))
    ehs = jnp.asarray(rng.randn(2, 77, c).astype(np.float32))
    return p, x, ehs, heads


def _patch_interpret(monkeypatch):
    """Force interpret mode inside the model's kernel call (CPU tests)."""
    import dgq_tpu.ops.pallas.attention as A

    orig = A.fused_attention

    def wrapper(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(A, "fused_attention", wrapper)


def test_fp_path_matches(attn_setup, monkeypatch):
    _patch_interpret(monkeypatch)
    p, x, ehs, heads = attn_setup
    ref = attention(p, "a", x, ehs, heads, None, QConfig())
    out = attention(p, "a", x, ehs, heads, None, QConfig(use_pallas_attention=True))
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_quantized_realtime_path_matches(attn_setup, monkeypatch):
    _patch_interpret(monkeypatch)
    p, x, ehs, heads = attn_setup
    cfg = QConfig(use_aq=True, a_bits=8, softmax_bits=8,
                  t2i_log_quant=True, t2i_real_time=True)
    qp = QParams(jnp.asarray(0.05), jnp.asarray(128.0))
    qstate = {"a": {f"a.aqtizer_{s}": qp for s in "qkv"}, "sm": {}}
    ref = attention(p, "a", x, ehs, heads, qstate, cfg, start_peak=True)
    cfg2 = cfg.replace(use_pallas_attention=True)
    out = attention(p, "a", x, ehs, heads, qstate, cfg2, start_peak=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_pallas_path_publishes_softmax_tap(attn_setup, monkeypatch):
    """Calibrating with --pallas_attn must still see the aqtizer_w point: the
    fused kernel never materializes the softmax, so the tap is published from
    a trace-time-gated recompute (otherwise softmax quantizers silently
    vanish from activation checkpoints)."""
    _patch_interpret(monkeypatch)
    from dgq_tpu.models.qconfig import collect_act_taps

    p, x, ehs, heads = attn_setup
    cfg = QConfig(use_pallas_attention=True)
    taps: dict = {}
    with collect_act_taps(taps):
        attention(p, "a", x, ehs, heads, None, cfg)
    assert "a.aqtizer_w" in taps
    # the tap is the true post-softmax tensor (matches the XLA path's tap)
    taps_ref: dict = {}
    with collect_act_taps(taps_ref):
        attention(p, "a", x, ehs, heads, None, QConfig())
    assert np.allclose(np.asarray(taps["a.aqtizer_w"]),
                       np.asarray(taps_ref["a.aqtizer_w"]), atol=1e-5)


def test_log_max_1_quantizes_without_calibrated_delta(attn_setup, monkeypatch):
    """log_max_1 pins the log2 delta to 1 (reference quant_layer_text.py:90):
    with NO calibrated 'sm' state the XLA path must still quantize — and
    match the Pallas path, which always used ones(())."""
    _patch_interpret(monkeypatch)
    p, x, ehs, heads = attn_setup
    qstate = {"a": {}, "sm": {}}
    cfg = QConfig(use_aq=True, t2i_log_quant=True, log_max_1=True,
                  softmax_bits=8)
    out_xla = attention(p, "a", x, ehs, heads, qstate, cfg)
    out_fp = attention(p, "a", x, ehs, heads, qstate,
                       QConfig(use_aq=False))
    # quantization must actually happen (≠ fp), and both deploy modes agree
    assert not np.allclose(np.asarray(out_xla), np.asarray(out_fp), atol=1e-5)
    out_pl = attention(p, "a", x, ehs, heads, qstate,
                       cfg.replace(use_pallas_attention=True))
    assert np.allclose(np.asarray(out_xla), np.asarray(out_pl), atol=2e-3), \
        np.abs(np.asarray(out_xla) - np.asarray(out_pl)).max()
