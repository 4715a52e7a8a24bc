"""Fisher-weighted reconstruction: gradient capture via output injection and
the fisher_diag/fisher_full loss paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.calib.reconstruction import (
    capture_unit_grad,
    recon_units,
    reconstruct_unit,
)
from dgq_tpu.calib.weight_calib import fold_weight_quant, init_weight_qparams
from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply
from dgq_tpu.quant.scalers import Scaler

BASE, CROSS = 32, 64


@pytest.fixture(scope="module")
def tiny():
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    rng = np.random.RandomState(0)
    batch = (
        jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)),
        jnp.asarray(rng.randint(0, 1000, (2,)).astype(np.int32)),
        jnp.asarray(rng.randn(2, 77, CROSS).astype(np.float32)),
    )
    return spec, params, batch


def test_grad_capture_shape_and_nonzero(tiny):
    spec, params, batch = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    unit = "down_blocks.0.resnets.0"
    g = capture_unit_grad(params, pq, batch, unit, cfg)
    assert g.shape == (2, 16, 16, BASE)
    # |grad| + 1 >= 1 everywhere, > 1 somewhere (quantization error flows back)
    assert float(jnp.min(g)) >= 1.0
    assert float(jnp.max(g)) > 1.0


def test_grad_capture_nonzero_all_unit_kinds(tiny):
    """Every reconstruction-unit kind must receive non-trivial injection
    gradients — a discarded _rec return silently zeroes the Fisher weights
    for that unit class (transformer blocks / proj / time-embedding were
    affected: the perturbation never entered the forward graph)."""
    spec, params, batch = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    units = [
        "down_blocks.0.attentions.0.transformer_blocks.0",
        "down_blocks.0.attentions.0.proj_in",
        "down_blocks.0.attentions.0.proj_out",
        "time_embedding.linear_1",
    ]
    for unit in units:
        g = capture_unit_grad(params, pq, batch, unit, cfg)
        assert float(jnp.max(g)) > 1.0, unit


def test_fisher_reconstruction_runs(tiny):
    spec, params, batch = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    unit = next(u for u in recon_units(spec) if u.name == "down_blocks.0.resnets.0")

    from dgq_tpu.calib.reconstruction import capture_unit_io

    (ins, out) = capture_unit_io(params, batch, unit.name, cfg)
    grads = capture_unit_grad(params, pq, batch, unit.name, cfg)
    for mode in ("fisher_diag", "fisher_full"):
        alphas, losses = reconstruct_unit(
            jax.random.PRNGKey(0), unit, params, wqp, ins, out, cfg,
            iters=4, batch_size=2, opt_mode=mode, cached_grads=grads,
        )
        assert set(alphas) == set(unit.layers)
        assert np.isfinite(np.asarray(losses)).all()


def test_tib_reconstruction(tiny):
    """TFMQ temporal-information-block joint reconstruction."""
    from dgq_tpu.calib.reconstruction import make_tib_apply, reconstruct_tib, tib_unit

    spec, params, batch = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    unit = tib_unit(spec)
    # every resnet's time_emb_proj + the embedding MLP
    assert "time_embedding.linear_1" in unit.layers
    assert sum(l.endswith(".time_emb_proj") for l in unit.layers) == 22

    ts = jnp.asarray(np.arange(1, 999, 113), jnp.int32)
    alphas, losses = reconstruct_tib(
        jax.random.PRNGKey(0), params, spec, wqp, ts, cfg, iters=5, batch_size=4
    )
    assert set(alphas) == set(unit.layers)
    assert np.isfinite(np.asarray(losses)).all()

    # joint outputs: fp vs hard-adaround stay close at w4
    apply_fn = make_tib_apply(spec, cfg)
    sub = {n: params[n] for n in unit.layers}
    fp = apply_fn(sub, ts)
    pq = {n: dict(params[n]) for n in unit.layers}
    from dgq_tpu.quant.adaround import adaround_quant
    for n in unit.layers:
        pq[n]["w"] = adaround_quant(params[n]["w"], wqp[n], alphas[n], 4, soft=False)
    qq = apply_fn(pq, ts)
    rel = float(
        sum(jnp.linalg.norm(a - b) for a, b in zip(qq, fp))
        / sum(jnp.linalg.norm(b) for b in fp)
    )
    assert rel < 0.2, rel


def test_calibrate_weights_tib_mode(tiny):
    from dgq_tpu.calib.reconstruction import calibrate_weights

    spec, params, batch = tiny
    cfg = QConfig(w_bits=4, use_wq=True)
    wqp = init_weight_qparams(params, spec, 4, Scaler.MINMAX)
    alphas = calibrate_weights(
        params, spec, cfg, wqp, batch, iters=3, batch_size=2, capture_batch=2,
        asym=False, max_units=3, tib_recon=True,
    )
    # tib layers present even though max_units truncated the walk
    assert "time_embedding.linear_1" in alphas
    assert any(k.endswith(".time_emb_proj") for k in alphas)


def test_act_delta_reconstruction(tiny):
    """use_aq reconstruction branch: Adam+cosine on activation deltas."""
    from dgq_tpu.calib.reconstruction import (
        capture_unit_io,
        recon_units,
        reconstruct_unit_act_deltas,
    )
    from dgq_tpu.calib.weight_calib import fold_weight_quant
    from dgq_tpu.quant.affine import QParams

    spec, params, batch = tiny
    cfg = QConfig(w_bits=8, a_bits=8, use_wq=True, use_aq=True)
    wqp = init_weight_qparams(params, spec, 8, Scaler.MINMAX)
    pq = fold_weight_quant(params, wqp, spec, cfg)
    unit = next(u for u in recon_units(spec) if u.name == "down_blocks.0.resnets.0")
    (ins, out) = capture_unit_io(params, batch, unit.name, QConfig())
    qs_unit = {
        "a": {n: QParams(jnp.asarray(0.05), jnp.asarray(128.0)) for n in unit.layers},
        "sm": {},
    }
    qs2, losses = reconstruct_unit_act_deltas(
        jax.random.PRNGKey(0), unit, pq, qs_unit, ins, out, cfg,
        iters=8, batch_size=2,
    )
    assert np.isfinite(np.asarray(losses)).all()
    # deltas moved
    moved = any(
        not np.allclose(np.asarray(qs2["a"][n].delta), 0.05) for n in unit.layers
    )
    assert moved
