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
