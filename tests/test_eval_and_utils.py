"""Eval-harness math and utility tests (no pretrained weights needed)."""
import numpy as np
import pytest

from dgq_tpu.eval.scores import (
    frechet_distance,
    gaussian_stats,
    inception_score,
    resize_images_256,
)
from dgq_tpu.parallel.mesh import shard_prompts
from dgq_tpu.utils.flops import bops, spec_cost


def test_fid_zero_for_identical_stats():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, sigma = gaussian_stats(f)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_fid_increases_with_mean_shift():
    rng = np.random.RandomState(1)
    f1 = rng.randn(500, 8)
    f2 = rng.randn(500, 8) + 1.0
    f3 = rng.randn(500, 8) + 3.0
    m1, s1 = gaussian_stats(f1)
    d2 = frechet_distance(*gaussian_stats(f2), m1, s1)
    d3 = frechet_distance(*gaussian_stats(f3), m1, s1)
    assert 0 < d2 < d3
    # mean shift of c in D dims contributes ~ c^2 * D
    assert abs(d2 - 8.0) < 2.0


def test_inception_score_bounds():
    rng = np.random.RandomState(2)
    # confident, diverse predictions -> high IS
    n, c = 1000, 10
    confident = np.full((n, c), 1e-6)
    confident[np.arange(n), rng.randint(0, c, n)] = 1.0
    confident /= confident.sum(1, keepdims=True)
    hi, _ = inception_score(confident)
    # uniform predictions -> IS ~ 1
    uniform = np.full((n, c), 1.0 / c)
    lo, _ = inception_score(uniform)
    assert lo == pytest.approx(1.0, abs=1e-3)
    assert hi > 5.0


def test_resize_256():
    imgs = np.zeros((2, 512, 512, 3), np.uint8)
    out = resize_images_256(imgs)
    assert out.shape == (2, 256, 256, 3)


def test_shard_prompts_partition():
    prompts = [str(i) for i in range(10)]
    got = []
    for r in range(3):
        got += shard_prompts(prompts, r, 3)
    assert got == prompts


def test_spec_cost_sd14_scale():
    from dgq_tpu.models.unet_sd import sd_unet_spec

    cost = spec_cost(sd_unet_spec(), latent_hw=64)
    assert cost["params"] == 859_520_964
    # SD v1.4 UNet at 512px is ~340 GMACs / ~680 GFLOPs per forward
    assert 250e9 < cost["macs"] < 450e9, cost["macs"] / 1e9
    assert bops(cost["macs"], 4, 8) == cost["macs"] * 32


def test_spec_roofline_sd14():
    """Speed-of-light model: per-scale breakdown covers the four SD levels,
    the SOL time dominates both single-resource bounds (it sums per-layer
    maxima), and the lane-padding tax makes narrow heads strictly slower."""
    from dgq_tpu.models.unet_sd import sd_unet_spec
    from dgq_tpu.utils.flops import spec_roofline

    spec = sd_unet_spec()
    r = spec_roofline(spec, latent_hw=64, batch=8)
    assert set(r["per_scale"]) == {64, 32, 16, 8}
    assert r["sol_s"] >= r["compute_s"] > 0
    assert r["sol_s"] >= r["memory_s"] > 0
    assert abs(sum(lv["sol_s"] for lv in r["per_scale"].values())
               - r["sol_s"]) < 1e-9
    # v5e sanity: one batch-8 forward SOL sits between the pure-compute
    # bound and the measured 80.8 ms fp floor
    assert 0.02 < r["sol_s"] < 0.0808
    no_pad = spec_roofline(spec, latent_hw=64, batch=8, mxu_lane=1)
    assert no_pad["compute_s"] < r["compute_s"]
