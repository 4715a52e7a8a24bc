"""Calibration data generation: timestep ordering, CFG doubling, caching."""
import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.calib.data import generate_sd_cali_data, synthetic_prompt_embeddings
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec

BASE, CROSS = 32, 64


def test_cali_data_layout(tmp_path):
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    n_prompts = 3
    steps = 2
    text, uncond = synthetic_prompt_embeddings(n_prompts, dim=CROSS, seed=0)
    cache = str(tmp_path / "cali.npz")
    (lmi, t, ehs), interval = generate_sd_cali_data(
        params, text, uncond, steps=steps, scheduler="pndm", latent_hw=16,
        seed=0, cache_path=cache, batch_size=2,
    )
    # PNDM/PLMS runs steps+1 UNet calls; each chunk holds every prompt
    # CFG-doubled (interval = 2 * n_prompts, dataset_generation.py:151-154)
    assert interval == 2 * n_prompts
    n_calls = steps + 1
    assert lmi.shape == (n_calls * interval, 16, 16, 4)
    assert t.shape == (n_calls * interval,)
    assert ehs.shape == (n_calls * interval, 77, CROSS)

    # within a chunk the timestep is constant; chunks are distinct for the
    # non-repeated calls (PLMS repeats the second timestep)
    tn = np.asarray(t)
    for c in range(n_calls):
        chunk = tn[c * interval : (c + 1) * interval]
        assert (chunk == chunk[0]).all()
    assert tn[0] != tn[-1]

    # ehs rows align with their latents: per prompt batch the CFG layout is
    # [uncond_batch | text_batch] (batch_size=2 -> segments [u0,u1,t0,t1,u2,t2])
    e0 = np.asarray(ehs[:interval])
    expect = np.concatenate([
        np.asarray(uncond[:2]), np.asarray(text[:2]),
        np.asarray(uncond[2:]), np.asarray(text[2:]),
    ])
    assert np.allclose(e0, expect, atol=1e-6)

    # cache round-trip is exact
    (lmi2, t2, ehs2), interval2 = generate_sd_cali_data(
        params, text, uncond, steps=steps, scheduler="pndm", latent_hw=16,
        seed=0, cache_path=cache,
    )
    assert interval2 == interval
    assert np.allclose(np.asarray(lmi), np.asarray(lmi2))
    assert np.array_equal(np.asarray(t), np.asarray(t2))


def test_cali_lmi_is_cfg_doubled_latents(tmp_path):
    """The captured latent_model_input is the CFG-doubled latents fed to the
    UNet (first half == second half at each call, since CFG duplicates)."""
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    text, uncond = synthetic_prompt_embeddings(2, dim=CROSS, seed=1)
    (lmi, t, ehs), interval = generate_sd_cali_data(
        params, text, uncond, steps=2, scheduler="ddim", latent_hw=16, seed=1,
    )
    chunk = np.asarray(lmi[:interval])
    assert np.allclose(chunk[:2], chunk[2:], atol=1e-6)


def test_cache_key_covers_weight_source(tmp_path):
    """The CLI-facing cache key is derived inside build_cali_data from the
    actual generation inputs, including a content fingerprint of the weights:
    two different weight sets with identical flags must NOT share a cache
    file (stale-cache reuse across --unet_weights / --cali_ckpt sources)."""
    from dgq_tpu.cli.common import _params_fingerprint, build_cali_data
    from dgq_tpu.models.unet_sd import unet_sd_apply

    spec = sd_unet_spec(base=BASE, cross=CROSS)
    p0 = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    p1 = init_unet_sd(jax.random.PRNGKey(1), spec=spec)
    f0, f1 = _params_fingerprint(p0), _params_fingerprint(p1)
    assert f0 != f1
    assert f0 == _params_fingerprint(p0)  # deterministic

    prefix = str(tmp_path / "cali")
    # steps=2 so later chunks carry weight-dependent latents (the steps=1
    # capture is just the initial noise, identical for any weights)
    kwargs = dict(n_prompts=2, steps=2, latent_hw=16, seed=0,
                  cache_prefix=prefix)
    (lmi0, *_), _ = build_cali_data("sd", p0, unet_sd_apply, CROSS, **kwargs)
    (lmi1, *_), _ = build_cali_data("sd", p1, unet_sd_apply, CROSS, **kwargs)
    import glob

    files = sorted(glob.glob(prefix + "*"))
    assert len(files) == 2, files  # one cache per weight set
    assert not np.allclose(np.asarray(lmi0), np.asarray(lmi1))
