"""Stepwise parity vs the vendored diffusers 0.26.0 schedulers.

The reference's quality numbers hinge on exact scheduler behavior — PNDM's
ets/bump logic especially (/root/reference/diffusers/src/diffusers/schedulers/
scheduling_pndm.py:306-429). These tests drive the actual vendored scheduler
classes and our scan-form reimplementations with the same synthetic eps
function and assert trajectory equality.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from dgq_tpu.pipeline import schedulers as sch

REF_DIFFUSERS = "/root/reference/diffusers/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIFFUSERS), reason="reference diffusers not mounted"
)


@pytest.fixture(scope="module")
def ref_schedulers():
    import huggingface_hub

    # vendored fork predates huggingface_hub 0.20's removal of cached_download
    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if REF_DIFFUSERS not in sys.path:
        sys.path.insert(0, REF_DIFFUSERS)
    shim = sys.modules.get("diffusers")
    if shim is not None and not hasattr(shim, "__path__"):
        # tests/ref_shim.py's minimal stand-in (a plain module, not a
        # package) is installed by the UNet-parity tests; drop it so the
        # real vendored package can load. Already-imported consumers keep
        # their shim references; install_diffusers_shim() no-ops afterwards.
        for k in [k for k in sys.modules
                  if k == "diffusers" or k.startswith("diffusers.")]:
            del sys.modules[k]
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler
    from diffusers.schedulers.scheduling_euler_discrete import (
        EulerDiscreteScheduler,
    )
    from diffusers.schedulers.scheduling_pndm import PNDMScheduler

    return PNDMScheduler, DDIMScheduler, EulerDiscreteScheduler


SD_KW = dict(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")


def synth_eps(x: np.ndarray, t: float) -> np.ndarray:
    """Deterministic pseudo-UNet: state- and t-dependent, scheduler-agnostic."""
    return 0.3 * x + np.sin(float(t) / 100.0) * (1.0 + 0.01 * x * x)


@pytest.mark.parametrize("steps", [25, 50])
def test_pndm_plms_parity(ref_schedulers, steps):
    import torch

    PNDMScheduler, _, _ = ref_schedulers
    ref = PNDMScheduler(skip_prk_steps=True, steps_offset=1, **SD_KW)
    ref.set_timesteps(steps)

    consts = sch.make_pndm(steps)
    assert np.array_equal(np.asarray(consts.timesteps), ref.timesteps.numpy()), (
        "UNet-call timestep sequence must match diffusers plms_timesteps"
    )

    rng = np.random.RandomState(0)
    x0 = rng.randn(1, 4, 8, 8).astype(np.float32)

    # reference loop
    x_ref = torch.from_numpy(x0.copy())
    for t in ref.timesteps:
        eps = torch.from_numpy(synth_eps(x_ref.numpy(), float(t)))
        x_ref = ref.step(eps, t, x_ref).prev_sample
    x_ref = x_ref.numpy()

    # our loop (host-side python to feed the same synthetic eps)
    x = jnp.asarray(x0.copy())
    state = sch.pndm_init_state(x)
    for i in range(len(np.asarray(consts.timesteps))):
        t = float(np.asarray(consts.timesteps)[i])
        eps = jnp.asarray(synth_eps(np.asarray(x), t))
        state, x = sch.pndm_plms_step(
            state, jnp.asarray(i), x, eps,
            consts.alpha_t[i], consts.alpha_prev[i],
        )
    assert np.allclose(np.asarray(x), x_ref, atol=1e-4), (
        np.abs(np.asarray(x) - x_ref).max()
    )


@pytest.mark.parametrize("steps", [25, 50])
def test_ddim_parity(ref_schedulers, steps):
    import torch

    _, DDIMScheduler, _ = ref_schedulers
    # SD v1.4 scheduler config: clip_sample=False, set_alpha_to_one=False
    ref = DDIMScheduler(steps_offset=1, clip_sample=False,
                        set_alpha_to_one=False, **SD_KW)
    ref.set_timesteps(steps)

    consts = sch.make_ddim(steps)
    assert np.array_equal(np.asarray(consts.timesteps), ref.timesteps.numpy())

    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 4, 8, 8).astype(np.float32)

    x_ref = torch.from_numpy(x0.copy())
    for t in ref.timesteps:
        eps = torch.from_numpy(synth_eps(x_ref.numpy(), float(t)))
        x_ref = ref.step(eps, t, x_ref).prev_sample
    x_ref = x_ref.numpy()

    x = jnp.asarray(x0.copy())
    for i in range(steps):
        t = float(np.asarray(consts.timesteps)[i])
        eps = jnp.asarray(synth_eps(np.asarray(x), t))
        x = sch.ddim_step(x, eps, consts.alpha_t[i], consts.alpha_prev[i])
    assert np.allclose(np.asarray(x), x_ref, atol=1e-4), (
        np.abs(np.asarray(x) - x_ref).max()
    )


@pytest.mark.parametrize("steps", [1, 4])
def test_euler_trailing_parity(ref_schedulers, steps):
    import torch

    _, _, EulerDiscreteScheduler = ref_schedulers
    ref = EulerDiscreteScheduler(timestep_spacing="trailing", **SD_KW)
    ref.set_timesteps(steps)

    consts = sch.make_euler(steps)
    assert np.allclose(np.asarray(consts.timesteps), ref.timesteps.numpy())
    assert np.allclose(np.asarray(consts.sigmas), ref.sigmas.numpy(), atol=1e-6)

    rng = np.random.RandomState(2)
    noise = rng.randn(1, 4, 8, 8).astype(np.float32)

    # reference: init_noise_sigma scaling + scale_model_input before the UNet
    x_ref = torch.from_numpy(noise.copy()) * ref.init_noise_sigma
    for t in ref.timesteps:
        x_in = ref.scale_model_input(x_ref, t)
        eps = torch.from_numpy(synth_eps(x_in.numpy(), float(t)))
        x_ref = ref.step(eps, t, x_ref).prev_sample
    x_ref = x_ref.numpy()

    sigmas = np.asarray(consts.sigmas)
    x = jnp.asarray(noise.copy()) * sigmas[0]
    for i in range(steps):
        t = float(np.asarray(consts.timesteps)[i])
        x_in = sch.euler_scale_model_input(x, sigmas[i])
        eps = jnp.asarray(synth_eps(np.asarray(x_in), t))
        x = sch.euler_step(x, eps, sigmas[i], sigmas[i + 1])
    assert np.allclose(np.asarray(x), x_ref, atol=1e-4), (
        np.abs(np.asarray(x) - x_ref).max()
    )
