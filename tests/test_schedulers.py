"""Scheduler tests: perfect-oracle consistency and structural checks.

With an oracle model that predicts eps consistent with a fixed clean latent
x0 (eps = (x - sqrt(a)x0)/sqrt(1-a)), any valid eps-prediction sampler must
return exactly x0 when alpha_prev reaches 1 (DDIM/PNDM) or sigma reaches 0
(Euler). This pins the update algebra without needing diffusers installed.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.pipeline.schedulers import (
    ddim_step,
    euler_scale_model_input,
    euler_step,
    make_ddim,
    make_euler,
    make_pndm,
    pndm_init_state,
    pndm_plms_step,
    sd_alphas_cumprod,
)


def _oracle_eps(x, alpha, x0):
    return (x - jnp.sqrt(alpha) * x0) / jnp.sqrt(1.0 - alpha)


def test_alphas_cumprod_shape_and_range():
    ac = sd_alphas_cumprod()
    assert ac.shape == (1000,)
    assert 0 < ac[-1] < ac[0] < 1
    assert np.isclose(ac[0], 1 - 0.00085)


def test_ddim_timesteps_50():
    c = make_ddim(50)
    ts = np.asarray(c.timesteps)
    assert ts.shape == (50,)
    assert ts[0] == 981 and ts[-1] == 1  # 20*k + 1, descending
    # SD v1.4 config: set_alpha_to_one=False -> final step integrates to ac[0]
    assert np.isclose(float(c.alpha_prev[-1]), float(sd_alphas_cumprod()[0]))
    assert float(make_ddim(50, set_alpha_to_one=True).alpha_prev[-1]) == 1.0


def test_ddim_oracle_recovers_x0():
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    for steps in (1, 10, 50):
        c = make_ddim(steps, set_alpha_to_one=True)
        x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        for i in range(steps):
            eps = _oracle_eps(x, c.alpha_t[i], x0)
            x = ddim_step(x, eps, c.alpha_t[i], c.alpha_prev[i])
        assert np.allclose(np.asarray(x), np.asarray(x0), atol=1e-3), steps


def test_pndm_call_sequence():
    c = make_pndm(25)
    ts = np.asarray(c.timesteps)
    assert ts.shape == (26,)  # T+1 UNet calls
    assert ts[0] == 961 and ts[1] == ts[2] == 921 and ts[-1] == 1
    # first two calls integrate the same interval
    assert float(c.alpha_t[0]) == float(c.alpha_t[1])
    assert float(c.alpha_prev[0]) == float(c.alpha_prev[1])
    assert np.isclose(float(c.alpha_prev[-1]), float(sd_alphas_cumprod()[0]))


def test_pndm_oracle_converges_to_x0():
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    c = make_pndm(25, set_alpha_to_one=True)
    x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    state = pndm_init_state(x)
    n_calls = c.timesteps.shape[0]
    for i in range(n_calls):
        eps = _oracle_eps(x, c.alpha_t[i], x0)
        state, x = pndm_plms_step(
            state, jnp.asarray(i), x, eps, c.alpha_t[i], c.alpha_prev[i]
        )
    # multistep extrapolation of a consistent oracle still lands on x0
    assert np.allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


def test_pndm_step_under_scan():
    """The PLMS step must be scannable (static shapes, index as carry)."""
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    # 25 steps: Adams-Bashforth truncation error shrinks with step size; at
    # 10 steps the oracle-consistency error is genuinely large (~0.6).
    c = make_pndm(25, set_alpha_to_one=True)
    x_init = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))

    def body(carry, consts):
        i, x, state = carry
        alpha_t, alpha_prev = consts
        eps = _oracle_eps(x, alpha_t, x0)
        state, x = pndm_plms_step(state, i, x, eps, alpha_t, alpha_prev)
        return (i + 1, x, state), None

    (_, x, _), _ = jax.lax.scan(
        body,
        (jnp.asarray(0), x_init, pndm_init_state(x_init)),
        (c.alpha_t, c.alpha_prev),
    )
    assert np.allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


def test_euler_trailing_timesteps_turbo():
    c = make_euler(4)
    ts = np.asarray(c.timesteps)
    assert ts.shape == (4,)
    assert ts[0] == 999.0  # trailing spacing starts at the last train step
    assert float(c.sigmas[-1]) == 0.0
    assert c.sigmas.shape == (5,)


def test_euler_oracle_recovers_x0():
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    for steps in (1, 4):
        c = make_euler(steps)
        noise = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        x = noise * c.sigmas[0]  # x_T = sigma_max * noise (+ x0*0 for pure noise)
        x = x + x0  # Euler (sigma param): x_t = x0 + sigma*eps
        for i in range(steps):
            sigma = c.sigmas[i]
            x_in = euler_scale_model_input(x, sigma)
            # oracle in sigma-parameterization: eps = (x - x0)/sigma
            eps = (x - x0) / sigma
            x = euler_step(x, eps, sigma, c.sigmas[i + 1])
        assert np.allclose(np.asarray(x), np.asarray(x0), atol=1e-3), steps
