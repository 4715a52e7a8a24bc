"""Diffusion schedulers as scan-ready pure functions.

The reference relies on diffusers 0.26.0 schedulers: PNDM (PLMS branch) for SD
v1.4 (scheduling_pndm.py:72, skip_prk_steps=True), DDIM for the 50-step
north-star config, and EulerDiscrete for SDXL-turbo. Here each scheduler is
re-derived as:

  * a host-side `make_*` that precomputes all per-step constants as stacked
    arrays [T, ...], and
  * a jit-pure `*_step(state, latents, eps, step_consts)` used inside
    `lax.scan`, with any history (PLMS ets buffer) carried as scan state.

SD v1.4 betas: scaled_linear 0.00085 -> 0.012, 1000 train steps,
steps_offset=1 (standard SD scheduler config).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def sd_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    """scaled_linear beta schedule -> cumulative alpha products."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps) ** 2
    return np.cumprod(1.0 - betas, axis=0)


# ------------------------------------------------------------------ DDIM ----
class DDIMConsts(NamedTuple):
    timesteps: jax.Array      # [T] int32
    alpha_t: jax.Array        # [T] alpha_cumprod at t
    alpha_prev: jax.Array     # [T] alpha_cumprod at t_prev (final -> 1.0)


def make_ddim(num_inference_steps: int, num_train_timesteps: int = 1000,
              steps_offset: int = 1, set_alpha_to_one: bool = False) -> DDIMConsts:
    step = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int64)
    timesteps = timesteps + steps_offset
    ac = sd_alphas_cumprod(num_train_timesteps)
    alpha_t = ac[timesteps]
    prev_t = timesteps - step
    # SD v1.4's scheduler config sets set_alpha_to_one=False: the final step
    # integrates to alphas_cumprod[0], not 1.0 (diffusers scheduling_ddim.py
    # final_alpha_cumprod)
    final_alpha = 1.0 if set_alpha_to_one else ac[0]
    alpha_prev = np.where(prev_t >= 0, ac[np.clip(prev_t, 0, None)], final_alpha)
    return DDIMConsts(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alpha_t=jnp.asarray(alpha_t, jnp.float32),
        alpha_prev=jnp.asarray(alpha_prev, jnp.float32),
    )


def ddim_step(latents: jax.Array, eps: jax.Array, alpha_t: jax.Array,
              alpha_prev: jax.Array) -> jax.Array:
    """Deterministic DDIM update (eta=0), epsilon prediction. Math in f32,
    result in the latents' dtype (keeps bf16 scan carries stable)."""
    x = latents.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1.0 - alpha_t) * e) / jnp.sqrt(alpha_t)
    out = jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * e
    return out.astype(latents.dtype)


# ------------------------------------------------------------ PNDM / PLMS ---
class PNDMConsts(NamedTuple):
    """Per-UNet-call constants. With skip_prk_steps=True, diffusers PNDM runs
    PLMS: the second timestep is repeated (one extra UNet call at the start),
    so there are T+1 calls for T steps."""

    timesteps: jax.Array      # [T+1] int32: t passed to the UNet at each call
    alpha_t: jax.Array        # [T+1]
    alpha_prev: jax.Array     # [T+1]


class PNDMState(NamedTuple):
    ets: jax.Array            # [4, ...latent shape...] eps history ring
    num_ets: jax.Array        # int32 count of valid entries
    cur_sample: jax.Array     # latent stashed across the first two calls


def make_pndm(num_inference_steps: int, num_train_timesteps: int = 1000,
              steps_offset: int = 1, set_alpha_to_one: bool = False) -> PNDMConsts:
    step = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step).round().astype(np.int64)
    ts = ts + steps_offset
    ts = ts[::-1]  # descending
    if num_inference_steps == 1:
        call_ts = ts
        eff_t, eff_prev = ts, ts - step
    else:
        # diffusers plms_timesteps (skip_prk_steps): the second-highest
        # timestep appears twice -> UNet-call sequence
        # [t_max, t2, t2, t3, ...]; the second call's integration constants
        # are "bumped" so both of the first two calls integrate
        # t_max -> t2 (step_plms counter==1 branch).
        call_ts = np.concatenate([ts[:1], ts[1:2], ts[1:]])
        eff_t = np.concatenate([ts[:1], ts[:1], ts[1:]])
        eff_prev = np.concatenate([ts[1:2], ts[1:2], ts[1:] - step])
    ac = sd_alphas_cumprod(num_train_timesteps)
    alpha_t = ac[eff_t]
    # PNDMScheduler default set_alpha_to_one=False (scheduling_pndm.py:118)
    final_alpha = 1.0 if set_alpha_to_one else ac[0]
    alpha_prev = np.where(eff_prev >= 0, ac[np.clip(eff_prev, 0, None)], final_alpha)
    return PNDMConsts(
        timesteps=jnp.asarray(call_ts, jnp.int32),
        alpha_t=jnp.asarray(alpha_t, jnp.float32),
        alpha_prev=jnp.asarray(alpha_prev, jnp.float32),
    )


def _pndm_prev_sample(sample, eps, alpha_t, alpha_prev):
    """diffusers PNDM _get_prev_sample (scheduling_pndm.py:388-429)."""
    beta_t = 1.0 - alpha_t
    beta_prev = 1.0 - alpha_prev
    sample_coeff = jnp.sqrt(alpha_prev / alpha_t)
    # model_output_denom_coeff (scheduling_pndm.py:439-442):
    #   alpha_t * sqrt(beta_prev) + sqrt(alpha_t * beta_t * alpha_prev)
    eps_coeff = alpha_t * jnp.sqrt(beta_prev) + jnp.sqrt(
        alpha_t * beta_t * alpha_prev
    )
    return sample_coeff * sample - (alpha_prev - alpha_t) * eps / eps_coeff


def pndm_init_state(latents: jax.Array) -> PNDMState:
    return PNDMState(
        ets=jnp.zeros((4,) + latents.shape, latents.dtype),
        num_ets=jnp.asarray(0, jnp.int32),
        cur_sample=latents,
    )


def pndm_plms_step(
    state: PNDMState,
    call_idx: jax.Array,
    latents: jax.Array,
    eps: jax.Array,
    alpha_t: jax.Array,
    alpha_prev: jax.Array,
) -> tuple[PNDMState, jax.Array]:
    """One PLMS UNet-call update (diffusers step_plms, scheduling_pndm.py:306-386).

    call_idx 0: record eps, stash sample, take a half-informed first step.
    call_idx 1: average with the new eps, restart from the stashed sample.
    call_idx >=2: Adams-Bashforth multistep on the ets history.
    """
    is_second = call_idx == 1
    eps = eps.astype(state.ets.dtype)

    # history update: eps is appended for every call except the second
    new_ets = jnp.where(
        is_second,
        state.ets,
        jnp.concatenate([state.ets[1:], eps[None]], axis=0),
    )
    num_ets = jnp.where(is_second, state.num_ets, state.num_ets + 1)
    n = jnp.minimum(num_ets, 4)

    e1 = new_ets[-1]
    e2 = new_ets[-2]
    e3 = new_ets[-3]
    e4 = new_ets[-4]
    eps_1 = eps                                   # n==1 (first call)
    eps_2 = (3.0 * e1 - e2) / 2.0                 # n==2
    eps_3 = (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0
    eps_4 = (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0
    eps_prime = jnp.select(
        [n == 1, n == 2, n == 3],
        [eps_1, eps_2, eps_3],
        eps_4,
    )
    # second call: eps' = (eps + ets[-1]) / 2, starting from the stashed sample
    eps_prime = jnp.where(is_second, (eps + e1) / 2.0, eps_prime)
    sample = jnp.where(is_second, state.cur_sample, latents)

    prev = _pndm_prev_sample(
        sample.astype(jnp.float32), eps_prime.astype(jnp.float32),
        alpha_t, alpha_prev,
    ).astype(latents.dtype)
    new_state = PNDMState(
        ets=new_ets,
        num_ets=num_ets,
        cur_sample=jnp.where(call_idx == 0, latents, state.cur_sample),
    )
    return new_state, prev


# -------------------------------------------------------- Euler discrete ----
class EulerConsts(NamedTuple):
    timesteps: jax.Array   # [T] float32 (UNet conditioning values)
    sigmas: jax.Array      # [T+1] float32 (sigma_T ... sigma_0=0)


def make_euler(num_inference_steps: int, num_train_timesteps: int = 1000,
               timestep_spacing: str = "trailing") -> EulerConsts:
    """EulerDiscrete for SDXL-turbo (trailing spacing, 1-4 steps, no noise)."""
    ac = sd_alphas_cumprod(num_train_timesteps)
    all_sigmas = np.sqrt((1.0 - ac) / ac)
    if timestep_spacing == "trailing":
        ts = np.arange(num_train_timesteps, 0, -num_train_timesteps / num_inference_steps)
        ts = (ts - 1).round().astype(np.float32)
    else:  # leading
        step = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.float32)
    sigmas = np.interp(ts, np.arange(0, num_train_timesteps), all_sigmas)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return EulerConsts(timesteps=jnp.asarray(ts), sigmas=jnp.asarray(sigmas))


def euler_scale_model_input(latents: jax.Array, sigma: jax.Array) -> jax.Array:
    """Math in f32, result in the latents' dtype (see ddim_step)."""
    x = latents.astype(jnp.float32) / jnp.sqrt(sigma.astype(jnp.float32) ** 2 + 1.0)
    return x.astype(latents.dtype)


def euler_step(latents: jax.Array, eps: jax.Array, sigma: jax.Array,
               sigma_next: jax.Array) -> jax.Array:
    """Euler update, epsilon prediction: x0 = x - sigma*eps; dx = (x - x0)/sigma."""
    x = latents.astype(jnp.float32)
    pred_original = x - sigma * eps.astype(jnp.float32)
    derivative = (x - pred_original) / sigma
    return (x + derivative * (sigma_next - sigma)).astype(latents.dtype)


def euler_init_sigma(num_inference_steps: int, **kw) -> jax.Array:
    return make_euler(num_inference_steps, **kw).sigmas[0]
