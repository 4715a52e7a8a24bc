"""Scanned denoising loops for SD v1.4 (PNDM/DDIM + CFG) and SDXL-turbo
(Euler, guidance 0).

The reference drives the UNet from a Python loop inside the diffusers
pipeline, hot-swapping per-timestep activation params via load_state_dict
before every call (/root/reference/quant/calibration.py:297-312). Here the
whole loop is one `lax.scan` compiled into a single XLA program:

  * scheduler constants are stacked [T, ...] scan inputs;
  * time-aware activation qparams carry a leading [T_slots] axis and are
    selected in-scan with `dynamic_index_in_dim` — no host round-trips;
  * CFG doubles the batch inside the step (uncond | text), matching the
    reference pipeline's `latent_model_input = cat([latents]*2)`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dgq_tpu.models.qconfig import QConfig, QState
from dgq_tpu.models.unet_sd import unet_sd_apply
from dgq_tpu.pipeline import schedulers as sch


def timestep_slot(t: jax.Array, num_inference_steps: int) -> jax.Array:
    """act_{(1000 - t) // (1000 // steps)} (reference calibration.py:300-304)."""
    return ((1000 - t) // (1000 // num_inference_steps)).astype(jnp.int32)


def check_time_aware_steps(num_inference_steps: int, time_aware: bool,
                           qstate) -> None:
    """The reference's slot formula assumes 1000 % steps == 0; for any other
    step count it indexes slots that were never calibrated (its loader
    KeyErrors on the missing 'act_{i}'). dynamic_index_in_dim would instead
    CLAMP out-of-range slots — a silent wrong answer — so reject loudly."""
    if time_aware and qstate is not None and 1000 % num_inference_steps:
        raise ValueError(
            f"time-aware qstates require num_inference_steps dividing 1000 "
            f"(got {num_inference_steps}): the reference slot map "
            f"(calibration.py:300-304) is undefined otherwise")


def select_time_qstate(qstate: QState, t: jax.Array, steps: int) -> QState:
    """Pick the per-timestep slice from stacked [T_slots, ...] activation
    qparams. Non-stacked entries (weights already folded) pass through."""
    if qstate is None:
        return None
    slot = timestep_slot(t, steps)

    def pick(leaf):
        return jax.lax.dynamic_index_in_dim(leaf, slot, axis=0, keepdims=False)

    out = dict(qstate)
    for key in ("a", "sm"):
        if key in qstate:
            out[key] = jax.tree.map(pick, qstate[key])
    return out


def sd_sample(
    params: dict,
    latents: jax.Array,
    ehs_text: jax.Array,
    ehs_uncond: jax.Array,
    num_inference_steps: int = 50,
    scheduler: str = "ddim",
    guidance_scale: float = 7.5,
    qstate: Optional[QState] = None,
    cfg: QConfig = QConfig(),
    time_aware: bool = False,
    unet_apply=unet_sd_apply,
    capture: bool = False,
):
    """SD v1.4 latent sampling. latents: (B, 64, 64, 4) NHWC noise ~N(0,1).

    Returns final latents; with capture=True also returns the stacked
    per-call UNet inputs (latent_model_input, timesteps) for calibration —
    the counterpart of the reference's callback_on_step_end capture
    (src/dataset_generation.py:21-58).
    """
    check_time_aware_steps(num_inference_steps, time_aware, qstate)
    ehs = jnp.concatenate([ehs_uncond, ehs_text], axis=0)

    def eps_fn(x, t, qs):
        lmi = jnp.concatenate([x, x], axis=0)
        eps = unet_apply(params, lmi, t, ehs, qstate=qs, cfg=cfg)
        eps_u, eps_t = jnp.split(eps, 2, axis=0)
        return eps_u + guidance_scale * (eps_t - eps_u), lmi

    if scheduler == "ddim":
        consts = sch.make_ddim(num_inference_steps)

        def body(carry, cs):
            x = carry
            t, a_t, a_prev = cs
            qs = select_time_qstate(qstate, t, num_inference_steps) if time_aware else qstate
            eps, lmi = eps_fn(x, t, qs)
            x = sch.ddim_step(x, eps, a_t, a_prev)
            return x, (lmi, t) if capture else None

        x, cap = jax.lax.scan(
            body, latents, (consts.timesteps, consts.alpha_t, consts.alpha_prev)
        )
        return (x, cap) if capture else x

    elif scheduler == "pndm":
        consts = sch.make_pndm(num_inference_steps)

        def body(carry, cs):
            i, x, st = carry
            t, a_t, a_prev = cs
            qs = select_time_qstate(qstate, t, num_inference_steps) if time_aware else qstate
            eps, lmi = eps_fn(x, t, qs)
            st, x = sch.pndm_plms_step(st, i, x, eps, a_t, a_prev)
            return (i + 1, x, st), (lmi, t) if capture else None

        init = (jnp.asarray(0, jnp.int32), latents, sch.pndm_init_state(latents))
        (_, x, _), cap = jax.lax.scan(
            body, init, (consts.timesteps, consts.alpha_t, consts.alpha_prev)
        )
        return (x, cap) if capture else x

    raise ValueError(f"unknown scheduler {scheduler}")


def sdxl_turbo_sample(
    params: dict,
    latents: jax.Array,
    ehs_text: jax.Array,
    added_text_embeds: jax.Array,
    added_time_ids: jax.Array,
    unet_apply,
    num_inference_steps: int = 4,
    qstate: Optional[QState] = None,
    cfg: QConfig = QConfig(),
    time_aware: bool = False,
    capture: bool = False,
):
    """SDXL-turbo sampling: Euler trailing, guidance 0 (no CFG doubling).

    latents: (B, 128, 128, 4) NHWC noise ~N(0,1) (scaled by sigma_max here).
    """
    check_time_aware_steps(num_inference_steps, time_aware, qstate)
    consts = sch.make_euler(num_inference_steps)
    # keep the scan carry (and thus every UNet activation) in the latents'
    # dtype: sigmas are f32 and a bare multiply would promote the whole
    # sampled graph to f32 — 2x HBM traffic and 4x MXU time per step
    x = (latents * consts.sigmas[0]).astype(latents.dtype)

    def body(carry, cs):
        i, x = carry
        t, sigma, sigma_next = cs
        qs = select_time_qstate(qstate, t.astype(jnp.int32), num_inference_steps) if time_aware else qstate
        x_in = sch.euler_scale_model_input(x, sigma)
        eps = unet_apply(
            params, x_in, t, ehs_text,
            text_embeds=added_text_embeds, time_ids=added_time_ids,
            qstate=qs, cfg=cfg,
        )
        x = sch.euler_step(x, eps, sigma, sigma_next)
        return (i + 1, x), (x_in, t) if capture else None

    (_, x), cap = jax.lax.scan(
        body,
        (jnp.asarray(0, jnp.int32), x),
        (consts.timesteps, consts.sigmas[:-1], consts.sigmas[1:]),
    )
    return (x, cap) if capture else x
