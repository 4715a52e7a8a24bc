"""torch state-dict <-> JAX params conversion.

Layout conventions (see dgq_tpu/models/layers.py):
  * conv weights: torch OIHW -> ours HWIO
  * linear weights: torch (O, I) -> ours (I, O)
  * per-out-channel weight QParams: torch (O,1,1,1)/(O,1) -> broadcastable
    against our layouts as (1,1,1,O)/(1,O)

The reference checkpoint key structure (SURVEY.md §2.3; note original_w/
original_b are plain tensors in the reference, never serialized):
  weight-only: {'weight': {'model.<path>.w', 'model.<path>.b',
                           'model.<path>.wqtizer.delta/zero_point[/alpha]', ...}}
  activation:  {'act_{t}': {'model.<path>.aqtizer*.delta/zero_point'}}
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def conv_w_to_jax(w: np.ndarray) -> jnp.ndarray:
    """OIHW -> HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def conv_w_to_torch(w) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def linear_w_to_jax(w: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w))


def channel_qp_to_jax(arr: np.ndarray, kind: str) -> jnp.ndarray:
    """Per-out-channel wqtizer delta/zp: (O,1,1,1) conv -> (1,1,1,O) for HWIO,
    (O,1) linear -> (1,O) for (I,O). Scalars pass through."""
    a = np.asarray(arr)
    if a.ndim == 0:
        return jnp.asarray(a)
    if kind == "conv" and a.ndim == 4:
        return jnp.asarray(a.reshape(1, 1, 1, -1))
    if kind == "linear" and a.ndim == 2:
        return jnp.asarray(a.reshape(1, -1))
    return jnp.asarray(a)


def torch_unet_to_params(state: Dict[str, "np.ndarray"], spec) -> dict:
    """Convert a plain (unquantized) reference UNet state dict to our params.

    `state` maps torch names ('<path>.weight'/'.bias') to numpy arrays;
    `spec` is the model layer spec (models/unet_sd.py:sd_unet_spec)."""
    params = {}
    for name, kind, meta in spec:
        if kind == "conv":
            params[name] = {
                "w": conv_w_to_jax(state[f"{name}.weight"]),
                "b": jnp.asarray(state[f"{name}.bias"]) if f"{name}.bias" in state else None,
            }
        elif kind == "linear":
            params[name] = {
                "w": linear_w_to_jax(state[f"{name}.weight"]),
                "b": jnp.asarray(state[f"{name}.bias"]) if f"{name}.bias" in state else None,
            }
        else:
            params[name] = {
                "scale": jnp.asarray(state[f"{name}.weight"]),
                "bias": jnp.asarray(state[f"{name}.bias"]),
            }
    return params


def params_to_torch_unet(params: dict, spec) -> Dict[str, np.ndarray]:
    """Inverse of torch_unet_to_params (for checkpoint writing)."""
    state = {}
    for name, kind, meta in spec:
        p = params[name]
        if kind == "conv":
            state[f"{name}.weight"] = conv_w_to_torch(p["w"])
            if p.get("b") is not None:
                state[f"{name}.bias"] = np.asarray(p["b"])
        elif kind == "linear":
            state[f"{name}.weight"] = np.asarray(p["w"]).T
            if p.get("b") is not None:
                state[f"{name}.bias"] = np.asarray(p["b"])
        else:
            state[f"{name}.weight"] = np.asarray(p["scale"])
            state[f"{name}.bias"] = np.asarray(p["bias"])
    return state
