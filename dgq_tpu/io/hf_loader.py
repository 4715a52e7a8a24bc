"""Local HF snapshot loading: state dicts from .safetensors / .bin / .pth
files or snapshot directories (zero-egress; nothing is downloaded)."""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

_CANDIDATES = (
    "diffusion_pytorch_model.safetensors",
    "diffusion_pytorch_model.bin",
    "model.safetensors",
    "pytorch_model.bin",
    "unet.pth",
)


def resolve_state_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for cand in _CANDIDATES:
            p = os.path.join(path, cand)
            if os.path.exists(p):
                return p
        hits = [f for f in os.listdir(path)
                if f.endswith((".safetensors", ".bin", ".pth"))]
        if hits:
            return os.path.join(path, sorted(hits)[0])
    raise FileNotFoundError(f"no state dict found at {path}")


def load_state_dict_any(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors state dict as {name: float32 numpy}."""
    f = resolve_state_file(path)
    if f.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(f, framework="np") as sf:
            for k in sf.keys():
                v = sf.get_tensor(k)
                # upcast every sub-f32 float (fp16 AND bf16 — safetensors
                # returns ml_dtypes.bfloat16 arrays, dtype kind 'V', which
                # np.issubdtype misses and torch.from_numpy rejects at
                # checkpoint-save time); integers pass through, matching
                # the torch branch's .float()
                import jax.numpy as jnp

                if v.dtype != np.float32 and jnp.issubdtype(v.dtype, jnp.floating):
                    v = v.astype(np.float32)
                out[k] = v
        return out
    import torch

    state = torch.load(f, map_location="cpu", weights_only=False)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: v.float().numpy() for k, v in state.items() if hasattr(v, "numpy")}
