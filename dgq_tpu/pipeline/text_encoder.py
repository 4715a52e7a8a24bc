"""CLIP text encoder (functional JAX), the SD v1.4 prompt encoder.

The reference gets this from the vendored diffusers pipeline (HF
CLIPTextModel, openai/clip-vit-large-patch14: width 768, 12 layers, 12 heads,
77 tokens, quick-GELU). Here it is a pure function over a params dict with a
converter from the HF torch state dict; weights load via
dgq_tpu.io.convert-style layout mapping (linears stored (I, O)).

SDXL additionally uses a second, larger encoder (OpenCLIP ViT-bigG) whose
pooled output feeds add_embedding; the same functional core covers it with
different dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.layers import layer_norm, linear


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_attention(p, prefix, x, num_heads, causal_mask):
    b, t, c = x.shape
    hd = c // num_heads
    q = linear(p[f"{prefix}.q_proj"], x) * (hd ** -0.5)
    k = linear(p[f"{prefix}.k_proj"], x)
    v = linear(p[f"{prefix}.v_proj"], x)
    q = jnp.transpose(jnp.reshape(q, (b, t, num_heads, hd)), (0, 2, 1, 3))
    k = jnp.transpose(jnp.reshape(k, (b, t, num_heads, hd)), (0, 2, 1, 3))
    v = jnp.transpose(jnp.reshape(v, (b, t, num_heads, hd)), (0, 2, 1, 3))
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = jnp.where(causal_mask, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, t, c))
    return linear(p[f"{prefix}.out_proj"], out)


def clip_text_encode(
    params: dict,
    input_ids: jax.Array,
    num_layers: int = 12,
    num_heads: int = 12,
    final_norm: bool = True,
) -> jax.Array:
    """Returns last hidden states (B, 77, width) — what SD feeds the UNet."""
    tok = params["token_embedding"][input_ids]
    t = input_ids.shape[-1]
    x = tok + params["position_embedding"][:t]
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    for i in range(num_layers):
        pre = f"encoder.layers.{i}"
        h = layer_norm(params[f"{pre}.layer_norm1"], x)
        x = x + clip_attention(params, f"{pre}.self_attn", h, num_heads, mask)
        h = layer_norm(params[f"{pre}.layer_norm2"], x)
        h = linear(params[f"{pre}.mlp.fc1"], h)
        h = quick_gelu(h)
        x = x + linear(params[f"{pre}.mlp.fc2"], h)
    if final_norm:
        x = layer_norm(params["final_layer_norm"], x)
    return x


def hf_clip_text_to_params(state: dict) -> dict:
    """Convert an HF CLIPTextModel state dict (numpy values) to our params.

    Accepts keys with or without the 'text_model.' prefix."""
    s = {}
    for k, v in state.items():
        s[k[len("text_model."):] if k.startswith("text_model.") else k] = np.asarray(v)

    params = {
        "token_embedding": jnp.asarray(s["embeddings.token_embedding.weight"]),
        "position_embedding": jnp.asarray(s["embeddings.position_embedding.weight"]),
        "final_layer_norm": {
            "scale": jnp.asarray(s["final_layer_norm.weight"]),
            "bias": jnp.asarray(s["final_layer_norm.bias"]),
        },
    }
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in s:
        pre = f"encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            params[f"{pre}.{ln}"] = {
                "scale": jnp.asarray(s[f"{pre}.{ln}.weight"]),
                "bias": jnp.asarray(s[f"{pre}.{ln}.bias"]),
            }
        for lin in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                    "self_attn.out_proj", "mlp.fc1", "mlp.fc2"):
            params[f"{pre}.{lin}"] = {
                "w": jnp.asarray(s[f"{pre}.{lin}.weight"]).T,
                "b": jnp.asarray(s[f"{pre}.{lin}.bias"]),
            }
        i += 1
    return params


def init_clip_text(key, vocab: int = 49408, width: int = 768, layers: int = 12,
                   seq: int = 77, mlp_ratio: int = 4, dtype=jnp.float32) -> dict:
    """Random init (tests / no-weights environments)."""
    keys = jax.random.split(key, 4 + layers * 6)
    ki = iter(keys)
    params = {
        "token_embedding": jax.random.normal(next(ki), (vocab, width), dtype) * 0.02,
        "position_embedding": jax.random.normal(next(ki), (seq, width), dtype) * 0.01,
        "final_layer_norm": {"scale": jnp.ones((width,), dtype),
                             "bias": jnp.zeros((width,), dtype)},
    }
    for i in range(layers):
        pre = f"encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            params[f"{pre}.{ln}"] = {"scale": jnp.ones((width,), dtype),
                                     "bias": jnp.zeros((width,), dtype)}
        dims = {
            "self_attn.q_proj": (width, width), "self_attn.k_proj": (width, width),
            "self_attn.v_proj": (width, width), "self_attn.out_proj": (width, width),
            "mlp.fc1": (width, width * mlp_ratio), "mlp.fc2": (width * mlp_ratio, width),
        }
        for name, (ci, co) in dims.items():
            params[f"{pre}.{name}"] = {
                "w": jax.random.normal(next(ki), (ci, co), dtype) / np.sqrt(ci),
                "b": jnp.zeros((co,), dtype),
            }
    return params
