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


def _encode_layers(params, input_ids, num_layers, num_heads, act,
                   capture_penultimate: bool):
    """Shared transformer stack; optionally captures the hidden state before
    the last layer (HF ``output_hidden_states[-2]``)."""
    # 'gelu' is the exact erf form (HF nn.GELU default), not jax's tanh approx
    act_fn = quick_gelu if act == "quick_gelu" else (
        lambda x: jax.nn.gelu(x, approximate=False))
    tok = params["token_embedding"][input_ids]
    t = input_ids.shape[-1]
    x = tok + params["position_embedding"][:t]
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    penult = None
    for i in range(num_layers):
        if capture_penultimate and i == num_layers - 1:
            penult = x
        pre = f"encoder.layers.{i}"
        h = layer_norm(params[f"{pre}.layer_norm1"], x)
        x = x + clip_attention(params, f"{pre}.self_attn", h, num_heads, mask)
        h = layer_norm(params[f"{pre}.layer_norm2"], x)
        h = linear(params[f"{pre}.mlp.fc1"], h)
        h = act_fn(h)
        x = x + linear(params[f"{pre}.mlp.fc2"], h)
    return x, penult


def clip_text_encode(
    params: dict,
    input_ids: jax.Array,
    num_layers: int = 12,
    num_heads: int = 12,
    final_norm: bool = True,
    act: str = "quick_gelu",
    skip_last: int = 0,
) -> jax.Array:
    """Returns hidden states (B, 77, width) — what SD feeds the UNet.

    skip_last=1 stops after num_layers-1 encoder layers and skips the final
    layer norm — HF ``output_hidden_states[-2]``, which SDXL's encode_prompt
    feeds the UNet (vendored pipeline_stable_diffusion_xl.py:420-422).
    act: 'quick_gelu' (openai CLIP-L) or 'gelu' (OpenCLIP bigG)."""
    if skip_last:
        x, _ = _encode_layers(params, input_ids, num_layers - skip_last,
                              num_heads, act, False)
        return x
    x, _ = _encode_layers(params, input_ids, num_layers, num_heads, act, False)
    if final_norm:
        x = layer_norm(params["final_layer_norm"], x)
    return x


def _eos_positions(input_ids: jax.Array, eos_id: int) -> jax.Array:
    """First occurrence of the EOS token per row (HF CLIP pooling for
    non-legacy eos ids); falls back to argmax when EOS is absent."""
    is_eos = input_ids == eos_id
    pos = jnp.argmax(is_eos, axis=-1)
    return jnp.where(jnp.any(is_eos, axis=-1), pos,
                     jnp.argmax(input_ids, axis=-1))


def clip_text_pooled(
    params: dict,
    input_ids: jax.Array,
    num_layers: int,
    num_heads: int,
    act: str = "gelu",
    eos_id: int = 49407,
) -> jax.Array:
    """Projected pooled output (B, proj_dim): final-normed hidden state at
    the first EOS token, through text_projection. HF
    CLIPTextModelWithProjection's ``text_embeds``, SDXL's
    pooled_prompt_embeds."""
    x = clip_text_encode(params, input_ids, num_layers, num_heads,
                         final_norm=True, act=act)
    eos = _eos_positions(input_ids, eos_id)
    pooled = x[jnp.arange(x.shape[0]), eos]
    return pooled @ params["text_projection"]


def sdxl_encode_prompt(
    params_l: dict,
    params_g: dict,
    ids_l: jax.Array,
    ids_g: jax.Array,
    layers_l: int = 12,
    heads_l: int = 12,
    layers_g: int = 32,
    heads_g: int = 20,
    eos_id: int = 49407,
) -> tuple:
    """SDXL dual-encoder prompt encoding.

    Returns (encoder_hidden_states (B, 77, 768+1280), pooled (B, 1280)):
    penultimate hidden states of CLIP-L and OpenCLIP-bigG concatenated on the
    feature axis, plus bigG's projected pooled embedding — the
    (prompt_embeds, pooled_prompt_embeds) pair of the vendored
    pipeline_stable_diffusion_xl.py:403-430. The bigG stack runs ONCE: the
    penultimate state is captured in the same forward that produces the
    pooled output."""
    h_l = clip_text_encode(params_l, ids_l, layers_l, heads_l,
                           act="quick_gelu", skip_last=1)
    x_g, h_g = _encode_layers(params_g, ids_g, layers_g, heads_g, "gelu",
                              capture_penultimate=True)
    x_g = layer_norm(params_g["final_layer_norm"], x_g)
    eos = _eos_positions(ids_g, eos_id)
    pooled = x_g[jnp.arange(x_g.shape[0]), eos] @ params_g["text_projection"]
    return jnp.concatenate([h_l, h_g], axis=-1), pooled


def hf_clip_text_to_params(state: dict) -> dict:
    """Convert an HF CLIPTextModel state dict (numpy values) to our params.

    Accepts keys with or without the 'text_model.' prefix. A top-level
    'text_projection.weight' (CLIPTextModelWithProjection — SDXL's second
    encoder) converts to params['text_projection'] stored (width, proj)."""
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
    if "text_projection.weight" in s:
        params["text_projection"] = jnp.asarray(s["text_projection.weight"]).T
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


def clip_meta_from_params(params: dict) -> tuple[int, int]:
    """(num_layers, num_heads) discovered from a converted params dict: layer
    count from the encoder.layers.N keys, heads as width // 64 (the CLIP
    family keeps head_dim 64: CLIP-L 768->12, OpenCLIP bigG 1280->20; tiny
    test encoders below width 64 get one head)."""
    layers = 0
    while f"encoder.layers.{layers}.layer_norm1" in params:
        layers += 1
    width = params["token_embedding"].shape[1]
    return layers, max(1, width // 64)


def init_clip_text(key, vocab: int = 49408, width: int = 768, layers: int = 12,
                   seq: int = 77, mlp_ratio: int = 4, dtype=jnp.float32,
                   proj_dim: int = 0) -> dict:
    """Random init (tests / no-weights environments). proj_dim>0 adds
    text_projection (the WithProjection variant, SDXL encoder 2)."""
    keys = jax.random.split(key, 5 + layers * 6)
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
    if proj_dim:
        params["text_projection"] = (
            jax.random.normal(next(ki), (width, proj_dim), dtype) / np.sqrt(width))
    return params
