"""Native ImageReward-v1.0 scorer in JAX (reference evaluation protocol).

The reference scores with the ImageReward package
(/root/reference/src/eval_ImageReward_score.py:25-50): ImageReward-v1.0 is a
BLIP backbone — ViT-L/16 vision tower + a 12-layer BERT text encoder with
per-layer cross-attention to the image tokens — followed by a linear MLP head
(768->1024->128->64->16->1, dropout-only between layers, no activations) on
the [CLS] text feature, with the raw reward normalized by fixed constants.
This module reimplements the whole scorer in JAX and loads the published
`ImageReward.pt` state dict directly (keys `blip.visual_encoder.*` in
BLIP/timm ViT naming, `blip.text_encoder.*` in BERT/med.py naming,
`mlp.layers.*`) — no ImageReward/timm package required.

Architecture notes:
  * vision (BLIP vit.py, i.e. timm ViT): patch conv -> [cls | patches] +
    pos_embed -> pre-LN blocks with fused qkv -> final LayerNorm; eps 1e-6;
    NO ln_pre (unlike CLIP ViTs) and no projection — the text cross-attention
    consumes the full (N, 197, 1024) token sequence.
  * text (BLIP med.py = BERT + cross-attn): post-LN BERT layers, each
    attention->cross-attention->FFN, eps 1e-12; cross-attention k/v project
    from the 1024-wide vision tokens; bidirectional self-attention with the
    pad mask additive.
  * score(prompt, image): tokenizer(prompt, padding='max_length',
    truncation=True, max_length=35); reward = (mlp(text_cls) - MEAN) / STD.

The fixed normalization constants are hardcoded in the ImageReward package
(models/ImageReward.py), not stored in the checkpoint.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.eval.open_clip import preprocess_images

# ImageReward/models/ImageReward.py — fixed reward normalization
IR_MEAN = 0.16717362830052426
IR_STD = 1.0333394966054072


# ----------------------------------------------------------------- loading --
def load_image_reward(path: str) -> Dict:
    """Load an ImageReward-v1.0 checkpoint -> {'visual', 'text', 'mlp'} dicts
    of numpy arrays keyed by their in-tower names (prefix-split only)."""
    from dgq_tpu.io.dgq_ckpt import load_pth

    sd = load_pth(path)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k:
          np.asarray(v) for k, v in sd.items()}
    out = {"visual": {}, "text": {}, "mlp": {}}
    for k, v in sd.items():
        if k.startswith("blip.visual_encoder."):
            out["visual"][k[len("blip.visual_encoder."):]] = v
        elif k.startswith("blip.text_encoder."):
            out["text"][k[len("blip.text_encoder."):]] = v
        elif k.startswith("mlp.layers."):
            out["mlp"][k[len("mlp.layers."):]] = v
    return out


def _ln(p, prefix, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p[f"{prefix}.weight"] + p[f"{prefix}.bias"]).astype(x.dtype)


def _heads_split(z, heads):
    b, t, w = z.shape
    return jnp.transpose(jnp.reshape(z, (b, t, heads, w // heads)),
                         (0, 2, 1, 3))


def _attn_core(q, k, v, mask=None):
    hd = q.shape[-1]
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if mask is not None:
        scores = scores + mask
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)
    b, h, t, d = out.shape
    return jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, t, h * d))


# ------------------------------------------------------------ vision tower --
def encode_vision(p: Dict, images: jax.Array, heads: int = 16) -> jax.Array:
    """Preprocessed (N, S, S, 3) -> (N, 1 + grid^2, width) BLIP image tokens
    (timm ViT-L/16 for the published checkpoint; dims read from weights)."""
    w_conv = np.asarray(p["patch_embed.proj.weight"])  # (width, 3, P, P)
    width, _, ps, _ = w_conv.shape
    x = jax.lax.conv_general_dilated(
        images, jnp.transpose(jnp.asarray(w_conv), (2, 3, 1, 0)),
        (ps, ps), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + jnp.asarray(p["patch_embed.proj.bias"])
    n, gh, gw, _ = x.shape
    x = jnp.reshape(x, (n, gh * gw, width))
    cls = jnp.broadcast_to(jnp.asarray(p["cls_token"]).reshape(1, 1, -1),
                           (n, 1, width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + jnp.asarray(p["pos_embed"])[0]
    depth = 1 + max(int(k.split(".")[1]) for k in p if k.startswith("blocks."))
    for i in range(depth):
        pre = f"blocks.{i}"
        h = _ln(p, f"{pre}.norm1", x, eps=1e-6)
        qkv = h @ p[f"{pre}.attn.qkv.weight"].T + p[f"{pre}.attn.qkv.bias"]
        q, k, v = (jnp.split(qkv, 3, axis=-1))
        o = _attn_core(_heads_split(q, heads), _heads_split(k, heads),
                       _heads_split(v, heads))
        x = x + (o @ p[f"{pre}.attn.proj.weight"].T
                 + p[f"{pre}.attn.proj.bias"])
        h = _ln(p, f"{pre}.norm2", x, eps=1e-6)
        h = h @ p[f"{pre}.mlp.fc1.weight"].T + p[f"{pre}.mlp.fc1.bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ p[f"{pre}.mlp.fc2.weight"].T + p[f"{pre}.mlp.fc2.bias"]
        x = x + h
    return _ln(p, "norm", x, eps=1e-6)


# -------------------------------------------------------------- text tower --
def _bert_attention(p, prefix, x, kv, heads, mask):
    """One med.py attention sub-block (self when kv is x, cross otherwise):
    q/k/v projections -> scaled dot-product -> output.dense -> post-LN."""
    q = x @ p[f"{prefix}.self.query.weight"].T + p[f"{prefix}.self.query.bias"]
    k = kv @ p[f"{prefix}.self.key.weight"].T + p[f"{prefix}.self.key.bias"]
    v = (kv @ p[f"{prefix}.self.value.weight"].T
         + p[f"{prefix}.self.value.bias"])
    o = _attn_core(_heads_split(q, heads), _heads_split(k, heads),
                   _heads_split(v, heads), mask)
    o = (o @ p[f"{prefix}.output.dense.weight"].T
         + p[f"{prefix}.output.dense.bias"])
    return _ln(p, f"{prefix}.output.LayerNorm", x + o, eps=1e-12)


def encode_text_cross(p: Dict, token_ids: jax.Array, attn_mask: jax.Array,
                      enc_states: jax.Array, heads: int = 12) -> jax.Array:
    """(N, L) ids + (N, L) 0/1 pad mask + (N, S, Wv) image tokens ->
    (N, L, W) BERT-with-cross-attention hidden states (med.py semantics)."""
    x = jnp.asarray(p["embeddings.word_embeddings.weight"])[token_ids]
    pos = jnp.asarray(p["embeddings.position_embeddings.weight"])
    x = x + pos[: x.shape[1]]
    x = _ln(p, "embeddings.LayerNorm", x, eps=1e-12)
    # additive pad mask over key positions (transformers extended mask)
    big_neg = jnp.finfo(jnp.float32).min
    mask = (1.0 - attn_mask.astype(jnp.float32))[:, None, None, :] * big_neg
    depth = 1 + max(int(k.split(".")[2]) for k in p
                    if k.startswith("encoder.layer."))
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        x = _bert_attention(p, f"{pre}.attention", x, x, heads, mask)
        x = _bert_attention(p, f"{pre}.crossattention", x, enc_states, heads,
                            mask=None)
        h = (x @ p[f"{pre}.intermediate.dense.weight"].T
             + p[f"{pre}.intermediate.dense.bias"])
        h = jax.nn.gelu(h, approximate=False)
        h = (h @ p[f"{pre}.output.dense.weight"].T
             + p[f"{pre}.output.dense.bias"])
        x = _ln(p, f"{pre}.output.LayerNorm", x + h, eps=1e-12)
    return x


# -------------------------------------------------------------- MLP head ----
def reward_head(p: Dict, feats: jax.Array) -> jax.Array:
    """(N, W) [CLS] features -> (N,) normalized rewards. The published head
    interleaves (inactive-at-eval) Dropout modules, so the Linear layers sit
    at non-contiguous Sequential indices — apply them in index order."""
    idx = sorted({int(k.split(".")[0]) for k in p})
    x = feats.astype(jnp.float32)
    for i in idx:
        x = x @ p[f"{i}.weight"].T + p[f"{i}.bias"]
    return (x[:, 0] - IR_MEAN) / IR_STD


# --------------------------------------------------------------- protocol ---
def tokenize_ir(prompts: list[str], tokenizer_dir: str,
                max_length: int = 35) -> tuple[np.ndarray, np.ndarray]:
    """ImageReward's tokenization (models/ImageReward.py score()):
    BertTokenizer, padding='max_length', truncation=True, max_length=35.
    Returns (input_ids, attention_mask)."""
    from transformers import BertTokenizer

    tok = BertTokenizer.from_pretrained(tokenizer_dir)
    enc = tok(prompts, padding="max_length", truncation=True,
              max_length=max_length, return_tensors="np")
    return enc["input_ids"], enc["attention_mask"]


def image_reward_scores(params: Dict, images: jax.Array,
                        token_ids: jax.Array, attn_mask: jax.Array,
                        vision_heads: int = 16,
                        text_heads: int = 12) -> jax.Array:
    """Preprocessed images + tokens -> (N,) rewards (jit-friendly core).
    Default head counts are ViT-L/16 + BERT-base (the published v1.0)."""
    img_tokens = encode_vision(params["visual"], images, heads=vision_heads)
    txt = encode_text_cross(params["text"], token_ids, attn_mask, img_tokens,
                            heads=text_heads)
    return reward_head(params["mlp"], txt[:, 0, :])


def image_reward_score_native(
    images,
    prompts: list[str],
    ckpt_path: str,
    tokenizer_dir: str,
    batch_size: int = 8,
    vision_heads: int = 16,
    text_heads: int = 12,
    image_size: int | None = None,
) -> float:
    """The reference protocol (eval_ImageReward_score.py:44-50): mean
    normalized reward over (prompt, image) pairs. image_size defaults to
    pos_embed grid x patch size from the checkpoint (224 for v1.0)."""
    params = load_image_reward(ckpt_path)
    if image_size is None:
        n_tok = params["visual"]["pos_embed"].shape[1]
        patch = params["visual"]["patch_embed.proj.weight"].shape[-1]
        image_size = int(round((n_tok - 1) ** 0.5)) * patch
    images = list(images)
    ids, mask = tokenize_ir(prompts, tokenizer_dir)
    fn = jax.jit(lambda im, tk, mk: image_reward_scores(
        params, im, tk, mk, vision_heads, text_heads))
    out = []
    for i in range(0, len(images), batch_size):
        imgs = preprocess_images(np.stack(images[i:i + batch_size]),
                                 image_size)
        out.append(np.asarray(fn(imgs, jnp.asarray(ids[i:i + batch_size]),
                                 jnp.asarray(mask[i:i + batch_size]))))
    return float(np.concatenate(out).mean())
