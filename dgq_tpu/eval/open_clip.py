"""open_clip-format CLIP scorer (the reference's evaluation protocol).

The reference pins open_clip ViT-g-14 / laion2b_s34b_b88k and reports the
mean raw text·image cosine over the first N images
(/root/reference/src/eval_clip_score.py:26-70). This module loads an
open_clip checkpoint (the `state_dict` of open_clip.create_model, e.g.
open_clip_pytorch_model.bin) directly into a JAX reimplementation of the
open_clip VisionTransformer + text tower — no open_clip package required.
All dimensions (width, depth, heads, patch size, embed dim) are derived
from the checkpoint shapes, so any open_clip ViT (B/16, L/14, g-14, ...)
loads.

Architecture notes (matching open_clip/transformer.py):
  * pre-LN residual blocks: x += attn(ln_1(x)); x += mlp(ln_2(x))
  * attention is torch.nn.MultiheadAttention layout: fused in_proj (3W, W)
  * GELU MLP (laion-trained ViTs; OpenAI-trained ones use QuickGELU — pass
    quick_gelu=True for those)
  * vision pooling: class token -> ln_post -> @ proj
  * text pooling: position of the highest token id (EOT) -> ln_final -> @
    text_projection; causal mask over the 77-token context
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

OPENAI_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


# ----------------------------------------------------------------- loading --
def load_open_clip(path: str) -> Dict:
    """Load an open_clip checkpoint file -> {'visual': ..., 'text': ...} with
    numpy arrays keyed by open_clip names (prefix-split only; no renaming)."""
    from dgq_tpu.io.dgq_ckpt import load_pth

    sd = load_pth(path)
    if "state_dict" in sd:  # training checkpoints wrap it
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k:
          np.asarray(v) for k, v in sd.items()}
    vis = {k[len("visual."):]: v for k, v in sd.items()
           if k.startswith("visual.")}
    txt = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    return {"visual": vis, "text": txt}


def _ln(p, prefix, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out * p[f"{prefix}.weight"] + p[f"{prefix}.bias"]


def _mha(p, prefix, x, heads: int, causal: bool):
    """torch.nn.MultiheadAttention with fused in_proj, batch-last semantics
    folded into a (B, T, W) layout."""
    b, t, w = x.shape
    qkv = x @ p[f"{prefix}.in_proj_weight"].T + p[f"{prefix}.in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = w // heads

    def split(z):
        return jnp.transpose(jnp.reshape(z, (b, t, heads, hd)), (0, 2, 1, 3))

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if causal:
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        scores = scores + mask
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, t, w))
    return out @ p[f"{prefix}.out_proj.weight"].T + p[f"{prefix}.out_proj.bias"]


def _block(p, i, x, heads, causal, quick_gelu):
    pre = f"transformer.resblocks.{i}"
    h = _ln(p, f"{pre}.ln_1", x).astype(x.dtype)
    x = x + _mha(p, f"{pre}.attn", h, heads, causal)
    h = _ln(p, f"{pre}.ln_2", x).astype(x.dtype)
    h = h @ p[f"{pre}.mlp.c_fc.weight"].T + p[f"{pre}.mlp.c_fc.bias"]
    if quick_gelu:
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=False)
    h = h @ p[f"{pre}.mlp.c_proj.weight"].T + p[f"{pre}.mlp.c_proj.bias"]
    return x + h


def _depth(p) -> int:
    return 1 + max(int(k.split(".")[2]) for k in p
                   if k.startswith("transformer.resblocks."))


# open_clip vision towers do NOT keep head_dim 64: ViT-H/g/bigG all use 16
# heads at widths 1280/1408/1664. Known vision widths -> heads; text towers
# always use width // 64.
_VISION_HEADS = {768: 12, 896: 14, 1024: 16, 1152: 16, 1280: 16,
                 1408: 16, 1664: 16}


def _n_heads(width: int, vision: bool = False) -> int:
    if vision and width in _VISION_HEADS:
        return _VISION_HEADS[width]
    return width // 64


def preprocess_images(images: np.ndarray, size: int = 224) -> jax.Array:
    """uint8 (N,H,W,3) -> normalized (N,size,size,3): shorter-side bicubic
    resize + center crop + OpenAI normalize (open_clip's default transform)."""
    x = jnp.asarray(images).astype(jnp.float32) / 255.0
    n, h, w, _ = x.shape
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    # bicubic overshoots outside [0,1] at edges; torchvision resizes the
    # uint8 PIL image (clamped to [0,255]) before ToTensor, so clamp to
    # match the open_clip transform
    x = jnp.clip(jax.image.resize(x, (n, nh, nw, 3), "bicubic"), 0.0, 1.0)
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size, :]
    return (x - OPENAI_MEAN) / OPENAI_STD


def encode_image(params: Dict, images: jax.Array,
                 quick_gelu: bool = False) -> jax.Array:
    """Preprocessed (N, S, S, 3) -> L2-normalized (N, D) embeddings."""
    p = params["visual"]
    w_conv = p["conv1.weight"]  # (width, 3, P, P) torch OIHW
    width, _, ps, _ = w_conv.shape
    x = jax.lax.conv_general_dilated(
        images, jnp.transpose(jnp.asarray(w_conv), (2, 3, 1, 0)),
        (ps, ps), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, gh, gw, _ = x.shape
    x = jnp.reshape(x, (n, gh * gw, width))
    cls = jnp.broadcast_to(jnp.asarray(p["class_embedding"]).reshape(1, 1, -1),
                           (n, 1, width)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + p["positional_embedding"]
    x = _ln(p, "ln_pre", x).astype(x.dtype)
    heads = _n_heads(width, vision=True)
    for i in range(_depth(p)):
        x = _block(p, i, x, heads, causal=False, quick_gelu=quick_gelu)
    pooled = _ln(p, "ln_post", x[:, 0])
    emb = pooled @ p["proj"]
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def encode_text(params: Dict, token_ids: jax.Array,
                quick_gelu: bool = False) -> jax.Array:
    """(N, 77) int token ids (zero-padded after EOT) -> L2-normalized (N, D)."""
    p = params["text"]
    x = jnp.asarray(p["token_embedding.weight"])[token_ids]
    x = x + p["positional_embedding"]
    width = x.shape[-1]
    heads = _n_heads(width)
    for i in range(_depth(p)):
        x = _block(p, i, x, heads, causal=True, quick_gelu=quick_gelu)
    x = _ln(p, "ln_final", x)
    eot = jnp.argmax(token_ids, axis=-1)  # EOT has the highest token id
    pooled = x[jnp.arange(x.shape[0]), eot]
    emb = pooled @ p["text_projection"]
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def tokenize(prompts: list[str], tokenizer_dir: str,
             context: int = 77) -> np.ndarray:
    """open_clip.tokenize() semantics via a local transformers CLIPTokenizer
    (same BPE vocab): [SOT] + bpe + [EOT], zero-padded to 77; on overflow
    truncate and force the last token to EOT."""
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(tokenizer_dir)
    out = np.zeros((len(prompts), context), np.int64)
    eot = tok.eos_token_id
    for i, t in enumerate(prompts):
        ids = tok(t)["input_ids"]  # already [SOT] ... [EOT]
        if len(ids) > context:
            ids = ids[:context]
            ids[-1] = eot
        out[i, : len(ids)] = ids
    return out


def clip_score_openclip(
    images,
    prompts: list[str],
    ckpt_path: str,
    tokenizer_dir: str,
    batch_size: int = 8,
    quick_gelu: bool = False,
) -> float:
    """The reference's exact protocol (eval_clip_score.py:44-66): mean raw
    text·image cosine similarity, no weighting, no clamping."""
    params = load_open_clip(ckpt_path)
    # input resolution from the checkpoint: grid^2 + 1 pos-embed rows,
    # grid * patch pixels (224 for ViT-g-14)
    patch = params["visual"]["conv1.weight"].shape[-1]
    grid = int(round((params["visual"]["positional_embedding"].shape[0] - 1)
                     ** 0.5))
    size = grid * patch
    images = list(images)
    toks = tokenize(prompts, tokenizer_dir)
    img_fn = jax.jit(lambda im: encode_image(params, im, quick_gelu))
    txt_fn = jax.jit(lambda tk: encode_text(params, tk, quick_gelu))
    sims = []
    for i in range(0, len(images), batch_size):
        imgs = preprocess_images(np.stack(images[i:i + batch_size]), size)
        ie = np.asarray(img_fn(imgs))
        te = np.asarray(txt_fn(jnp.asarray(toks[i:i + batch_size])))
        sims.append((ie * te).sum(-1))
    return float(np.concatenate(sims).mean())
