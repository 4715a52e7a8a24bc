"""Stable Diffusion KL-VAE decoder (functional JAX, NHWC).

The reference decodes latents through the vendored diffusers AutoencoderKL.
SD v1.x f8 decoder: post_quant_conv (1x1, 4->4), conv_in 4->512, mid
(resnet / single-head spatial attention / resnet), 4 up stages of 3 resnets
(512,512,256,128) with nearest-2x upsample between, GroupNorm+SiLU+conv_out
-> RGB. Latents are scaled by 1/0.18215 before decoding (SD convention).

Converter maps the HF AutoencoderKL torch state dict; init_vae_decoder gives
random weights for tests and throughput benchmarks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.layers import conv2d, group_norm, silu, upsample_nearest2x

SD_VAE_SCALE = 0.18215
# SDXL's AutoencoderKL was trained with a different latent scaling factor
# (sdxl-turbo vae/config.json scaling_factor) — decoding SDXL latents with
# the SD scale washes every pixel by ~0.715x
SDXL_VAE_SCALE = 0.13025

# fused_attention holds the whole padded K and V in VMEM per program; with
# double buffering the footprint is ~2x (K+V). Decodes whose K+V exceed this
# budget take the chunked-softmax path instead (module-level so tests can
# patch it down).
FLASH_KV_VMEM_BUDGET = 24 * 1024 * 1024


def _resnet(p, prefix, x):
    h = group_norm(p[f"{prefix}.norm1"], x, eps=1e-6, stats_barrier=True)
    h = silu(h)
    h = conv2d(p[f"{prefix}.conv1"], h, 1, 1)
    h = group_norm(p[f"{prefix}.norm2"], h, eps=1e-6, stats_barrier=True)
    h = silu(h)
    h = conv2d(p[f"{prefix}.conv2"], h, 1, 1)
    if f"{prefix}.conv_shortcut" in p:
        x = conv2d(p[f"{prefix}.conv_shortcut"], x, 1, 0)
    return x + h


def _attn(p, prefix, x):
    b, h, w, c = x.shape
    res = x
    x = group_norm(p[f"{prefix}.group_norm"], x, eps=1e-6, stats_barrier=True)
    x = jnp.reshape(x, (b, h * w, c))
    q = jnp.dot(x, p[f"{prefix}.to_q"]["w"]) + p[f"{prefix}.to_q"]["b"]
    k = jnp.dot(x, p[f"{prefix}.to_k"]["w"]) + p[f"{prefix}.to_k"]["b"]
    v = jnp.dot(x, p[f"{prefix}.to_v"]["w"]) + p[f"{prefix}.to_v"]["b"]
    # Cap the flash switch so huge decodes (SDXL 1024px mid-block: 16384
    # tokens x 512 ch) fall back to chunked softmax instead of overflowing
    # VMEM at compile (fused_attention maps the whole padded K/V per program).
    kv_bytes = 2 * (h * w) * c * jnp.dtype(x.dtype).itemsize
    if 1024 <= h * w and kv_bytes <= FLASH_KV_VMEM_BUDGET:
        # single-head attention over h*w tokens: at 512px decode this is a
        # (B, 4096, 4096) f32 softmax — 64 MB/image materialized in HBM.
        # The flash kernel keeps it blockwise in VMEM (interpret on CPU).
        from dgq_tpu.ops.pallas.attention import fused_attention

        o = fused_attention(q, k, v, c ** -0.5, sm_mode="none",
                            interpret=jax.default_backend() == "cpu")
    elif h * w >= 4096:
        # flash-ineligible giant decodes (SDXL 1024px: 16384 tokens x 512 ch
        # exceeds the kernel's whole-K/V-in-VMEM budget): exact softmax over
        # query chunks — O(chunk*S) live scores instead of a (B, S, S) f32
        # matrix (1 GB/image at 16384 tokens).
        tc = 1024
        t = h * w
        tpad = -t % tc  # pad queries up; extra rows are discarded below
        qp = jnp.pad(q, ((0, 0), (0, tpad), (0, 0)))
        nchunk = (t + tpad) // tc
        qc = jnp.reshape(qp, (b, nchunk, tc, c)).transpose(1, 0, 2, 3)

        def _chunk(qb):
            s = jnp.einsum("btc,bsc->bts", qb, k) * (c ** -0.5)
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
            return jnp.einsum("bts,bsc->btc", a, v)

        o = jax.lax.map(_chunk, qc)  # (nchunk, b, tc, c)
        o = jnp.reshape(o.transpose(1, 0, 2, 3), (b, t + tpad, c))[:, :t]
    else:
        scores = jnp.einsum("btc,bsc->bts", q, k) * (c ** -0.5)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bts,bsc->btc", attn, v)
    o = jnp.dot(o, p[f"{prefix}.to_out.0"]["w"]) + p[f"{prefix}.to_out.0"]["b"]
    return jnp.reshape(o, (b, h, w, c)) + res


def vae_decode(params: dict, latents: jax.Array, scale: float = SD_VAE_SCALE) -> jax.Array:
    """latents NHWC (B, h, w, 4) -> images NHWC (B, 8h, 8w, 3) in [-1, 1]."""
    x = latents / scale
    x = conv2d(params["post_quant_conv"], x, 1, 0)
    x = conv2d(params["decoder.conv_in"], x, 1, 1)
    x = _resnet(params, "decoder.mid_block.resnets.0", x)
    x = _attn(params, "decoder.mid_block.attentions.0", x)
    x = _resnet(params, "decoder.mid_block.resnets.1", x)
    for i in range(4):
        for j in range(3):
            x = _resnet(params, f"decoder.up_blocks.{i}.resnets.{j}", x)
        if i < 3:
            x = upsample_nearest2x(x)
            x = conv2d(params[f"decoder.up_blocks.{i}.upsamplers.0.conv"], x, 1, 1)
    x = group_norm(params["decoder.conv_norm_out"], x, eps=1e-6, stats_barrier=True)
    x = silu(x)
    x = conv2d(params["decoder.conv_out"], x, 1, 1)
    return x


def vae_decoder_spec(base: int = 128):
    """(name, kind, meta) spec. base=128 is real SD; smaller for tests.
    Channels: conv_in -> 4*base; up stages [4b, 4b, 2b, b]."""
    c4, c2, c1 = base * 4, base * 2, base
    spec = [
        ("post_quant_conv", "conv", (4, 4, 1, 1, 0)),
        ("decoder.conv_in", "conv", (4, c4, 3, 1, 1)),
        ("decoder.conv_norm_out", "groupnorm", (c1,)),
        ("decoder.conv_out", "conv", (c1, 3, 3, 1, 1)),
    ]
    for pre, cin, cout in [
        ("decoder.mid_block.resnets.0", c4, c4),
        ("decoder.mid_block.resnets.1", c4, c4),
    ]:
        spec += [
            (f"{pre}.norm1", "groupnorm", (cin,)),
            (f"{pre}.conv1", "conv", (cin, cout, 3, 1, 1)),
            (f"{pre}.norm2", "groupnorm", (cout,)),
            (f"{pre}.conv2", "conv", (cout, cout, 3, 1, 1)),
        ]
    spec += [
        ("decoder.mid_block.attentions.0.group_norm", "groupnorm", (c4,)),
        ("decoder.mid_block.attentions.0.to_q", "linear", (c4, c4, True)),
        ("decoder.mid_block.attentions.0.to_k", "linear", (c4, c4, True)),
        ("decoder.mid_block.attentions.0.to_v", "linear", (c4, c4, True)),
        ("decoder.mid_block.attentions.0.to_out.0", "linear", (c4, c4, True)),
    ]
    stage_ch = [c4, c4, c2, c1]
    cin = c4
    for i, cout in enumerate(stage_ch):
        for j in range(3):
            pre = f"decoder.up_blocks.{i}.resnets.{j}"
            spec += [
                (f"{pre}.norm1", "groupnorm", (cin,)),
                (f"{pre}.conv1", "conv", (cin, cout, 3, 1, 1)),
                (f"{pre}.norm2", "groupnorm", (cout,)),
                (f"{pre}.conv2", "conv", (cout, cout, 3, 1, 1)),
            ]
            if cin != cout:
                spec += [(f"{pre}.conv_shortcut", "conv", (cin, cout, 1, 1, 0))]
            cin = cout
        if i < 3:
            spec += [(f"decoder.up_blocks.{i}.upsamplers.0.conv", "conv", (cout, cout, 3, 1, 1))]
    return spec


def init_vae_decoder(key, base: int = 128, dtype=jnp.float32) -> dict:
    from dgq_tpu.models.unet_sd import init_unet_sd

    return init_unet_sd(key, dtype=dtype, spec=vae_decoder_spec(base))


def hf_vae_to_params(state: dict) -> dict:
    """Convert HF AutoencoderKL state dict (numpy values; decoder side only)."""
    from dgq_tpu.io.convert import conv_w_to_jax

    params = {}
    for k, v in state.items():
        v = np.asarray(v)
        if not (k.startswith("decoder.") or k.startswith("post_quant_conv")):
            continue
        base = k.rsplit(".", 1)[0]
        leaf = k.rsplit(".", 1)[1]
        p = params.setdefault(base, {})
        if v.ndim == 4:
            p["w" if leaf == "weight" else "b"] = (
                conv_w_to_jax(v) if leaf == "weight" else jnp.asarray(v)
            )
        elif v.ndim == 2:
            p["w" if leaf == "weight" else "b"] = (
                jnp.asarray(v.T) if leaf == "weight" else jnp.asarray(v)
            )
        else:
            if leaf == "weight":
                # group norm scale OR a conv bias-less 1D — norms use scale/bias
                p["scale"] = jnp.asarray(v)
            elif leaf == "bias":
                if "norm" in base:
                    p["bias"] = jnp.asarray(v)
                else:
                    p["b"] = jnp.asarray(v)
    # normalize: norm dicts use scale/bias; conv/linear use w/b
    out = {}
    for name, p in params.items():
        if "norm" in name:
            out[name] = {"scale": p.get("scale"), "bias": p.get("bias")}
        else:
            out[name] = {"w": p.get("w"), "b": p.get("b")}
    return out


def latents_to_images(images: jax.Array) -> np.ndarray:
    """[-1,1] NHWC floats -> uint8 numpy images."""
    arr = np.asarray(jnp.clip(images / 2 + 0.5, 0.0, 1.0))
    return (arr * 255).round().astype(np.uint8)
