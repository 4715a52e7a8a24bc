"""SD v1.4 UNet, functional JAX/NHWC.

Re-designed from the reference's hand-written torch UNet
(/root/reference/diffusers_rewrite/sd.py:493-620): same hardcoded SD v1.4
topology (320/640/1280 channels, 1-layer transformers, 12 skip connections
s0..s11), but expressed as a pure function over a flat params dict so the
whole denoising step jits into one XLA program and the quantizer state
threads through explicitly.

Layer names match the reference state-dict paths (sans the leading "model.").
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.layers import (
    basic_transformer_block,
    conv2d,
    group_norm,
    linear,
    quant_conv2d,
    quant_linear,
    resnet_block,
    silu,
    timestep_embedding,
    upsample_nearest2x,
)
from dgq_tpu.models.qconfig import QConfig, QState

NUM_HEADS = 8
CROSS_DIM = 768


import contextlib
import contextvars

# Injection points: add a perturbation at a unit's output during tracing.
# Differentiating the final loss wrt the injected zero gives dL/d(unit out) —
# the functional counterpart of the reference's backward hooks
# (quant/data_utill.py:172-256) used for Fisher-weighted reconstruction.
_INJECT: contextvars.ContextVar = contextvars.ContextVar("dgq_inject", default=None)


@contextlib.contextmanager
def inject_at(store: dict):
    token = _INJECT.set(store)
    try:
        yield
    finally:
        _INJECT.reset(token)


def _rec(record, key, inputs, out):
    """Stash a reconstruction unit's (inputs, output) when capturing
    (counterpart of the reference's save_inout hooks, quant/data_utill.py:13-51),
    and apply any registered output injection."""
    inj = _INJECT.get()
    if inj is not None and key in inj:
        out = out + inj[key]
    if record is not None:
        record[key] = (inputs, out)
    return out


def transformer_2d(p, prefix, x, ehs, n_layers, qstate, cfg, record=None):
    """Transformer2DModel (reference sd.py:273-305): conv proj_in/out."""
    b, h, w, c = x.shape
    res = x
    x = group_norm(p[f"{prefix}.norm"], x, eps=1e-6)
    x_in = x
    x = quant_conv2d(p[f"{prefix}.proj_in"], x, f"{prefix}.proj_in", qstate, cfg, 1, 0)
    x = _rec(record, f"{prefix}.proj_in", (x_in,), x)
    inner = x.shape[-1]
    x = jnp.reshape(x, (b, h * w, inner))
    for i in range(n_layers):
        x_in = x
        x = basic_transformer_block(
            p, f"{prefix}.transformer_blocks.{i}", x, ehs, NUM_HEADS, qstate, cfg
        )
        x = _rec(record, f"{prefix}.transformer_blocks.{i}", (x_in, ehs), x)
    x = jnp.reshape(x, (b, h, w, inner))
    x_in = x
    x = quant_conv2d(p[f"{prefix}.proj_out"], x, f"{prefix}.proj_out", qstate, cfg, 1, 0)
    x = _rec(record, f"{prefix}.proj_out", (x_in,), x)
    return x + res


def _resnet(p, prefix, x, temb, qstate, cfg, shortcut, record):
    out = resnet_block(p, prefix, x, temb, qstate, cfg, shortcut)
    return _rec(record, prefix, (x, temb), out)


def cross_attn_down_block(p, prefix, x, temb, ehs, qstate, cfg, has_shortcut,
                          has_down, record=None):
    skips = []
    for i in range(2):
        shortcut = has_shortcut and i == 0
        x = _resnet(p, f"{prefix}.resnets.{i}", x, temb, qstate, cfg, shortcut, record)
        x = transformer_2d(p, f"{prefix}.attentions.{i}", x, ehs, 1, qstate, cfg, record)
        skips.append(x)
    if has_down:
        name = f"{prefix}.downsamplers.0.conv"
        x = _rec(record, name, (x,), quant_conv2d(p[name], x, name, qstate, cfg, 2, 1))
        skips.append(x)
    return x, skips


def down_block(p, prefix, x, temb, qstate, cfg, record=None):
    skips = []
    for i in range(2):
        x = _resnet(p, f"{prefix}.resnets.{i}", x, temb, qstate, cfg, False, record)
        skips.append(x)
    return x, skips


def cross_attn_up_block(p, prefix, x, skips, temb, ehs, qstate, cfg, has_up, record=None):
    for i in range(3):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = _resnet(p, f"{prefix}.resnets.{i}", x, temb, qstate, cfg, True, record)
        x = transformer_2d(p, f"{prefix}.attentions.{i}", x, ehs, 1, qstate, cfg, record)
    if has_up:
        x = upsample_nearest2x(x)
        name = f"{prefix}.upsamplers.0.conv"
        x = _rec(record, name, (x,), quant_conv2d(p[name], x, name, qstate, cfg, 1, 1))
    return x


def up_block(p, prefix, x, skips, temb, qstate, cfg, record=None):
    for i in range(3):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = _resnet(p, f"{prefix}.resnets.{i}", x, temb, qstate, cfg, True, record)
    x = upsample_nearest2x(x)
    name = f"{prefix}.upsamplers.0.conv"
    x = _rec(record, name, (x,), quant_conv2d(p[name], x, name, qstate, cfg, 1, 1))
    return x


def mid_block(p, prefix, x, temb, ehs, qstate, cfg, record=None):
    x = _resnet(p, f"{prefix}.resnets.0", x, temb, qstate, cfg, False, record)
    x = transformer_2d(p, f"{prefix}.attentions.0", x, ehs, 1, qstate, cfg, record)
    x = _resnet(p, f"{prefix}.resnets.1", x, temb, qstate, cfg, False, record)
    return x


def unet_sd_apply(
    params: dict,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    qstate: Optional[QState] = None,
    cfg: QConfig = QConfig(),
    record: Optional[dict] = None,
) -> jax.Array:
    """UNet forward (reference sd.py:546-620). sample is NHWC (B, 64, 64, 4).

    With `record` (a dict), every reconstruction unit's (inputs, output) is
    captured — the jit-friendly counterpart of the reference's forward hooks.
    """
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
    base = params["conv_in"]["w"].shape[-1]  # 320 for real SD v1.4
    t_emb = timestep_embedding(timesteps, base).astype(sample.dtype)
    emb = quant_linear(params["time_embedding.linear_1"], t_emb, "time_embedding.linear_1", qstate, cfg)
    emb = _rec(record, "time_embedding.linear_1", (t_emb,), emb)
    emb_in = silu(emb)
    emb = quant_linear(params["time_embedding.linear_2"], emb_in, "time_embedding.linear_2", qstate, cfg)
    emb = _rec(record, "time_embedding.linear_2", (emb_in,), emb)

    # conv_in / conv_out are never quantized (reference quant_model.py:118-124)
    x = conv2d(params["conv_in"], sample, 1, 1)

    ehs = encoder_hidden_states
    s0 = x
    x, (s1, s2, s3) = cross_attn_down_block(
        params, "down_blocks.0", x, emb, ehs, qstate, cfg, False, True, record)
    x, (s4, s5, s6) = cross_attn_down_block(
        params, "down_blocks.1", x, emb, ehs, qstate, cfg, True, True, record)
    x, (s7, s8, s9) = cross_attn_down_block(
        params, "down_blocks.2", x, emb, ehs, qstate, cfg, True, True, record)
    x, (s10, s11) = down_block(params, "down_blocks.3", x, emb, qstate, cfg, record)

    x = mid_block(params, "mid_block", x, emb, ehs, qstate, cfg, record)

    x = up_block(params, "up_blocks.0", x, [s9, s10, s11], emb, qstate, cfg, record)
    x = cross_attn_up_block(params, "up_blocks.1", x, [s6, s7, s8], emb, ehs, qstate, cfg, True, record)
    x = cross_attn_up_block(params, "up_blocks.2", x, [s3, s4, s5], emb, ehs, qstate, cfg, True, record)
    x = cross_attn_up_block(params, "up_blocks.3", x, [s0, s1, s2], emb, ehs, qstate, cfg, False, record)

    x = group_norm(params["conv_norm_out"], x)
    x = silu(x)
    x = conv2d(params["conv_out"], x, 1, 1)
    return x


# --------------------------------------------------------------------------
# Model spec: enumerate layers for init / conversion / calibration.
# --------------------------------------------------------------------------
def _transformer_spec(prefix, inner, cross):
    """(name, kind, meta) entries for one BasicTransformerBlock."""
    out = []
    for attn, kvdim in ((f"{prefix}.attn1", inner), (f"{prefix}.attn2", cross)):
        out += [
            (f"{attn}.to_q", "linear", (inner, inner, False)),
            (f"{attn}.to_k", "linear", (kvdim, inner, False)),
            (f"{attn}.to_v", "linear", (kvdim, inner, False)),
            (f"{attn}.to_out.0", "linear", (inner, inner, True)),
        ]
    out += [
        (f"{prefix}.norm1", "layernorm", (inner,)),
        (f"{prefix}.norm2", "layernorm", (inner,)),
        (f"{prefix}.norm3", "layernorm", (inner,)),
        (f"{prefix}.ff.net.0.proj", "linear", (inner, inner * 8, True)),
        (f"{prefix}.ff.net.2", "linear", (inner * 4, inner, True)),
    ]
    return out


def _resnet_spec(prefix, cin, cout, shortcut, temb_dim):
    out = [
        (f"{prefix}.norm1", "groupnorm", (cin,)),
        (f"{prefix}.conv1", "conv", (cin, cout, 3, 1, 1)),
        (f"{prefix}.time_emb_proj", "linear", (temb_dim, cout, True)),
        (f"{prefix}.norm2", "groupnorm", (cout,)),
        (f"{prefix}.conv2", "conv", (cout, cout, 3, 1, 1)),
    ]
    if shortcut:
        out.append((f"{prefix}.conv_shortcut", "conv", (cin, cout, 1, 1, 0)))
    return out


def _transformer2d_spec(prefix, c, n_layers, cross):
    out = [
        (f"{prefix}.norm", "groupnorm", (c,)),
        (f"{prefix}.proj_in", "conv", (c, c, 1, 1, 0)),
        (f"{prefix}.proj_out", "conv", (c, c, 1, 1, 0)),
    ]
    for i in range(n_layers):
        out += _transformer_spec(f"{prefix}.transformer_blocks.{i}", c, cross)
    return out


def sd_unet_spec(base: int = 320, cross: int = CROSS_DIM):
    """Full layer spec for SD v1.4. conv meta: (cin, cout, k, stride, pad);
    linear meta: (cin, cout, bias).

    `base` scales every channel count (320 = real SD v1.4; small values give
    a structurally identical tiny model for tests, mirroring the vendored
    diffusers FastTests' get_dummy_components pattern).
    """
    c1, c2, c3 = base, base * 2, base * 4
    temb = base * 4
    spec = [
        ("conv_in", "conv", (4, c1, 3, 1, 1)),
        ("time_embedding.linear_1", "linear", (c1, temb, True)),
        ("time_embedding.linear_2", "linear", (temb, temb, True)),
        ("conv_norm_out", "groupnorm", (c1,)),
        ("conv_out", "conv", (c1, 4, 3, 1, 1)),
    ]
    # down blocks 0..2 (cross attn), 3 (plain)
    cins = [(c1, c1), (c1, c2), (c2, c3)]
    for bi, (cin0, cout) in enumerate(cins):
        pre = f"down_blocks.{bi}"
        spec += _resnet_spec(f"{pre}.resnets.0", cin0, cout, bi != 0, temb)
        spec += _resnet_spec(f"{pre}.resnets.1", cout, cout, False, temb)
        spec += _transformer2d_spec(f"{pre}.attentions.0", cout, 1, cross)
        spec += _transformer2d_spec(f"{pre}.attentions.1", cout, 1, cross)
        spec += [(f"{pre}.downsamplers.0.conv", "conv", (cout, cout, 3, 2, 1))]
    spec += _resnet_spec("down_blocks.3.resnets.0", c3, c3, False, temb)
    spec += _resnet_spec("down_blocks.3.resnets.1", c3, c3, False, temb)
    # mid
    spec += _resnet_spec("mid_block.resnets.0", c3, c3, False, temb)
    spec += _resnet_spec("mid_block.resnets.1", c3, c3, False, temb)
    spec += _transformer2d_spec("mid_block.attentions.0", c3, 1, cross)
    # up block 0 (plain, c3)
    for i in range(3):
        spec += _resnet_spec(f"up_blocks.0.resnets.{i}", c3 + c3, c3, True, temb)
    spec += [("up_blocks.0.upsamplers.0.conv", "conv", (c3, c3, 3, 1, 1))]
    # up blocks 1..3 (cross attn)
    ups = [
        ("up_blocks.1", c3, c3, c2, True),
        ("up_blocks.2", c2, c3, c1, True),
        ("up_blocks.3", c1, c2, c1, False),
    ]
    for pre, cout, prev, cin, has_up in ups:
        extras = [prev, cout, cin]
        for i in range(3):
            spec += _resnet_spec(f"{pre}.resnets.{i}", cout + extras[i], cout, True, temb)
            spec += _transformer2d_spec(f"{pre}.attentions.{i}", cout, 1, cross)
        if has_up:
            spec += [(f"{pre}.upsamplers.0.conv", "conv", (cout, cout, 3, 1, 1))]
    return spec


def quantizable_layers(spec=None):
    """Names of conv/linear layers wrapped by QuantLayer in the reference
    (everything except norms; conv_in/conv_out excluded at quantization time
    by disable_out_quantization, but they still receive wqtizer params in the
    checkpoint, so they are listed)."""
    spec = spec or sd_unet_spec()
    return [(n, k, m) for (n, k, m) in spec if k in ("conv", "linear")]


def init_unet_sd(key: jax.Array, dtype=jnp.float32, spec=None,
                 fast: bool = False) -> dict:
    """Random-init params with reference-matching shapes (HWIO convs, (I,O)
    linears). Used for tests and benchmarks; real weights come from the
    checkpoint converter (dgq_tpu.io.convert).

    fast=True draws from numpy instead of threefry — host init of the 860M
    full-size model drops from minutes to seconds (benchmarks only)."""
    params = {}
    spec = spec if spec is not None else sd_unet_spec()
    if fast:
        rng = np.random.RandomState(int(jax.random.key_data(key)[-1]) % (2 ** 31))

        def normal(k, shape):
            return jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    else:
        def normal(k, shape):
            return jax.random.normal(k, shape)

    keys = jax.random.split(key, len(spec))
    for (name, kind, meta), k in zip(spec, keys):
        if kind == "conv":
            cin, cout, ksz, _, _ = meta
            fan_in = cin * ksz * ksz
            params[name] = {
                "w": (normal(k, (ksz, ksz, cin, cout)) / np.sqrt(fan_in)).astype(dtype),
                "b": jnp.zeros((cout,), dtype),
            }
        elif kind == "linear":
            cin, cout, bias = meta
            params[name] = {
                "w": (normal(k, (cin, cout)) / np.sqrt(cin)).astype(dtype),
                "b": jnp.zeros((cout,), dtype) if bias else None,
            }
        else:  # norms
            (c,) = meta
            params[name] = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    return params
