"""InceptionV3 FID feature extractor (pool3, 2048-d) in functional JAX.

The reference scores FID by shelling out to pytorch-fid
(scripts/eval_scores.sh:17-32), whose extractor is torchvision InceptionV3
with three FID-specific pooling changes (pytorch_fid/inception.py):

  * InceptionA / InceptionC / InceptionE branch_pool uses 3x3 s1 average
    pooling with count_include_pad=False;
  * the second InceptionE (Mixed_7c) uses 3x3 s1 MAX pooling in its pool
    branch (matching the original TF graph);
  * features are the 2048-d global-average pool before fc.

This module is that network as a pure function over a params dict: every
BasicConv2d becomes conv+bias (BatchNorm folded at conversion time) + ReLU,
NHWC layout, HWIO weights. `load_pt_inception` reads the standard
pt_inception-2015-12-05-6726825d.pth state dict (torch, local file — zero
egress) and folds BN; `init_inception` random-inits the same structure for
tests and no-weights environments.

Preprocessing matches pytorch-fid defaults: uint8 [0,255] -> [0,1], bilinear
resize to 299x299 (align_corners=False), then scale to [-1, 1].
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ spec ----
# Every conv: (name, cin, cout, (kh, kw), (sh, sw), (ph, pw)).
# Block structure is applied by the functions below; this flat spec drives
# init, conversion, and the param-count test.


def _conv(name, cin, cout, k, s=(1, 1), p=(0, 0)):
    k = (k, k) if isinstance(k, int) else k
    return (name, cin, cout, k, s, p)


def _inception_a(pre: str, cin: int, pool_features: int):
    return [
        _conv(f"{pre}.branch1x1", cin, 64, 1),
        _conv(f"{pre}.branch5x5_1", cin, 48, 1),
        _conv(f"{pre}.branch5x5_2", 48, 64, 5, p=(2, 2)),
        _conv(f"{pre}.branch3x3dbl_1", cin, 64, 1),
        _conv(f"{pre}.branch3x3dbl_2", 64, 96, 3, p=(1, 1)),
        _conv(f"{pre}.branch3x3dbl_3", 96, 96, 3, p=(1, 1)),
        _conv(f"{pre}.branch_pool", cin, pool_features, 1),
    ]


def _inception_b(pre: str, cin: int):
    return [
        _conv(f"{pre}.branch3x3", cin, 384, 3, s=(2, 2)),
        _conv(f"{pre}.branch3x3dbl_1", cin, 64, 1),
        _conv(f"{pre}.branch3x3dbl_2", 64, 96, 3, p=(1, 1)),
        _conv(f"{pre}.branch3x3dbl_3", 96, 96, 3, s=(2, 2)),
    ]


def _inception_c(pre: str, cin: int, c7: int):
    return [
        _conv(f"{pre}.branch1x1", cin, 192, 1),
        _conv(f"{pre}.branch7x7_1", cin, c7, 1),
        _conv(f"{pre}.branch7x7_2", c7, c7, (1, 7), p=(0, 3)),
        _conv(f"{pre}.branch7x7_3", c7, 192, (7, 1), p=(3, 0)),
        _conv(f"{pre}.branch7x7dbl_1", cin, c7, 1),
        _conv(f"{pre}.branch7x7dbl_2", c7, c7, (7, 1), p=(3, 0)),
        _conv(f"{pre}.branch7x7dbl_3", c7, c7, (1, 7), p=(0, 3)),
        _conv(f"{pre}.branch7x7dbl_4", c7, c7, (7, 1), p=(3, 0)),
        _conv(f"{pre}.branch7x7dbl_5", c7, 192, (1, 7), p=(0, 3)),
        _conv(f"{pre}.branch_pool", cin, 192, 1),
    ]


def _inception_d(pre: str, cin: int):
    return [
        _conv(f"{pre}.branch3x3_1", cin, 192, 1),
        _conv(f"{pre}.branch3x3_2", 192, 320, 3, s=(2, 2)),
        _conv(f"{pre}.branch7x7x3_1", cin, 192, 1),
        _conv(f"{pre}.branch7x7x3_2", 192, 192, (1, 7), p=(0, 3)),
        _conv(f"{pre}.branch7x7x3_3", 192, 192, (7, 1), p=(3, 0)),
        _conv(f"{pre}.branch7x7x3_4", 192, 192, 3, s=(2, 2)),
    ]


def _inception_e(pre: str, cin: int):
    return [
        _conv(f"{pre}.branch1x1", cin, 320, 1),
        _conv(f"{pre}.branch3x3_1", cin, 384, 1),
        _conv(f"{pre}.branch3x3_2a", 384, 384, (1, 3), p=(0, 1)),
        _conv(f"{pre}.branch3x3_2b", 384, 384, (3, 1), p=(1, 0)),
        _conv(f"{pre}.branch3x3dbl_1", cin, 448, 1),
        _conv(f"{pre}.branch3x3dbl_2", 448, 384, 3, p=(1, 1)),
        _conv(f"{pre}.branch3x3dbl_3a", 384, 384, (1, 3), p=(0, 1)),
        _conv(f"{pre}.branch3x3dbl_3b", 384, 384, (3, 1), p=(1, 0)),
        _conv(f"{pre}.branch_pool", cin, 192, 1),
    ]


def inception_spec() -> List[Tuple]:
    """All 94 BasicConv2d convs of the InceptionV3 backbone."""
    spec = [
        _conv("Conv2d_1a_3x3", 3, 32, 3, s=(2, 2)),
        _conv("Conv2d_2a_3x3", 32, 32, 3),
        _conv("Conv2d_2b_3x3", 32, 64, 3, p=(1, 1)),
        _conv("Conv2d_3b_1x1", 64, 80, 1),
        _conv("Conv2d_4a_3x3", 80, 192, 3),
    ]
    spec += _inception_a("Mixed_5b", 192, 32)
    spec += _inception_a("Mixed_5c", 256, 64)
    spec += _inception_a("Mixed_5d", 288, 64)
    spec += _inception_b("Mixed_6a", 288)
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                     ("Mixed_6d", 160), ("Mixed_6e", 192)):
        spec += _inception_c(name, 768, c7)
    spec += _inception_d("Mixed_7a", 768)
    spec += _inception_e("Mixed_7b", 1280)
    spec += _inception_e("Mixed_7c", 2048)
    return spec


# ------------------------------------------------------------- leaf ops -----
def _conv_relu(params: Dict, name: str, x: jax.Array, spec_map: Dict) -> jax.Array:
    """BasicConv2d with BN pre-folded: conv + bias + ReLU."""
    _, _, _, k, s, p = spec_map[name]
    out = jax.lax.conv_general_dilated(
        x, params[name]["w"],
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(out + params[name]["b"])


def _max_pool(x: jax.Array, k: int, s: int, p: int = 0) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, k, k, 1), (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0)),
    )


def _avg_pool_3x3_nopad(x: jax.Array) -> jax.Array:
    """3x3 s1 p1 average pool with count_include_pad=False — the FID
    variant's pooling (pytorch-fid inception.py FIDInceptionA/C/E_1)."""
    window = (1, 3, 3, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, (1, 1, 1, 1), pad)
    return s / n


# ----------------------------------------------------------- block apply ----
def _apply_a(params, pre, x, sm):
    b1 = _conv_relu(params, f"{pre}.branch1x1", x, sm)
    b5 = _conv_relu(params, f"{pre}.branch5x5_1", x, sm)
    b5 = _conv_relu(params, f"{pre}.branch5x5_2", b5, sm)
    b3 = _conv_relu(params, f"{pre}.branch3x3dbl_1", x, sm)
    b3 = _conv_relu(params, f"{pre}.branch3x3dbl_2", b3, sm)
    b3 = _conv_relu(params, f"{pre}.branch3x3dbl_3", b3, sm)
    bp = _conv_relu(params, f"{pre}.branch_pool", _avg_pool_3x3_nopad(x), sm)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _apply_b(params, pre, x, sm):
    b3 = _conv_relu(params, f"{pre}.branch3x3", x, sm)
    bd = _conv_relu(params, f"{pre}.branch3x3dbl_1", x, sm)
    bd = _conv_relu(params, f"{pre}.branch3x3dbl_2", bd, sm)
    bd = _conv_relu(params, f"{pre}.branch3x3dbl_3", bd, sm)
    return jnp.concatenate([b3, bd, _max_pool(x, 3, 2)], axis=-1)


def _apply_c(params, pre, x, sm):
    b1 = _conv_relu(params, f"{pre}.branch1x1", x, sm)
    b7 = x
    for i in (1, 2, 3):
        b7 = _conv_relu(params, f"{pre}.branch7x7_{i}", b7, sm)
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _conv_relu(params, f"{pre}.branch7x7dbl_{i}", bd, sm)
    bp = _conv_relu(params, f"{pre}.branch_pool", _avg_pool_3x3_nopad(x), sm)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _apply_d(params, pre, x, sm):
    b3 = _conv_relu(params, f"{pre}.branch3x3_1", x, sm)
    b3 = _conv_relu(params, f"{pre}.branch3x3_2", b3, sm)
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _conv_relu(params, f"{pre}.branch7x7x3_{i}", b7, sm)
    return jnp.concatenate([b3, b7, _max_pool(x, 3, 2)], axis=-1)


def _apply_e(params, pre, x, sm, pool: str):
    b1 = _conv_relu(params, f"{pre}.branch1x1", x, sm)
    b3 = _conv_relu(params, f"{pre}.branch3x3_1", x, sm)
    b3 = jnp.concatenate([
        _conv_relu(params, f"{pre}.branch3x3_2a", b3, sm),
        _conv_relu(params, f"{pre}.branch3x3_2b", b3, sm),
    ], axis=-1)
    bd = _conv_relu(params, f"{pre}.branch3x3dbl_1", x, sm)
    bd = _conv_relu(params, f"{pre}.branch3x3dbl_2", bd, sm)
    bd = jnp.concatenate([
        _conv_relu(params, f"{pre}.branch3x3dbl_3a", bd, sm),
        _conv_relu(params, f"{pre}.branch3x3dbl_3b", bd, sm),
    ], axis=-1)
    pooled = (_max_pool(x, 3, 1, p=1) if pool == "max"
              else _avg_pool_3x3_nopad(x))
    bp = _conv_relu(params, f"{pre}.branch_pool", pooled, sm)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# --------------------------------------------------------------- forward ----
def preprocess_images(images: np.ndarray | jax.Array) -> jax.Array:
    """uint8 (N,H,W,3) [0,255] or float [0,1] -> (N,299,299,3) in [-1,1],
    bilinear resize (align_corners=False) — pytorch-fid's default
    resize_input/normalize_input path."""
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = x.astype(jnp.float32)
    if x.shape[1:3] != (299, 299):
        # pytorch-fid resizes with F.interpolate(..., mode='bilinear'),
        # which does NOT antialias; jax.image.resize defaults to
        # antialias=True for downscaling — match the reference kernel.
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             "bilinear", antialias=False)
    return 2.0 * x - 1.0


def inception_pool3(params: Dict, x: jax.Array) -> jax.Array:
    """(N,299,299,3) in [-1,1] -> (N, 2048) pool3 features."""
    sm = {s[0]: s for s in inception_spec()}
    x = _conv_relu(params, "Conv2d_1a_3x3", x, sm)
    x = _conv_relu(params, "Conv2d_2a_3x3", x, sm)
    x = _conv_relu(params, "Conv2d_2b_3x3", x, sm)
    x = _max_pool(x, 3, 2)
    x = _conv_relu(params, "Conv2d_3b_1x1", x, sm)
    x = _conv_relu(params, "Conv2d_4a_3x3", x, sm)
    x = _max_pool(x, 3, 2)
    x = _apply_a(params, "Mixed_5b", x, sm)
    x = _apply_a(params, "Mixed_5c", x, sm)
    x = _apply_a(params, "Mixed_5d", x, sm)
    x = _apply_b(params, "Mixed_6a", x, sm)
    x = _apply_c(params, "Mixed_6b", x, sm)
    x = _apply_c(params, "Mixed_6c", x, sm)
    x = _apply_c(params, "Mixed_6d", x, sm)
    x = _apply_c(params, "Mixed_6e", x, sm)
    x = _apply_d(params, "Mixed_7a", x, sm)
    x = _apply_e(params, "Mixed_7b", x, sm, pool="avg")
    x = _apply_e(params, "Mixed_7c", x, sm, pool="max")  # FIDInceptionE_2
    return jnp.mean(x, axis=(1, 2))


# module-level jitted entry points: a fresh jax.jit wrapper per call would
# retrace + recompile the 94-conv network on every invocation (eval_scores
# calls fid_features twice: generated + reference images)
_jit_pool3 = jax.jit(inception_pool3)


@jax.jit
def _jit_probs(p, x):
    feats = inception_pool3(p, x)
    return jax.nn.softmax(feats @ p["fc"]["w"] + p["fc"]["b"], axis=-1)


def fid_features(params: Dict, images, batch_size: int = 32) -> np.ndarray:
    """Images -> (N, 2048) features, batched through a jitted forward."""
    out = []
    images = np.asarray(images)
    for i in range(0, len(images), batch_size):
        x = preprocess_images(images[i : i + batch_size])
        out.append(np.asarray(_jit_pool3(params, x)))
    return np.concatenate(out, axis=0)


def inception_probs(params: Dict, images, batch_size: int = 32) -> np.ndarray:
    """Images -> (N, num_classes) softmax probabilities for the Inception
    Score (the reference's torch-fidelity --isc path, eval_scores.sh:17-20).
    Requires the checkpoint's fc head (params['fc'])."""
    if "fc" not in params:
        raise ValueError("params have no fc head; load a full pt_inception "
                         "checkpoint to compute IS")
    out = []
    images = np.asarray(images)
    for i in range(0, len(images), batch_size):
        x = preprocess_images(images[i : i + batch_size])
        out.append(np.asarray(_jit_probs(params, x)))
    return np.concatenate(out, axis=0)


# ------------------------------------------------------ params/conversion ---
def init_inception(key, dtype=jnp.float32) -> Dict:
    """Random He-init params (tests / no-weights environments)."""
    params = {}
    spec = inception_spec()
    keys = jax.random.split(key, len(spec))
    for (name, cin, cout, k, _, _), kk in zip(spec, keys):
        fan_in = cin * k[0] * k[1]
        params[name] = {
            "w": jax.random.normal(kk, (k[0], k[1], cin, cout), dtype)
            * np.sqrt(2.0 / fan_in),
            "b": jnp.zeros((cout,), dtype),
        }
    return params


def torch_inception_to_params(state: Dict[str, np.ndarray],
                              bn_eps: float = 1e-3) -> Dict:
    """Convert a pytorch-fid / torchvision inception_v3 state dict (numpy
    values) to our params, folding each BasicConv2d's BatchNorm into the conv:

        w' = w * gamma / sqrt(var + eps),  b' = beta - gamma * mean / sqrt(...)

    Keys: '<name>.conv.weight' (OIHW), '<name>.bn.{weight,bias,running_mean,
    running_var}'. fc / AuxLogits keys are ignored (features stop at pool3)."""
    params = {}
    for name, cin, cout, k, _, _ in inception_spec():
        w = np.asarray(state[f"{name}.conv.weight"], np.float32)
        gamma = np.asarray(state[f"{name}.bn.weight"], np.float32)
        beta = np.asarray(state[f"{name}.bn.bias"], np.float32)
        mean = np.asarray(state[f"{name}.bn.running_mean"], np.float32)
        var = np.asarray(state[f"{name}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + bn_eps)
        w = w * scale[:, None, None, None]          # per-out-channel
        b = beta - mean * scale
        assert w.shape == (cout, cin, k[0], k[1]), (name, w.shape)
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # OIHW -> HWIO
            "b": jnp.asarray(b),
        }
    if "fc.weight" in state:  # classification head, used only for IS
        params["fc"] = {
            "w": jnp.asarray(np.asarray(state["fc.weight"], np.float32).T),
            "b": jnp.asarray(np.asarray(state["fc.bias"], np.float32)),
        }
    return params


def load_pt_inception(path: str) -> Dict:
    """Load the standard FID inception checkpoint
    (pt_inception-2015-12-05-6726825d.pth) from a local file."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return torch_inception_to_params(
        {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")})
