"""open_clip-format CLIP scorer parity: our JAX towers vs a torch replica of
open_clip's architecture (nn.MultiheadAttention fused in_proj layout,
pre-LN blocks, class-token / EOT-argmax pooling), saved with exact
open_clip state-dict names so a real ViT-g-14 checkpoint loads the same way.
"""
import os
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

import jax.numpy as jnp  # noqa: E402

from dgq_tpu.eval.open_clip import (  # noqa: E402
    encode_image,
    encode_text,
    load_open_clip,
    preprocess_images,
)

# head count is derived from width (open_clip convention: text width//64,
# vision via the known-width table) — the tiny tower must follow it
W, HEADS, DEPTH, OUT = 128, 2, 2, 32
PATCH, IMG = 8, 32
VOCAB, CTX = 50, 12


class Block(nn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(w)
        self.attn = nn.MultiheadAttention(w, heads)
        self.ln_2 = nn.LayerNorm(w)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(w, 4 * w)),
            ("gelu", nn.GELU()),
            ("c_proj", nn.Linear(4 * w, w)),
        ]))

    def forward(self, x, mask=None):  # x: (T, N, W) seq-first like open_clip
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        return x + self.mlp(self.ln_2(x))


class Tower(nn.Module):
    def __init__(self, w, heads, depth):
        super().__init__()
        self.resblocks = nn.ModuleList([Block(w, heads) for _ in range(depth)])

    def forward(self, x, mask=None):
        for b in self.resblocks:
            x = b(x, mask)
        return x


class Visual(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, W, PATCH, PATCH, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(W) * 0.02)
        n = (IMG // PATCH) ** 2 + 1
        self.positional_embedding = nn.Parameter(torch.randn(n, W) * 0.02)
        self.ln_pre = nn.LayerNorm(W)
        self.transformer = Tower(W, HEADS, DEPTH)
        self.ln_post = nn.LayerNorm(W)
        self.proj = nn.Parameter(torch.randn(W, OUT) * 0.05)

    def forward(self, x):  # (N, 3, H, W)
        x = self.conv1(x)
        x = x.flatten(2).permute(0, 2, 1)  # (N, T, W)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        x = self.transformer(x).permute(1, 0, 2)
        pooled = self.ln_post(x[:, 0])
        e = pooled @ self.proj
        return e / e.norm(dim=-1, keepdim=True)


class RefCLIP(nn.Module):
    def __init__(self):
        super().__init__()
        self.visual = Visual()
        self.token_embedding = nn.Embedding(VOCAB, W)
        self.positional_embedding = nn.Parameter(torch.randn(CTX, W) * 0.02)
        self.transformer = Tower(W, HEADS, DEPTH)
        self.ln_final = nn.LayerNorm(W)
        self.text_projection = nn.Parameter(torch.randn(W, OUT) * 0.05)

    def encode_text(self, ids):
        x = self.token_embedding(ids) + self.positional_embedding
        mask = torch.triu(torch.full((CTX, CTX), float("-inf")), diagonal=1)
        x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)]
        e = pooled @ self.text_projection
        return e / e.norm(dim=-1, keepdim=True)


@pytest.fixture(scope="module")
def model_and_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    m = RefCLIP().eval()
    path = str(tmp_path_factory.mktemp("oc") / "open_clip_pytorch_model.bin")
    torch.save(m.state_dict(), path)
    return m, path


def test_encode_image_parity(model_and_ckpt):
    m, path = model_and_ckpt
    params = load_open_clip(path)
    rng = np.random.RandomState(0)
    imgs = rng.randn(3, IMG, IMG, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = m.visual(torch.from_numpy(
            np.transpose(imgs, (0, 3, 1, 2)))).numpy()
    ours = np.asarray(encode_image(params, jnp.asarray(imgs)))
    assert np.allclose(ours, ref, atol=2e-5), np.abs(ours - ref).max()


def test_encode_text_parity(model_and_ckpt):
    m, path = model_and_ckpt
    params = load_open_clip(path)
    rng = np.random.RandomState(1)
    # EOT = max id in each row, at varying positions; zero-padded after
    ids = np.zeros((4, CTX), np.int64)
    for i in range(4):
        n = rng.randint(3, CTX)
        ids[i, :n] = rng.randint(1, VOCAB - 1, n)
        ids[i, n - 1] = VOCAB - 1  # EOT
    with torch.no_grad():
        ref = m.encode_text(torch.from_numpy(ids)).numpy()
    ours = np.asarray(encode_text(params, jnp.asarray(ids)))
    assert np.allclose(ours, ref, atol=2e-5), np.abs(ours - ref).max()


def test_preprocess_resize_crop():
    # mixed aspect: shorter side -> 224, center crop, OpenAI normalize
    img = np.full((1, 448, 672, 3), 128, np.uint8)
    out = np.asarray(preprocess_images(img))
    assert out.shape == (1, 224, 224, 3)
    want = (128 / 255.0 - 0.48145466) / 0.26862954
    assert np.allclose(out[0, :, :, 0], want, atol=1e-3)


def test_score_protocol_raw_cosine(model_and_ckpt, tmp_path):
    """clip_score_openclip = mean raw cosine (reference eval_clip_score.py:58-66),
    not the 2.5x clamped torchmetrics variant."""
    from unittest import mock

    from dgq_tpu.eval import open_clip as oc

    m, path = model_and_ckpt
    rng = np.random.RandomState(2)
    images = [rng.randint(0, 255, (IMG, IMG, 3)).astype(np.uint8)
              for _ in range(3)]
    ids = np.zeros((3, CTX), np.int64)
    ids[:, 0] = 1
    ids[:, 1] = VOCAB - 1
    with mock.patch.object(oc, "tokenize", lambda p, d, context=77: ids):
        score = oc.clip_score_openclip(
            images, ["a", "b", "c"], path, tokenizer_dir="unused",
            batch_size=2)
    # independent torch computation of the same protocol (the scorer derives
    # the input size from the checkpoint's pos-embed/patch shapes)
    pre = np.asarray(preprocess_images(np.stack(images), size=IMG))
    with torch.no_grad():
        ie = m.visual(torch.from_numpy(np.transpose(pre, (0, 3, 1, 2)))).numpy()
        te = m.encode_text(torch.from_numpy(ids)).numpy()
    want = float((ie * te).sum(-1).mean())
    assert np.isclose(score, want, atol=1e-4), (score, want)
