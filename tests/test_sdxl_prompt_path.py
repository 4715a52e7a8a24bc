"""End-to-end SDXL prompt path: real tokenizers -> dual encoders -> UNet.

Covers the SDXLTurboPipeline.__call__ route (prompts in, images/latents out)
with a minimal constructed CLIP BPE tokenizer — the zero-egress stand-in for
the two real SDXL tokenizers (the second uses '!' padding)."""
import json

import jax
import numpy as np
import pytest

from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.models.unet_sd import init_unet_sd
from dgq_tpu.models.unet_sdxl import sdxl_unet_spec
from dgq_tpu.pipeline.sd_pipeline import SDXLTurboPipeline
from dgq_tpu.pipeline.text_encoder import init_clip_text

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "!": 2}
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return transformers.CLIPTokenizer(
        str(d / "vocab.json"), str(d / "merges.txt"))


def test_sdxl_pipeline_prompts_to_latents(tiny_tokenizer):
    vocab_n = len(tiny_tokenizer.get_vocab())
    base = 32
    w_l, w_g = 32, 48
    pooled = base * 4  # add_embedding expects temb-width pooled embeds
    p_l = init_clip_text(jax.random.PRNGKey(0), vocab=vocab_n, width=w_l,
                         layers=2)
    p_g = init_clip_text(jax.random.PRNGKey(1), vocab=vocab_n, width=w_g,
                         layers=2, proj_dim=pooled)

    spec = sdxl_unet_spec(base=base, cross=w_l + w_g, depths=(1, 1))
    unet = init_unet_sd(jax.random.PRNGKey(2), spec=spec)

    pipe = SDXLTurboPipeline(
        unet_params=unet, cfg=QConfig(),
        text_params_l=p_l, text_params_g=p_g,
        tokenizer=tiny_tokenizer, tokenizer_2=tiny_tokenizer,
        layers_l=2, heads_l=4, layers_g=2, heads_g=4,
    )
    ehs, pooled_out = pipe.encode_prompts(["a cat", "dog"])
    assert ehs.shape == (2, 77, w_l + w_g)
    assert pooled_out.shape == (2, pooled)

    out = pipe(["a cat"], steps=1, height=64, width=64)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(out).all()
