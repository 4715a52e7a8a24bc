"""Calibration data generation: timestep ordering, CFG doubling, caching."""
import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.calib.data import generate_sd_cali_data, synthetic_prompt_embeddings
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec

BASE, CROSS = 32, 64


def test_cali_data_layout(tmp_path):
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    n_prompts = 3
    steps = 2
    text, uncond = synthetic_prompt_embeddings(n_prompts, dim=CROSS, seed=0)
    cache = str(tmp_path / "cali.npz")
    (lmi, t, ehs), interval = generate_sd_cali_data(
        params, text, uncond, steps=steps, scheduler="pndm", latent_hw=16,
        seed=0, cache_path=cache, batch_size=2,
    )
    # PNDM/PLMS runs steps+1 UNet calls; each chunk holds every prompt
    # CFG-doubled (interval = 2 * n_prompts, dataset_generation.py:151-154)
    assert interval == 2 * n_prompts
    n_calls = steps + 1
    assert lmi.shape == (n_calls * interval, 16, 16, 4)
    assert t.shape == (n_calls * interval,)
    assert ehs.shape == (n_calls * interval, 77, CROSS)

    # within a chunk the timestep is constant; chunks are distinct for the
    # non-repeated calls (PLMS repeats the second timestep)
    tn = np.asarray(t)
    for c in range(n_calls):
        chunk = tn[c * interval : (c + 1) * interval]
        assert (chunk == chunk[0]).all()
    assert tn[0] != tn[-1]

    # ehs rows align with their latents: per prompt batch the CFG layout is
    # [uncond_batch | text_batch] (batch_size=2 -> segments [u0,u1,t0,t1,u2,t2])
    e0 = np.asarray(ehs[:interval])
    expect = np.concatenate([
        np.asarray(uncond[:2]), np.asarray(text[:2]),
        np.asarray(uncond[2:]), np.asarray(text[2:]),
    ])
    assert np.allclose(e0, expect, atol=1e-6)

    # cache round-trip is exact
    (lmi2, t2, ehs2), interval2 = generate_sd_cali_data(
        params, text, uncond, steps=steps, scheduler="pndm", latent_hw=16,
        seed=0, cache_path=cache,
    )
    assert interval2 == interval
    assert np.allclose(np.asarray(lmi), np.asarray(lmi2))
    assert np.array_equal(np.asarray(t), np.asarray(t2))


def test_cali_lmi_is_cfg_doubled_latents(tmp_path):
    """The captured latent_model_input is the CFG-doubled latents fed to the
    UNet (first half == second half at each call, since CFG duplicates)."""
    spec = sd_unet_spec(base=BASE, cross=CROSS)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    text, uncond = synthetic_prompt_embeddings(2, dim=CROSS, seed=1)
    (lmi, t, ehs), interval = generate_sd_cali_data(
        params, text, uncond, steps=2, scheduler="ddim", latent_hw=16, seed=1,
    )
    chunk = np.asarray(lmi[:interval])
    assert np.allclose(chunk[:2], chunk[2:], atol=1e-6)


def test_cache_key_covers_weight_source(tmp_path):
    """The CLI-facing cache key is derived inside build_cali_data from the
    actual generation inputs, including a content fingerprint of the weights:
    two different weight sets with identical flags must NOT share a cache
    file (stale-cache reuse across --unet_weights / --cali_ckpt sources)."""
    from dgq_tpu.cli.common import _params_fingerprint, build_cali_data
    from dgq_tpu.models.unet_sd import unet_sd_apply

    spec = sd_unet_spec(base=BASE, cross=CROSS)
    p0 = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    p1 = init_unet_sd(jax.random.PRNGKey(1), spec=spec)
    f0, f1 = _params_fingerprint(p0), _params_fingerprint(p1)
    assert f0 != f1
    assert f0 == _params_fingerprint(p0)  # deterministic

    prefix = str(tmp_path / "cali")
    # steps=2 so later chunks carry weight-dependent latents (the steps=1
    # capture is just the initial noise, identical for any weights)
    kwargs = dict(n_prompts=2, steps=2, latent_hw=16, seed=0,
                  cache_prefix=prefix)
    (lmi0, *_), _ = build_cali_data("sd", p0, unet_sd_apply, CROSS, **kwargs)
    (lmi1, *_), _ = build_cali_data("sd", p1, unet_sd_apply, CROSS, **kwargs)
    import glob

    files = sorted(glob.glob(prefix + "*"))
    assert len(files) == 2, files  # one cache per weight set
    assert not np.allclose(np.asarray(lmi0), np.asarray(lmi1))


def test_load_prompts_json_and_txt(tmp_path):
    """COCO annotations json (reference get_prompts, dataset_generation.py:
    12-19) and plain-text prompt files both load; sampling is seeded."""
    import json

    from dgq_tpu.cli.common import load_prompts

    coco = tmp_path / "captions.json"
    coco.write_text(json.dumps({
        "annotations": [{"caption": f"caption {i}", "id": i} for i in range(20)]
    }))
    got = load_prompts(str(coco), 5, seed=0)
    assert len(got) == 5 and all(g.startswith("caption ") for g in got)
    assert got == load_prompts(str(coco), 5, seed=0)  # seeded
    assert got != load_prompts(str(coco), 5, seed=1)

    txt = tmp_path / "prompts.txt"
    txt.write_text("a\nb\n\nc\n")
    assert load_prompts(str(txt), 10) == ["a", "b", "c"]  # in order, no pad
    assert len(load_prompts(str(txt), 2, seed=3)) == 2


def test_encode_cali_prompts_sdxl_dual_encoder(tmp_path):
    """The SDXL branch of encode_cali_prompts runs both encoders and returns
    (ehs 768+proj concat-wide, pooled) matching sdxl_encode_prompt run
    directly on the same weights."""
    import json

    import torch
    from transformers.models.clip.tokenization_clip import bytes_to_unicode

    from dgq_tpu.cli.common import encode_cali_prompts
    from dgq_tpu.pipeline.text_encoder import (
        clip_meta_from_params,
        hf_clip_text_to_params,
        sdxl_encode_prompt,
    )

    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    (tok_dir / "merges.txt").write_text("#version: 0.2\n")

    def tiny_clip_state(width, proj=0, seed=0):
        g = torch.Generator().manual_seed(seed)
        sd = {
            "text_model.embeddings.token_embedding.weight":
                torch.randn(len(vocab), width, generator=g) * 0.02,
            "text_model.embeddings.position_embedding.weight":
                torch.randn(77, width, generator=g) * 0.01,
            "text_model.final_layer_norm.weight": torch.ones(width),
            "text_model.final_layer_norm.bias": torch.zeros(width),
        }
        for i in range(2):
            pre = f"text_model.encoder.layers.{i}"
            for ln in ("layer_norm1", "layer_norm2"):
                sd[f"{pre}.{ln}.weight"] = torch.ones(width)
                sd[f"{pre}.{ln}.bias"] = torch.zeros(width)
            for nm, (o, i_) in {
                "self_attn.q_proj": (width, width),
                "self_attn.k_proj": (width, width),
                "self_attn.v_proj": (width, width),
                "self_attn.out_proj": (width, width),
                "mlp.fc1": (width * 4, width), "mlp.fc2": (width, width * 4),
            }.items():
                sd[f"{pre}.{nm}.weight"] = torch.randn(o, i_, generator=g) * 0.02
                sd[f"{pre}.{nm}.bias"] = torch.zeros(o)
        if proj:
            sd["text_projection.weight"] = torch.randn(proj, width, generator=g) * 0.02
        return sd

    w1 = tmp_path / "te1.bin"
    w2 = tmp_path / "te2.bin"
    sd1, sd2 = tiny_clip_state(64, seed=0), tiny_clip_state(128, proj=96, seed=1)
    torch.save(sd1, str(w1))
    torch.save(sd2, str(w2))

    prompts = ["a cat", "two dogs playing"]
    ehs, pooled = encode_cali_prompts(
        "sdxl", prompts, str(w1), str(tok_dir),
        text_weights_2=str(w2), tokenizer_2_path=str(tok_dir))
    assert ehs.shape == (2, 77, 64 + 128)
    assert pooled.shape == (2, 96)

    # oracle: direct dual-encoder call on the same ids/weights
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(str(tok_dir))
    ids = tok(prompts, padding="max_length", max_length=77, truncation=True,
              return_tensors="np").input_ids
    p1 = hf_clip_text_to_params({k: v.numpy() for k, v in sd1.items()})
    p2 = hf_clip_text_to_params({k: v.numpy() for k, v in sd2.items()})
    l1, h1 = clip_meta_from_params(p1)
    l2, h2 = clip_meta_from_params(p2)
    ref_ehs, ref_pooled = sdxl_encode_prompt(
        p1, p2, jnp.asarray(ids), jnp.asarray(ids),
        layers_l=l1, heads_l=h1, layers_g=l2, heads_g=h2,
        eos_id=tok.eos_token_id)
    assert np.allclose(np.asarray(ehs), np.asarray(ref_ehs), atol=1e-5)
    assert np.allclose(np.asarray(pooled), np.asarray(ref_pooled), atol=1e-5)
