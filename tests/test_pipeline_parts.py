"""Text encoder / VAE structural tests and HF-parity (when torch available)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.pipeline.text_encoder import (
    clip_text_encode,
    clip_text_pooled,
    hf_clip_text_to_params,
    init_clip_text,
    sdxl_encode_prompt,
)
from dgq_tpu.pipeline.vae import (
    init_vae_decoder,
    latents_to_images,
    vae_decode,
    vae_decoder_spec,
)


def test_clip_text_tiny_forward():
    p = init_clip_text(jax.random.PRNGKey(0), vocab=100, width=64, layers=2)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 77)))
    out = clip_text_encode(p, ids, num_layers=2, num_heads=4)
    assert out.shape == (2, 77, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_causality():
    """Changing a later token must not affect earlier positions (causal mask)."""
    p = init_clip_text(jax.random.PRNGKey(0), vocab=100, width=64, layers=2)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 100, (1, 77))
    ids2 = ids.copy()
    ids2[0, 50] = (ids2[0, 50] + 1) % 100
    o1 = clip_text_encode(p, jnp.asarray(ids), num_layers=2, num_heads=4)
    o2 = clip_text_encode(p, jnp.asarray(ids2), num_layers=2, num_heads=4)
    assert np.allclose(np.asarray(o1)[0, :50], np.asarray(o2)[0, :50], atol=1e-5)
    assert not np.allclose(np.asarray(o1)[0, 50:], np.asarray(o2)[0, 50:])


def test_clip_parity_vs_hf_torch():
    """Build a tiny HF CLIPTextModel, convert, compare outputs."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import CLIPTextConfig, CLIPTextModel
    except Exception:
        pytest.skip("transformers unavailable")

    config = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModel(config).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hf_clip_text_to_params(state)

    ids = np.random.RandomState(2).randint(0, 99, (2, 77))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = clip_text_encode(params, jnp.asarray(ids), num_layers=2, num_heads=4)
    assert np.allclose(np.asarray(ours), ref, atol=2e-4), np.abs(np.asarray(ours) - ref).max()


def test_clip_with_projection_parity_vs_hf():
    """SDXL encoder-2 semantics: penultimate hidden states (hidden_states[-2])
    and projected pooled output vs a tiny HF CLIPTextModelWithProjection with
    hidden_act='gelu' (the OpenCLIP-bigG configuration)."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    except Exception:
        pytest.skip("transformers unavailable")

    config = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, projection_dim=24,
        max_position_embeddings=77, hidden_act="gelu", eos_token_id=98,
    )
    torch.manual_seed(1)
    model = CLIPTextModelWithProjection(config).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hf_clip_text_to_params(state)
    assert params["text_projection"].shape == (32, 24)

    # real-tokenizer shape: tokens then EOS (the vocab max — argmax pooling
    # and HF's find-first-eos agree, as for the real 49407 EOS)
    rs = np.random.RandomState(3)
    ids = rs.randint(0, 98, (2, 77))
    ids[0, 9] = 98
    ids[0, 10:] = 98  # tokenizer-1 style: pad == eos
    ids[1, 33] = 98
    ids[1, 34:] = 0   # tokenizer-2 style: pad '!' (id 0)
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    ref_penult = out.hidden_states[-2].numpy()
    ref_pooled = out.text_embeds.numpy()

    ours_penult = clip_text_encode(params, jnp.asarray(ids), num_layers=3,
                                   num_heads=4, act="gelu", skip_last=1)
    ours_pooled = clip_text_pooled(params, jnp.asarray(ids), num_layers=3,
                                   num_heads=4, act="gelu", eos_id=98)
    assert np.allclose(np.asarray(ours_penult), ref_penult, atol=2e-4), \
        np.abs(np.asarray(ours_penult) - ref_penult).max()
    assert np.allclose(np.asarray(ours_pooled), ref_pooled, atol=2e-4), \
        np.abs(np.asarray(ours_pooled) - ref_pooled).max()


def test_sdxl_encode_prompt_shapes():
    """Dual-encoder concat: (B,77,w_l+w_g) hidden states + (B,proj) pooled."""
    p_l = init_clip_text(jax.random.PRNGKey(0), vocab=100, width=32, layers=2)
    p_g = init_clip_text(jax.random.PRNGKey(1), vocab=100, width=48, layers=3,
                         proj_dim=48)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 77)))
    ehs, pooled = sdxl_encode_prompt(p_l, p_g, ids, ids,
                                     layers_l=2, heads_l=4,
                                     layers_g=3, heads_g=4)
    assert ehs.shape == (2, 77, 32 + 48)
    assert pooled.shape == (2, 48)
    assert np.isfinite(np.asarray(ehs)).all()
    assert np.isfinite(np.asarray(pooled)).all()


def test_sdxl_encode_prompt_single_pass_consistency():
    """The fused bigG forward (penultimate captured alongside the pooled
    output) must equal the two separate-function computations."""
    from dgq_tpu.pipeline.text_encoder import clip_text_pooled

    p_l = init_clip_text(jax.random.PRNGKey(2), vocab=50, width=32, layers=2)
    p_g = init_clip_text(jax.random.PRNGKey(3), vocab=50, width=32, layers=3,
                         proj_dim=24)
    rs = np.random.RandomState(1)
    ids = rs.randint(1, 48, (2, 77))
    ids[:, 10] = 49  # EOS mid-sequence
    ids[:, 11:] = 0
    ids = jnp.asarray(ids)

    ehs, pooled = sdxl_encode_prompt(p_l, p_g, ids, ids, layers_l=2,
                                     heads_l=4, layers_g=3, heads_g=4,
                                     eos_id=49)
    h_g_ref = clip_text_encode(p_g, ids, 3, 4, act="gelu", skip_last=1)
    pooled_ref = clip_text_pooled(p_g, ids, 3, 4, act="gelu", eos_id=49)
    assert np.allclose(np.asarray(ehs[..., 32:]), np.asarray(h_g_ref),
                       atol=1e-6)
    assert np.allclose(np.asarray(pooled), np.asarray(pooled_ref), atol=1e-6)


def test_vae_decoder_tiny():
    p = init_vae_decoder(jax.random.PRNGKey(0), base=32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    img = vae_decode(p, latents)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    u8 = latents_to_images(img)
    assert u8.dtype == np.uint8 and u8.shape == img.shape


def test_vae_attn_flash_matches_xla():
    """The mid-block attention switches to the flash kernel at >=1024 tokens;
    both paths must agree (single head, h*w tokens)."""
    from dgq_tpu.pipeline.vae import _attn

    c = 32  # group_norm runs 32 groups; c must divide
    p = {
        "a.group_norm": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
    }
    key = jax.random.PRNGKey(2)
    for nm in ["to_q", "to_k", "to_v", "to_out.0"]:
        key, k1, k2 = jax.random.split(key, 3)
        p[f"a.{nm}"] = {"w": jax.random.normal(k1, (c, c)) * 0.1,
                        "b": jax.random.normal(k2, (c,)) * 0.01}
    x_small = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, c))
    x_big = jnp.tile(x_small, (1, 2, 4, 1))  # 32x64 = 2048 tokens >= 1024

    out_big = _attn(p, "a", x_big)  # flash path (interpret on CPU)
    # reference: force the XLA path on the same tokens by calling the
    # materialized formula directly
    b, h, w, _ = x_big.shape
    from dgq_tpu.models.layers import group_norm

    xn = jnp.reshape(group_norm(p["a.group_norm"], x_big, eps=1e-6),
                     (b, h * w, c))
    q = jnp.dot(xn, p["a.to_q"]["w"]) + p["a.to_q"]["b"]
    k_ = jnp.dot(xn, p["a.to_k"]["w"]) + p["a.to_k"]["b"]
    v = jnp.dot(xn, p["a.to_v"]["w"]) + p["a.to_v"]["b"]
    scores = jnp.einsum("btc,bsc->bts", q, k_) * (c ** -0.5)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bts,bsc->btc", attn, v)
    o = jnp.dot(o, p["a.to_out.0"]["w"]) + p["a.to_out.0"]["b"]
    ref = jnp.reshape(o, (b, h, w, c)) + x_big
    assert np.allclose(np.asarray(out_big), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out_big) - np.asarray(ref)).max()


def test_vae_attn_chunked_matches_flash(monkeypatch):
    """Decodes whose K+V exceed the flash kernel's VMEM budget (SDXL 1024px
    mid-block) take the exact chunked-softmax path; it must agree with the
    flash path on the same inputs."""
    import dgq_tpu.pipeline.vae as V

    c = 32
    p = {
        "a.group_norm": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
    }
    key = jax.random.PRNGKey(4)
    for nm in ["to_q", "to_k", "to_v", "to_out.0"]:
        key, k1, k2 = jax.random.split(key, 3)
        p[f"a.{nm}"] = {"w": jax.random.normal(k1, (c, c)) * 0.1,
                        "b": jax.random.normal(k2, (c,)) * 0.01}
    # 64*80 = 5120 tokens: >= 4096 so a sub-budget patch routes to the
    # chunked path, and not a multiple of the 1024 chunk (exercises padding)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 80, c))

    ref = V._attn(p, "a", x)  # flash path (interpret on CPU)
    monkeypatch.setattr(V, "FLASH_KV_VMEM_BUDGET", 1)
    out = V._attn(p, "a", x)  # chunked path
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_vae_spec_param_count_full():
    n = 0
    for name, kind, meta in vae_decoder_spec(base=128):
        if kind == "conv":
            cin, cout, k, _, _ = meta
            n += cin * cout * k * k + cout
        elif kind == "linear":
            cin, cout, _ = meta
            n += cin * cout + cout
        else:
            (c,) = meta
            n += 2 * c
    # SD VAE decoder ~49.5M params
    assert 45e6 < n < 55e6, n


def test_time_aware_rejects_nondividing_steps():
    """The reference slot map act_{(1000-t)//(1000//steps)} is undefined when
    steps does not divide 1000 (its loader KeyErrors on the missing chunk);
    dynamic_index_in_dim would silently clamp instead, so the samplers must
    reject loudly."""
    from dgq_tpu.pipeline.sampler import check_time_aware_steps, sd_sample

    qs = {"a": {}, "sm": {}}
    with pytest.raises(ValueError, match="dividing 1000"):
        check_time_aware_steps(30, True, qs)
    check_time_aware_steps(30, True, None)   # fp run: fine
    check_time_aware_steps(25, True, qs)     # reference SD default: fine
    with pytest.raises(ValueError, match="dividing 1000"):
        sd_sample({}, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 77, 64)),
                  jnp.zeros((1, 77, 64)), num_inference_steps=30,
                  time_aware=True, qstate=qs)


def test_sdxl_pipeline_uses_sdxl_vae_scale():
    """SDXL's AutoencoderKL scaling_factor is 0.13025, not SD's 0.18215 —
    decoding SDXL latents with the SD scale washes every pixel by ~0.715x."""
    from dgq_tpu.pipeline.vae import SD_VAE_SCALE, SDXL_VAE_SCALE
    import inspect

    from dgq_tpu.pipeline import sd_pipeline

    assert SDXL_VAE_SCALE == pytest.approx(0.13025)
    assert SD_VAE_SCALE == pytest.approx(0.18215)
    src = inspect.getsource(sd_pipeline.SDXLTurboPipeline)
    assert "SDXL_VAE_SCALE" in src
