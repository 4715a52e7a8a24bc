"""Text encoder / VAE structural tests and HF-parity (when torch available)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.pipeline.text_encoder import (
    clip_text_encode,
    hf_clip_text_to_params,
    init_clip_text,
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


def test_vae_decoder_tiny():
    p = init_vae_decoder(jax.random.PRNGKey(0), base=32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    img = vae_decode(p, latents)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    u8 = latents_to_images(img)
    assert u8.dtype == np.uint8 and u8.shape == img.shape


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
