"""prepare_pipeline: one-call assembly from a local HF-style snapshot tree
(the reference's prepare_pipe, src/utils.py:16-53)."""
import jax
import numpy as np
import pytest

from dgq_tpu.models.qconfig import QConfig
from dgq_tpu.pipeline.prepare import prepare_pipeline

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    """Tiny snapshot dir: unet + text_encoder in torch key format."""
    from dgq_tpu.io.convert import params_to_torch_unet
    from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec

    root = tmp_path_factory.mktemp("snap")
    spec = sd_unet_spec(base=32)
    params = init_unet_sd(jax.random.PRNGKey(0), spec=spec)
    (root / "unet").mkdir()
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in
         params_to_torch_unet(params, spec).items()},
        root / "unet" / "diffusion_pytorch_model.bin",
    )

    try:
        from transformers import CLIPTextConfig, CLIPTextModel

        config = CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
        )
        (root / "text_encoder").mkdir()
        torch.save(CLIPTextModel(config).state_dict(),
                   root / "text_encoder" / "pytorch_model.bin")
    except Exception:
        pass
    return root


def test_prepare_sd(snapshot):
    pipe = prepare_pipeline("sd", str(snapshot), base=32,
                            cfg=QConfig(w_bits=8, use_wq=False))
    assert pipe.unet_params["conv_in"]["w"].shape[-1] == 32
    # vae/ and tokenizer/ absent -> None, pipeline still constructs
    assert pipe.vae_params is None
    with pytest.raises(RuntimeError):
        pipe.encode_prompts(["a cat"])
    # embeddings path works without the missing parts (latents out)
    ehs = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 768))
    out = pipe.generate_from_embeddings(ehs, ehs, steps=1, height=64, width=64)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(out).all()


def test_prepare_sd_missing_unet(tmp_path):
    with pytest.raises(FileNotFoundError):
        prepare_pipeline("sd", str(tmp_path), base=32)


def test_prepare_sdxl_with_override_params(snapshot):
    """SDXL path with unet_params passed directly (no sdxl snapshot needed)."""
    from dgq_tpu.models.unet_sd import init_unet_sd
    from dgq_tpu.models.unet_sdxl import sdxl_unet_spec

    spec = sdxl_unet_spec(base=32, depths=(1, 1))
    params = init_unet_sd(jax.random.PRNGKey(2), spec=spec)
    pipe = prepare_pipeline("sdxl", str(snapshot), unet_params=params)
    assert pipe.text_params_g is None
    with pytest.raises(RuntimeError):
        pipe.encode_prompts(["a dog"])
