"""Native ImageReward scorer parity vs the transformers BLIP oracle.

ImageReward-v1.0 (the reference's scorer, eval_ImageReward_score.py:25-50) is
BLIP: a timm-style ViT vision tower + a BERT text encoder with per-layer
cross-attention, plus a linear MLP reward head. transformers' BlipVisionModel
/ BlipTextModel are direct ports of BLIP's vit.py / med.py, so tiny
random-weight instances serve as an independent torch oracle. The fixture
saves the oracle's weights under the exact ImageReward checkpoint names
(`blip.visual_encoder.*` timm naming, `blip.text_encoder.*` med/BERT naming,
`mlp.layers.*`), so a real ImageReward.pt loads through the same path.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from dgq_tpu.eval.image_reward import (  # noqa: E402
    IR_MEAN,
    IR_STD,
    encode_text_cross,
    encode_vision,
    load_image_reward,
    reward_head,
)

# vision: hidden 32, 4 heads, 2 layers, 32px / patch 8 -> 17 tokens
VW, VHEADS, IMG, PATCH = 32, 4, 32, 8
# text: hidden 24, 3 heads, 2 layers, vocab 64
TW, THEADS, VOCAB, CTX = 24, 3, 64, 12


def _vision_rename(k: str) -> str:
    """transformers BlipVisionModel names -> BLIP vit.py (timm) names."""
    k = (k.replace("embeddings.class_embedding", "cls_token")
          .replace("embeddings.position_embedding", "pos_embed")
          .replace("embeddings.patch_embedding", "patch_embed.proj")
          .replace("post_layernorm", "norm"))
    k = k.replace("encoder.layers.", "blocks.")
    k = (k.replace("self_attn.qkv", "attn.qkv")
          .replace("self_attn.projection", "attn.proj")
          .replace("layer_norm1", "norm1")
          .replace("layer_norm2", "norm2"))
    return k


@pytest.fixture(scope="module")
def oracle_and_ckpt(tmp_path_factory):
    from transformers import (
        BlipTextConfig,
        BlipTextModel,
        BlipVisionConfig,
        BlipVisionModel,
    )

    torch.manual_seed(0)
    vc = BlipVisionConfig(
        hidden_size=VW, intermediate_size=2 * VW, num_hidden_layers=2,
        num_attention_heads=VHEADS, image_size=IMG, patch_size=PATCH,
        layer_norm_eps=1e-6, hidden_act="gelu")
    # is_decoder=True creates the per-layer cross-attention (med.py layout);
    # causality is a separate runtime flag we leave off below
    tc = BlipTextConfig(
        hidden_size=TW, intermediate_size=2 * TW, num_hidden_layers=2,
        num_attention_heads=THEADS, encoder_hidden_size=VW, vocab_size=VOCAB,
        max_position_embeddings=40, is_decoder=True, layer_norm_eps=1e-12,
        hidden_act="gelu")
    vis = BlipVisionModel(vc).eval()
    txt = BlipTextModel(tc, add_pooling_layer=False).eval()
    # published head: Linear stack with inactive Dropouts between (so the
    # Linears sit at Sequential indices 0,2,4)
    head = torch.nn.Sequential(
        torch.nn.Linear(TW, 16), torch.nn.Dropout(0.2),
        torch.nn.Linear(16, 8), torch.nn.Dropout(0.2),
        torch.nn.Linear(8, 1)).eval()

    sd = {}
    for k, v in vis.state_dict().items():
        sd[f"blip.visual_encoder.{_vision_rename(k)}"] = v
    for k, v in txt.state_dict().items():
        sd[f"blip.text_encoder.{k}"] = v
    for k, v in head.state_dict().items():
        sd[f"mlp.layers.{k}"] = v
    path = str(tmp_path_factory.mktemp("ir") / "ImageReward.pt")
    torch.save(sd, path)
    return vis, txt, head, path


def _rand_images(n, seed):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, IMG, IMG, 3) * 0.5).astype(np.float32)


def _rand_tokens(n, seed):
    rng = np.random.RandomState(seed)
    ids = np.zeros((n, CTX), np.int64)
    mask = np.zeros((n, CTX), np.int64)
    for i in range(n):
        ln = rng.randint(3, CTX + 1)
        ids[i, :ln] = rng.randint(1, VOCAB, ln)
        mask[i, :ln] = 1
    return ids, mask


def test_vision_tower_parity(oracle_and_ckpt):
    vis, _, _, path = oracle_and_ckpt
    params = load_image_reward(path)
    imgs = _rand_images(3, 0)
    with torch.no_grad():
        ref = vis(torch.from_numpy(
            np.transpose(imgs, (0, 3, 1, 2)))).last_hidden_state.numpy()
    ours = np.asarray(encode_vision(params["visual"], jnp.asarray(imgs),
                                    heads=VHEADS))
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=2e-5), np.abs(ours - ref).max()


def test_text_tower_cross_attention_parity(oracle_and_ckpt):
    vis, txt, _, path = oracle_and_ckpt
    params = load_image_reward(path)
    imgs = _rand_images(4, 1)
    ids, mask = _rand_tokens(4, 2)
    with torch.no_grad():
        v_out = vis(torch.from_numpy(
            np.transpose(imgs, (0, 3, 1, 2)))).last_hidden_state
        ref = txt(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=v_out,
            encoder_attention_mask=torch.ones(v_out.shape[:2],
                                              dtype=torch.long),
            is_decoder=False,
        ).last_hidden_state.numpy()
    img_tok = encode_vision(params["visual"], jnp.asarray(imgs),
                            heads=VHEADS)
    ours = np.asarray(encode_text_cross(
        params["text"], jnp.asarray(ids), jnp.asarray(mask), img_tok,
        heads=THEADS))
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=2e-5), np.abs(ours - ref).max()


def test_reward_head_and_normalization(oracle_and_ckpt):
    _, _, head, path = oracle_and_ckpt
    params = load_image_reward(path)
    feats = np.random.RandomState(3).randn(5, TW).astype(np.float32)
    with torch.no_grad():
        raw = head(torch.from_numpy(feats)).numpy()[:, 0]
    want = (raw - IR_MEAN) / IR_STD
    got = np.asarray(reward_head(params["mlp"], jnp.asarray(feats)))
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_score_native_end_to_end(oracle_and_ckpt):
    """Full protocol vs an independent torch composition of the oracle
    (sharing only the preprocessing, itself tested in test_open_clip)."""
    from unittest import mock

    from dgq_tpu.eval import image_reward as ir

    vis, txt, head, path = oracle_and_ckpt
    rng = np.random.RandomState(4)
    images = [rng.randint(0, 255, (48, 40, 3)).astype(np.uint8)
              for _ in range(3)]
    ids, mask = _rand_tokens(3, 5)
    with mock.patch.object(ir, "tokenize_ir",
                           lambda p, d, max_length=35: (ids, mask)):
        score = ir.image_reward_score_native(
            images, ["a", "b", "c"], path, tokenizer_dir="unused",
            batch_size=2, vision_heads=VHEADS, text_heads=THEADS,
            image_size=IMG)
    pre = np.asarray(ir.preprocess_images(np.stack(images), IMG))
    with torch.no_grad():
        v_out = vis(torch.from_numpy(
            np.transpose(pre, (0, 3, 1, 2)))).last_hidden_state
        t_out = txt(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=v_out,
            encoder_attention_mask=torch.ones(v_out.shape[:2],
                                              dtype=torch.long),
            is_decoder=False,
        ).last_hidden_state[:, 0, :]
        raw = head(t_out).numpy()[:, 0]
    want = float(((raw - IR_MEAN) / IR_STD).mean())
    assert np.isclose(score, want, atol=1e-4), (score, want)


def test_eval_scores_cli_image_reward(oracle_and_ckpt, tmp_path):
    """eval_scores CLI wires --image_reward_ckpt through prompt alignment
    (ViT-L/BERT-base default head counts divide the tiny widths, so the
    score is finite; numeric parity is covered by the direct tests)."""
    pil = pytest.importorskip("PIL.Image")
    from dgq_tpu.cli.eval_scores import main

    *_, ckpt = oracle_and_ckpt
    rs = np.random.RandomState(7)
    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    for i in range(3):
        pil.fromarray(rs.randint(0, 256, (IMG, IMG, 3), np.uint8)).save(
            gen_dir / f"{i}_0.png")
    (tmp_path / "prompts.csv").write_text("caption\na cat\na dog\na mat\n")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "cat", "dog", "mat"]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab) + "\n")
    out = main(["--gen_dir", str(gen_dir),
                "--prompts", str(tmp_path / "prompts.csv"),
                "--image_reward_ckpt", ckpt,
                "--ir_tokenizer", str(tok_dir), "--batch", "2"])
    assert np.isfinite(out["image_reward"])


def test_tokenize_ir_protocol(tmp_path):
    """BertTokenizer padding='max_length' / truncation semantics from a local
    vocab (the published scorer tokenizes with max_length=35)."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "cat", "on", "the", "mat"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    from dgq_tpu.eval.image_reward import tokenize_ir

    ids, mask = tokenize_ir(["a cat", "a cat on the mat " * 20],
                            str(tmp_path), max_length=8)
    assert ids.shape == mask.shape == (2, 8)
    # [CLS] a cat [SEP] [PAD]...
    assert list(ids[0, :4]) == [2, 5, 6, 3]
    assert list(mask[0]) == [1, 1, 1, 1, 0, 0, 0, 0]
    # overflow: truncated to max_length with trailing [SEP], fully attended
    assert ids[1, 0] == 2 and ids[1, -1] == 3
    assert mask[1].sum() == 8
