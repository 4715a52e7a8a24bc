"""InceptionV3 FID extractor: structure, BN folding parity vs torch, and an
end-to-end FID sanity ordering (fp closer to fp-stats than degraded images).

The reference scores FID via pytorch-fid's InceptionV3
(scripts/eval_scores.sh:23-26); our extractor replicates that architecture
(94 BasicConv2d convs, FID pooling variants) in JAX."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.eval.inception import (
    fid_features,
    inception_pool3,
    inception_probs,
    inception_spec,
    init_inception,
    preprocess_images,
    torch_inception_to_params,
)
from dgq_tpu.eval.scores import frechet_distance, gaussian_stats, inception_score


def test_spec_structure():
    spec = inception_spec()
    assert len(spec) == 94  # torchvision inception_v3 backbone conv count
    # channel arithmetic at the block seams
    by = {s[0]: s for s in spec}
    assert by["Mixed_5b.branch1x1"][1] == 192
    assert by["Mixed_5c.branch1x1"][1] == 64 + 64 + 96 + 32   # 5b out = 256
    assert by["Mixed_5d.branch1x1"][1] == 64 + 64 + 96 + 64   # 5c out = 288
    assert by["Mixed_6b.branch1x1"][1] == 384 + 96 + 288      # 6a out = 768
    assert by["Mixed_7b.branch1x1"][1] == 320 + 192 + 768     # 7a out = 1280
    assert by["Mixed_7c.branch1x1"][1] == 320 + 768 + 768 + 192  # 7b = 2048
    # conv weights: with bn (34,432), fc-1008 (2,065,392) and aux (3,332,848)
    # this reproduces torchvision inception_v3's known 27,161,264 total
    # (after the 1008->1000 class fc deltas of 16,392 + 6,152)
    n = sum(ci * co * k[0] * k[1] for _, ci, co, k, _, _ in spec)
    assert n == 21_751_136


def test_forward_shape_and_fc():
    params = init_inception(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 299, 299, 3)) * 2 - 1
    feats = inception_pool3(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    with pytest.raises(ValueError):
        inception_probs(params, np.zeros((1, 32, 32, 3), np.uint8))


def test_preprocess():
    u8 = np.random.RandomState(0).randint(0, 256, (3, 64, 64, 3), np.uint8)
    x = preprocess_images(u8)
    assert x.shape == (3, 299, 299, 3)
    x = np.asarray(x)
    assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6


def test_bn_folding_parity_vs_torch():
    """conv+BatchNorm(eval) in torch == our folded conv, per BasicConv2d."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    cin, cout, k = 3, 32, 3  # Conv2d_1a_3x3's real shape (spec-checked)
    w = rs.randn(cout, cin, k, k).astype(np.float32) * 0.1
    gamma = rs.uniform(0.5, 1.5, cout).astype(np.float32)
    beta = rs.randn(cout).astype(np.float32) * 0.1
    mean = rs.randn(cout).astype(np.float32) * 0.1
    var = rs.uniform(0.5, 1.5, cout).astype(np.float32)

    state = {"Conv2d_1a_3x3.conv.weight": w, "Conv2d_1a_3x3.bn.weight": gamma,
             "Conv2d_1a_3x3.bn.bias": beta,
             "Conv2d_1a_3x3.bn.running_mean": mean,
             "Conv2d_1a_3x3.bn.running_var": var}
    # fill every other conv with zeros so conversion completes
    for name, ci, co, kk, _, _ in inception_spec()[1:]:
        state[f"{name}.conv.weight"] = np.zeros((co, ci, kk[0], kk[1]), np.float32)
        state[f"{name}.bn.weight"] = np.ones(co, np.float32)
        state[f"{name}.bn.bias"] = np.zeros(co, np.float32)
        state[f"{name}.bn.running_mean"] = np.zeros(co, np.float32)
        state[f"{name}.bn.running_var"] = np.ones(co, np.float32)
    params = torch_inception_to_params(state)

    x = rs.randn(2, cin, 11, 11).astype(np.float32)
    with torch.no_grad():
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2)
        ref = F.batch_norm(ref, torch.from_numpy(mean), torch.from_numpy(var),
                           torch.from_numpy(gamma), torch.from_numpy(beta),
                           training=False, eps=1e-3)
        ref = F.relu(ref).numpy()

    from dgq_tpu.eval.inception import _conv_relu

    sm = {s[0]: s for s in inception_spec()}
    ours = _conv_relu(params, "Conv2d_1a_3x3",
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))), sm)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()


def test_avg_pool_count_include_pad_false():
    """The FID-variant average pool divides by the true window size at the
    border (pytorch-fid's count_include_pad=False change)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from dgq_tpu.eval.inception import _avg_pool_3x3_nopad

    x = np.random.RandomState(1).randn(1, 4, 7, 7).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), 3, stride=1, padding=1,
                       count_include_pad=False).numpy()
    ours = _avg_pool_3x3_nopad(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.allclose(ours, ref, atol=1e-6), np.abs(ours - ref).max()


@pytest.mark.slow
def test_fid_sanity_ordering():
    """FID(clean vs clean-stats) < FID(degraded vs clean-stats) with a fixed
    random extractor — the VERDICT item-7 acceptance shape."""
    params = init_inception(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    base = rs.randint(0, 256, (16, 64, 64, 3), np.uint8)
    clean_a, clean_b = base[:8], base[8:]
    degraded = (clean_b // 64 * 64).astype(np.uint8)  # heavy quantization

    f_ref = fid_features(params, clean_a, batch_size=4)
    mu, sigma = gaussian_stats(f_ref)
    f_clean = fid_features(params, clean_b, batch_size=4)
    f_deg = fid_features(params, degraded, batch_size=4)
    mu_c, sg_c = gaussian_stats(f_clean)
    mu_d, sg_d = gaussian_stats(f_deg)
    fid_clean = frechet_distance(mu_c, sg_c, mu, sigma)
    fid_deg = frechet_distance(mu_d, sg_d, mu, sigma)
    assert np.isfinite(fid_clean) and np.isfinite(fid_deg)
    assert fid_clean < fid_deg, (fid_clean, fid_deg)


@pytest.mark.slow
def test_eval_scores_cli(tmp_path):
    """eval_scores CLI end-to-end on tiny local image dirs (no weights)."""
    from dgq_tpu.cli.eval_scores import main

    rs = np.random.RandomState(0)
    gen_dir, ref_dir = tmp_path / "gen", tmp_path / "ref"
    gen_dir.mkdir(), ref_dir.mkdir()
    try:
        from PIL import Image

        for i in range(4):
            Image.fromarray(rs.randint(0, 256, (32, 32, 3), np.uint8)).save(
                gen_dir / f"{i}.png")
            Image.fromarray(rs.randint(0, 256, (32, 32, 3), np.uint8)).save(
                ref_dir / f"{i}.png")
    except ImportError:
        for i in range(4):
            np.save(gen_dir / f"{i}.npy", rs.randint(0, 256, (32, 32, 3), np.uint8))
            np.save(ref_dir / f"{i}.npy", rs.randint(0, 256, (32, 32, 3), np.uint8))

    out = main(["--gen_dir", str(gen_dir), "--ref_dir", str(ref_dir),
                "--batch", "4"])
    assert "fid" in out and np.isfinite(out["fid"])


def test_load_images_mixed_sizes(tmp_path):
    """Reference-image dirs with mixed sizes resize per-image (pytorch-fid
    behavior) instead of crashing np.stack."""
    pil = pytest.importorskip("PIL.Image")
    from dgq_tpu.cli.eval_scores import load_images

    rs = np.random.RandomState(0)
    for i, (h, w) in enumerate([(64, 48), (48, 64), (32, 32)]):
        pil.fromarray(rs.randint(0, 256, (h, w, 3), np.uint8)).save(
            tmp_path / f"{i}.png")
    imgs = load_images(str(tmp_path))
    assert imgs.shape == (3, 299, 299, 3)


def test_load_images_numeric_order(tmp_path):
    """gen4eval writes unpadded numeric names; load_images must return them in
    numeric (prompt-file) order, not lexicographic — and --limit must take a
    numeric prefix (0..N-1), not a lexicographic one."""
    from dgq_tpu.cli.eval_scores import load_images

    n = 12  # >= 11 so '10.npy' < '2.npy' lexicographically
    for i in range(n):
        np.save(tmp_path / f"{i}.npy", np.full((8, 8, 3), i, np.uint8))
    imgs = load_images(str(tmp_path))
    assert [int(imgs[i, 0, 0, 0]) for i in range(n)] == list(range(n))
    first = load_images(str(tmp_path), limit=3)
    assert [int(first[i, 0, 0, 0]) for i in range(3)] == [0, 1, 2]


def test_inception_score_from_probs():
    rs = np.random.RandomState(0)
    # peaked, diverse predictions -> higher IS than uniform predictions
    peaked = np.eye(10)[rs.randint(0, 10, 100)] * 0.9 + 0.01
    uniform = np.full((100, 10), 0.1)
    is_peaked, _ = inception_score(peaked, splits=2)
    is_uniform, _ = inception_score(uniform, splits=2)
    assert is_peaked > is_uniform


def test_load_images_prompt_rep_stems(tmp_path):
    """gen4eval writes '{prompt_idx}_{rep}' stems; load_images must order by
    (prompt, rep), return the prompt ids for CLIP alignment, and reject raw
    float latents (a no-VAE run) instead of casting them to uint8 garbage."""
    from dgq_tpu.cli.eval_scores import load_images

    for p in range(3):
        for r in range(12):  # n_per_prompt > 10: the old *10 scheme collided
            np.save(tmp_path / f"{p}_{r}.npy",
                    np.full((8, 8, 3), p * 16 + r, np.uint8))
    imgs, ids = load_images(str(tmp_path), with_prompt_ids=True)
    assert imgs.shape[0] == 36
    assert ids == [p for p in range(3) for _ in range(12)]
    assert [int(v) for v in imgs[:, 0, 0, 0]] == [
        p * 16 + r for p in range(3) for r in range(12)]

    np.save(tmp_path / "9_99.npy", np.zeros((8, 8, 4), np.float32))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="latents"):
        load_images(str(tmp_path))
