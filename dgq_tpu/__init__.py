"""DGQ-TPU: a TPU-native distribution-aware group quantization framework for
text-to-image diffusion models.

Re-designed from scratch for JAX/XLA/Pallas with the capabilities of the
reference DGQ stack (ICLR 2025, arXiv:2501.04304): W4/W8 weight and A6/A8
activation post-training quantization of the Stable Diffusion v1.4 and
SDXL-turbo UNets, with group-wise activation quantization, time-aware
activation quantizers, and log2 cross-attention softmax quantization.

Design stance (vs the reference's PyTorch fake-quant wrappers):
  * quantizers are pure functions over pytrees (no stateful lazy-init modules)
  * weight fake-quantization is folded at load time (static under jit)
  * the denoising loop is a single `lax.scan`; per-timestep activation
    quantizer parameters live on a leading [T, ...] axis indexed in-scan
  * hot ops run as Pallas TPU kernels (int8 MXU matmul, fused attention
    with in-kernel softmax quantization), with an XLA fake-quant oracle
  * multi-device scaling goes through `jax.sharding.Mesh` + collectives
"""

__version__ = "0.1.0"

from dgq_tpu.models.qconfig import GroupQParams, QConfig, QState  # noqa: F401,E402
from dgq_tpu.quant.affine import QParams  # noqa: F401,E402


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules at package import)."""
    if name in ("SDPipeline", "SDXLTurboPipeline"):
        from dgq_tpu.pipeline import sd_pipeline

        return getattr(sd_pipeline, name)
    if name == "quantize_model_weights":
        from dgq_tpu.calib.weight_calib import quantize_model_weights

        return quantize_model_weights
    raise AttributeError(name)
