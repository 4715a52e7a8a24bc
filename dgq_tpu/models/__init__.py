"""Model layer: from-scratch functional JAX rewrites of the SD v1.4 and
SDXL-turbo UNets with quantization hook points (the TPU-native counterpart of
the reference's diffusers_rewrite/ + quant wrapper surgery)."""

from dgq_tpu.models.qconfig import QConfig, QState  # noqa: F401
