"""Pallas TPU kernels for the quantized deploy path."""
