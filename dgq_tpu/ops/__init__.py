"""Hot-path ops: XLA fake-quant oracle implementations and Pallas TPU kernels
(int8 MXU matmul, fused quantized attention)."""
