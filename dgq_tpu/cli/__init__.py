"""Command-line entry points, mirroring the reference's src/ CLIs:
quantize-weight, quantize-act, infer, gen4eval, merge, flops."""
