"""Text-to-image pipeline layer: schedulers, text encoder, VAE, and the
scanned denoising loop (TPU-native counterpart of the reference's vendored
diffusers pipelines)."""
