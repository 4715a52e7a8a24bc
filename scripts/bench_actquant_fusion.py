#!/usr/bin/env python
"""Does the conv-input activation quantize fuse into its producer, or does it
cost an extra HBM round trip?  Times groupnorm+SiLU+conv3x3 with and without
the shifted-clip codes quantize at the three hot SD widths, and prints the
number of kernel(-ish) fusions from the compiled HLO as a fusion-boundary
diagnostic."""
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from dgq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.layers import _fold_codes
from dgq_tpu.quant.affine import QParams

SHAPES = [(8, 64, 64, 320), (8, 32, 32, 640), (8, 16, 16, 1280)]


def timeit(fn, args, runs=50):
    out = fn(*args)
    np.asarray(jax.device_get(out[:1, :1, :1, :1])).sum()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    np.asarray(jax.device_get(out[:1, :1, :1, :1])).sum()
    return (time.perf_counter() - t0) / runs * 1e3


def gn_silu(x, g, b):
    n, h, w, c = x.shape
    xg = x.reshape(n, h * w, 32, c // 32).astype(jnp.float32)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(n, h, w, c)
    y = y * g + b
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def main():
    qp = QParams(delta=jnp.asarray(0.03, jnp.float32),
                 zero_point=jnp.asarray(128.0, jnp.float32))
    for shape in SHAPES:
        n, h, w_, c = shape
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.float32) * 0.02
        g = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)

        def fp(x, wt, g, b):
            return conv(gn_silu(x, g, b), wt).astype(jnp.bfloat16)

        def quant(x, wt, g, b):
            y = gn_silu(x, g, b)
            q, d = _fold_codes(y, qp, 8)
            return (conv(q, wt) * d).astype(jnp.bfloat16)

        # quantize with NO producer to fuse into (worst case: x straight in)
        def quant_bare(x, wt, g, b):
            q, d = _fold_codes(x, qp, 8)
            return (conv(q, wt) * d).astype(jnp.bfloat16)

        for label, fn in [("gn+silu+conv (fp)", fp),
                          ("gn+silu+quant+conv", quant),
                          ("quant+conv (bare)", quant_bare)]:
            jf = jax.jit(fn)
            ms = timeit(jf, (x, wt, g, b))
            n_fus = jf.lower(x, wt, g, b).compile().as_text().count(" fusion(")
            print(f"{shape} {label:22s} {ms:7.3f} ms  ({n_fus} fusions)")


if __name__ == "__main__":
    main()
