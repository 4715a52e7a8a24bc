"""Layout-aware GroupNorm/LayerNorm: parity vs the naive two-pass form.

The rewritten norms (models/layers.py) compute per-channel sum/sum-of-squares
over well-shaped axes and fold normalize+affine into one x*A+B pass; variance
uses the one-pass E[x^2]-E[x]^2 form in f32. These tests pin the rewrite to
the naive definition at f32 and at bf16 inputs with off-center distributions
(mean/std ~ 3), the regime where one-pass variance would first lose accuracy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.models.layers import group_norm, layer_norm


def _gn_naive(p, x, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xg = jnp.reshape(x, (b, h * w, groups, c // groups)).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = (jnp.reshape(xg, (b, h, w, c)) * p["scale"].astype(jnp.float32)
           + p["bias"].astype(jnp.float32))
    return out


@pytest.mark.parametrize("shape", [(2, 16, 16, 320), (3, 8, 8, 640)])
def test_group_norm_matches_naive(shape):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3.0 + 2.5
    p = {"scale": jax.random.normal(jax.random.PRNGKey(1), (c,)),
         "bias": jax.random.normal(jax.random.PRNGKey(2), (c,))}
    ref = _gn_naive(p, x)
    got = group_norm(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)
    # bf16 input path: stats still f32, output rounded once to bf16
    got_b = group_norm(
        {k: v.astype(jnp.bfloat16) for k, v in p.items()},
        x.astype(jnp.bfloat16))
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_b, np.float32), np.asarray(ref),
                               rtol=0, atol=0.12)


def test_layer_norm_matches_naive():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 77, 768), jnp.float32) * 2 + 1.5
    p = {"scale": jax.random.normal(jax.random.PRNGKey(1), (768,)),
         "bias": jax.random.normal(jax.random.PRNGKey(2), (768,))}
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    ref = (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    got = layer_norm(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)
