"""Pallas kernel numerics vs XLA oracles (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgq_tpu.ops.pallas.attention import attention_reference, fused_attention
from dgq_tpu.ops.pallas.int8_matmul import (
    pack_weight_int8,
    quantized_matmul,
    quantized_matmul_reference,
)
from dgq_tpu.quant.affine import QParams
from dgq_tpu.quant.scalers import Scaler, init_scale


def rand(*shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale
    )


class TestInt8Matmul:
    def test_reference_math_matches_fake_quant(self):
        """The factored integer math == fake-quant matmul."""
        from dgq_tpu.quant.affine import fake_quant
        from dgq_tpu.calib.weight_calib import init_layer_wqp

        x = rand(16, 64, seed=0)
        w = rand(64, 32, seed=1, scale=0.1)
        wqp = init_layer_wqp(w, "linear", 8, Scaler.MINMAX)  # (1, 32) broadcast
        xqp = init_scale(x, 8, Scaler.MINMAX)
        wq, wd, wz = pack_weight_int8(w, wqp.delta, wqp.zero_point, bits=8)
        y_int = quantized_matmul_reference(
            x, wq, wd, wz, xqp.delta, xqp.zero_point - 128.0
        )
        x_dq = fake_quant(x, xqp, 8)
        w_dq = fake_quant(w, QParams(wqp.delta, wqp.zero_point), 8)
        y_fq = x_dq @ w_dq
        assert np.allclose(np.asarray(y_int), np.asarray(y_fq), atol=1e-3), \
            np.abs(np.asarray(y_int) - np.asarray(y_fq)).max()

    @pytest.mark.parametrize("mnk", [(16, 32, 64), (100, 130, 257)])
    def test_kernel_matches_reference(self, mnk):
        m, n, k = mnk
        x = rand(m, k, seed=2)
        w = rand(k, n, seed=3, scale=0.1)
        from dgq_tpu.calib.weight_calib import init_layer_wqp

        wqp = init_layer_wqp(w, "linear", 8, Scaler.MINMAX)
        xqp = init_scale(x, 8, Scaler.MINMAX)
        wq, wd, wz = pack_weight_int8(w, wqp.delta, wqp.zero_point, bits=8)
        bias = rand(n, seed=4)
        ref = quantized_matmul_reference(
            x, wq, wd, wz, xqp.delta, xqp.zero_point - 128.0, bias
        )
        # kernel-vs-reference in interpret mode is covered by
        # tests/test_int8_path.py; here validate the factored zero-point
        # math against a direct float recomputation:
        xq = jnp.clip(jnp.round(x / xqp.delta) + (xqp.zero_point - 128.0), -128, 127)
        manual = (
            xqp.delta * wd[None, :] * (
                xq @ wq.astype(jnp.float32)
                - (xqp.zero_point - 128.0) * jnp.sum(wq.astype(jnp.float32), 0)[None, :]
                - wz[None, :] * jnp.sum(xq, 1, keepdims=True)
                + k * (xqp.zero_point - 128.0) * wz[None, :]
            ) + bias[None, :]
        )
        assert np.allclose(np.asarray(ref), np.asarray(manual), atol=1e-4)


class TestFusedAttention:
    @pytest.mark.parametrize("t,s,d", [(64, 64, 40), (128, 77, 64)])
    def test_flash_fp_matches_reference(self, t, s, d):
        q = rand(2, t, d, seed=0, scale=0.5)
        k = rand(2, s, d, seed=1, scale=0.5)
        v = rand(2, s, d, seed=2)
        scale = d ** -0.5
        ref = attention_reference(q, k, v, scale)
        out = fused_attention(q, k, v, scale, sm_mode="none",
                              block_t=32, block_s=128, interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
            np.abs(np.asarray(out) - np.asarray(ref)).max()

    @pytest.mark.parametrize("mode", ["log2_real_time", "log2", "uniform"])
    def test_quantized_matches_reference(self, mode):
        t, s, d = 64, 77, 40
        q = rand(2, t, d, seed=3, scale=0.5)
        k = rand(2, s, d, seed=4, scale=0.5)
        v = rand(2, s, d, seed=5)
        scale = d ** -0.5
        delta = jnp.asarray(0.9) if mode != "log2_real_time" else None
        ref = attention_reference(q, k, v, scale, sm_mode=mode, sm_bits=8,
                                  sm_delta=delta)
        out = fused_attention(q, k, v, scale, sm_mode=mode, sm_bits=8,
                              sm_delta=delta, block_t=32, block_s=128,
                              interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
            np.abs(np.asarray(out) - np.asarray(ref)).max()

    @pytest.mark.parametrize("sp", [False, True])
    def test_real_time_two_call_impl(self, sp):
        """The alternate two-pallas_call real_time structure (rt_impl) stays
        numerically identical to the oracle and the default fused kernel."""
        t, s, d = 64, 77, 40
        q = rand(2, t, d, seed=3, scale=0.5)
        k = rand(2, s, d, seed=4, scale=0.5)
        v = rand(2, s, d, seed=5)
        scale = d ** -0.5
        ref = attention_reference(q, k, v, scale, sm_mode="log2_real_time",
                                  sm_bits=8, start_peak=sp)
        out = fused_attention(q, k, v, scale, sm_mode="log2_real_time",
                              sm_bits=8, start_peak=sp, block_t=32,
                              block_s=128, interpret=True,
                              rt_impl="two_call")
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
            np.abs(np.asarray(out) - np.asarray(ref)).max()

    def test_start_peak(self):
        t, s, d = 32, 77, 40
        q = rand(1, t, d, seed=6, scale=0.5)
        k = rand(1, s, d, seed=7, scale=0.5)
        v = rand(1, s, d, seed=8)
        scale = d ** -0.5
        ref = attention_reference(q, k, v, scale, sm_mode="log2_real_time",
                                  start_peak=True)
        out = fused_attention(q, k, v, scale, sm_mode="log2_real_time",
                              start_peak=True, block_t=32, block_s=128,
                              interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    @pytest.mark.parametrize("mode", ["log2", "uniform"])
    def test_start_peak_static_delta(self, mode):
        """start_peak through the merged single-kernel static-delta path."""
        t, s, d = 32, 77, 40
        q = rand(1, t, d, seed=6, scale=0.5)
        k = rand(1, s, d, seed=7, scale=0.5)
        v = rand(1, s, d, seed=8)
        scale = d ** -0.5
        delta = jnp.asarray(0.7)
        ref = attention_reference(q, k, v, scale, sm_mode=mode, sm_bits=8,
                                  sm_delta=delta, start_peak=True)
        out = fused_attention(q, k, v, scale, sm_mode=mode, sm_bits=8,
                              sm_delta=delta, start_peak=True,
                              block_t=32, block_s=128, interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    @pytest.mark.parametrize("mode,sp", [
        ("none", False), ("uniform", False), ("uniform", True),
        ("log2", False), ("log2_real_time", False), ("log2_real_time", True),
    ])
    def test_default_blocks_grown_qtile(self, mode, sp):
        """Default (adaptive) block sizing at a cross-attention-like shape:
        t=1024 with a small padded key axis (S=77 -> 128) grows the q-tile
        past the 512 base (launch-overhead fix, round 4). Exercises the
        block_t=None/block_s=None path the model actually runs."""
        t, s, d = 1024, 77, 40
        q = rand(1, t, d, seed=11, scale=0.5)
        k = rand(1, s, d, seed=12, scale=0.5)
        v = rand(1, s, d, seed=13)
        scale = d ** -0.5
        delta = (jnp.asarray(0.7)
                 if mode in ("log2", "uniform") else None)
        ref = attention_reference(q, k, v, scale, sm_mode=mode, sm_bits=8,
                                  sm_delta=delta, start_peak=sp)
        out = fused_attention(q, k, v, scale, sm_mode=mode, sm_bits=8,
                              sm_delta=delta, start_peak=sp, interpret=True)
        o, r = np.asarray(out), np.asarray(ref)
        # log2 modes: rare rounding-boundary bin flips are expected (the
        # documented measure-zero class); bound their count, not their size
        mism = np.abs(o - r) > 2e-3
        assert mism.mean() < 5e-4, (mism.mean(), np.abs(o - r).max())

    def test_real_time_delta_identity(self):
        """1/min(l) == max softmax prob (the identity the kernel relies on)."""
        q = rand(3, 50, 32, seed=9)
        k = rand(3, 60, 32, seed=10)
        s = jnp.einsum("btd,bsd->bts", q, k) * (32 ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        m = jnp.max(s, axis=-1, keepdims=True)
        l = jnp.sum(jnp.exp(s - m), axis=-1)
        assert np.isclose(float(jnp.max(p)), float(1.0 / jnp.min(l)), rtol=1e-6)

    def test_start_peak_dominant_column0(self):
        """The reference computes the real_time delta AFTER slicing key 0 off
        (sd.py:191-195): when the start token dominates every row — the very
        situation start_peak exists for — the delta must be the largest
        NON-PEAK probability, not ~1. Constructed so column 0 holds the
        global max by a wide margin."""
        t, s, d = 32, 77, 40
        rng = np.random.RandomState(11)
        q = jnp.asarray(rng.randn(1, t, d).astype(np.float32) * 0.5)
        k = np.asarray(rng.randn(1, s, d).astype(np.float32) * 0.5)
        k[:, 0, :] = 30.0 * np.sign(rng.randn(d))  # peak scores at key 0
        k = jnp.asarray(k)
        v = jnp.asarray(rng.randn(1, s, d).astype(np.float32))
        scale = d ** -0.5

        # sanity: column 0 really is the global softmax max
        p = jax.nn.softmax(jnp.einsum(
            "btd,bsd->bts", q, k) * scale, axis=-1)
        assert float(jnp.max(p[..., 0])) > 10 * float(jnp.max(p[..., 1:]))

        ref = attention_reference(q, k, v, scale, sm_mode="log2_real_time",
                                  start_peak=True)
        out = fused_attention(q, k, v, scale, sm_mode="log2_real_time",
                              start_peak=True, block_t=32, block_s=128,
                              interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
            np.abs(np.asarray(out) - np.asarray(ref)).max()
        # and a delta computed over ALL columns (the old 1/min(l)) would NOT
        # reproduce the reference: quantizing with delta ~= 1 collapses the
        # non-peak probabilities onto a grid two orders of magnitude coarser
        delta_all = jnp.max(p)
        assert float(delta_all) > 10 * float(jnp.max(p[..., 1:]))

    def test_start_peak_padded_rows(self):
        """Padded q rows in the last tile + start_peak + dominant column 0:
        a zero (padded) row scores uniformly, so its largest NON-peak
        probability is 1/s_valid — larger than every real row's when the
        start token dominates. The fused kernel's SMEM max-p2 reduction must
        mask padded rows or the real_time delta inflates to 1/77 here.
        t=40 with block_t=32 forces 24 padded rows in the second tile."""
        t, s, d = 40, 77, 40
        scale = d ** -0.5
        rng = np.random.RandomState(12)
        # every real row: p0 ~= 0.7, the 76 nonpeak probs ~= 0.004 (+-30%) —
        # all below 1/77 ~= 0.013, but big enough that a delta inflated to
        # 1/77 shifts the log2 rounding grid visibly in the output
        q = jnp.asarray((0.5 + 0.1 * np.abs(rng.randn(1, t, d))).astype(np.float32))
        k = (rng.randn(s, d) * 0.05).astype(np.float32)
        k[0, :] = 5.2 / (scale * 0.55 * d)  # q.k0*scale ~= 5.2 for every row
        k = jnp.asarray(k[None])
        v = jnp.asarray(rng.randn(1, s, d).astype(np.float32))

        p = jax.nn.softmax(jnp.einsum("btd,bsd->bts", q, k) * scale, axis=-1)
        # preconditions: every real row's nonpeak max is below a padded
        # row's 1/s, yet large enough to matter in the output
        assert float(jnp.max(p[..., 1:])) < 0.8 / s
        assert float(jnp.max(p[..., 1:])) > 0.1 / s

        ref = attention_reference(q, k, v, scale, sm_mode="log2_real_time",
                                  start_peak=True)
        out = fused_attention(q, k, v, scale, sm_mode="log2_real_time",
                              start_peak=True, block_t=32, block_s=128,
                              interpret=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3), \
            np.abs(np.asarray(out) - np.asarray(ref)).max()
