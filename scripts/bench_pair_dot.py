#!/usr/bin/env python
"""MXU K-width probe: does a K=64 contraction cost half a K=128 one?

FINDING: the isolated numbers were noise-dominated on the contended host
(the wide rows timed impossibly slow and non-monotonically in bh), but the
probe established the two legality facts the pair-packed layout needs —
64-offset static lane slices of loaded values and K=64 dots both compile
under Mosaic — and the end-to-end arbiter (scripts/bench_step_ablate.py
slot A/B) measured the pair layout faster on every deploy config
(g1 75.8 -> 73.0 ms/fwd, rt 88.6 -> 84.9, fp 67.1 -> 66.2).

Kernel A: per key-block, one (bt,128)@(128,bs) dot ("wide": one head padded
to 128 lanes). Kernel B: same VMEM blocks, sliced into two 64-lane halves,
two (bt,64)@(64,bs) dots ("pair": two heads at 64). Same total lanes read;
B does the same MACs as A but in two half-width contractions. If the MXU
charges per-128-K pass, A == B; if K=64 runs at half cost, B is the pair-
packed attention's QK^T at HALF of A.

Also probes the legality/cost of static 64-offset lane slicing on values
loaded from VMEM refs inside a kernel.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

BT, BS, S = 512, 1024, 4096
N_Q = 8          # q tiles per program (amortize)


def _wide_kernel(q_ref, k_ref, o_ref):
    acc = jnp.zeros((BT, BS), jnp.float32)

    def body(j, acc):
        k = k_ref[0, pl.ds(j * BS, BS), :]
        s = jax.lax.dot_general(q_ref[0], k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + s

    acc = jax.lax.fori_loop(0, S // BS, body, acc)
    o_ref[0] = jnp.sum(acc, axis=1, keepdims=True).astype(o_ref.dtype)


def _pair_kernel(q_ref, k_ref, o_ref):
    q = q_ref[0]
    qa, qb = q[:, :64], q[:, 64:]
    acc = jnp.zeros((BT, BS), jnp.float32)

    def body(j, acc):
        k = k_ref[0, pl.ds(j * BS, BS), :]
        ka, kb = k[:, :64], k[:, 64:]
        sa = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return acc + sa + sb

    acc = jax.lax.fori_loop(0, S // BS, body, acc)
    o_ref[0] = jnp.sum(acc, axis=1, keepdims=True).astype(o_ref.dtype)


def run(kernel, label, bh):
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, BT, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, S, 128), jnp.bfloat16)
    fn = jax.jit(lambda q, k: pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, BT, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BT, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, BT, 1), jnp.float32),
    )(q, k))
    try:
        out = fn(q, k)
        np.asarray(jax.device_get(out)).sum()
        t0 = time.perf_counter()
        for _ in range(30):
            out = fn(q, k)
        np.asarray(jax.device_get(out[:1])).sum()
        dt = (time.perf_counter() - t0) / 30
        # wide: bh*BT*S*128 MACs; pair: same
        print(f"{label:6s} bh={bh:3d}  {dt*1e3:7.3f} ms   "
              f"{bh*BT*S*128*2/dt/1e12:6.1f} TF/s(128-lane)")
    except Exception as e:
        print(f"{label:6s} FAILED: {repr(e)[:200]}")


def main():
    for bh in (64, 128):
        run(_wide_kernel, "wide", bh)
        run(_pair_kernel, "pair", bh)


if __name__ == "__main__":
    main()
