"""Fused (flash-style) attention with DGQ softmax quantization points.

The reference materializes the full softmax matrix in HBM and quantizes it
elementwise (diffusers_rewrite/sd.py:183-201): at 512px SD resolution that is
a (B,8,4096,4096) float32 tensor per attention — gigabytes of HBM traffic per
layer. This kernel computes attention blockwise in VMEM.

DGQ's post-softmax quantizers need the FINAL probabilities, which breaks the
single-pass online-softmax rescaling trick. Key identity: for row i with
score max m_i and normalizer l_i = sum_j exp(s_ij - m_i), the row's largest
probability is exactly 1/l_i, so the reference's `real_time` delta
(global max of the softmax tensor, quant_layer_text.py:96-99) is
    delta = max_i 1/l_i = 1 / min_i l_i
— available from a stats-only pass that never materializes probabilities.

Pipeline (one pallas_call with a leading phase grid dimension — the TPU
grid is sequential, so phase 0 finishes everywhere before phase 1 starts):
  phase 0 (stats): per-row (m_i, l_i) into VMEM scratch; the global
     real_time delta (1/min(l), or the max nonpeak prob under start_peak)
     folds into SMEM scratch tile by tile.
  phase 1 (accumulate): probs = exp(s - m_i)/l_i (exact final softmax),
     quantize (log2 with delta from SMEM), multiply by V.
  start_peak: key position 0 is restored unquantized (sd.py:191-195).
Static-delta modes (uniform / calibrated log2) have no cross-tile
dependency and run stats+accumulate back-to-back per tile instead, with
the score tile cached in VMEM so QK^T runs once.

Unquantized attention uses the classic single-pass flash kernel.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# f32 score/probs scratch cap for the merged static-delta kernels; q-tiles
# halve until they fit (patchable for block-size studies)
_STATIC_SCRATCH_BUDGET = 8 * 1024 * 1024


def _round_up(x, m):
    return (x + m - 1) // m * m


# -------------------------------------------------- shared loop bodies ------
def _stats_loop(q, k_ref, *, scale, s_valid, block_s, track_nonpeak_max=False,
                scores_out_ref=None, d_slice=None):
    """Stats loop: per-row running (max m, normalizer l) over key blocks.

    Shared by the fused real_time kernel's phase 0 and the merged
    static-delta kernel so masking/online-update fixes land in one place.

    track_nonpeak_max additionally carries m2 = per-row score max EXCLUDING
    key position 0: under start_peak the reference slices column 0 off
    BEFORE the real_time quantizer, so its dynamic delta is the largest
    NON-PEAK probability, exp(m2 - m)/l — 1/min(l) (the global max including
    the peak) would pick a delta ~1 whenever the start token dominates,
    which is exactly the situation start_peak exists for.

    scores_out_ref: optional (bt, S) f32 VMEM scratch; the masked score
    blocks are written there so the accumulate loop of the same grid cell
    can skip recomputing QKᵀ (halves the merged kernel's MXU work).

    d_slice: optional (lo, hi) lane slice applied to each K block — the
    pair-packed layout stores TWO 64-wide head slots per 128-lane block, and
    the caller runs this loop once per slot with q already sliced.
    """
    s_total = k_ref.shape[1]
    n_blocks = s_total // block_s
    # masking is only needed when S was padded; self-attention (S = tiles)
    # skips the per-element iota/compare/where entirely (VPU-bound otherwise)
    needs_mask = s_valid < s_total

    def body(j, carry):
        m, l, m2 = carry
        k = k_ref[0, pl.ds(j * block_s, block_s), :]
        if d_slice is not None:
            k = k[:, d_slice[0]:d_slice[1]]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = None
        if needs_mask or track_nonpeak_max:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_s
        if needs_mask:
            s = jnp.where(col < s_valid, s, NEG_INF)
        if scores_out_ref is not None:
            scores_out_ref[:, pl.ds(j * block_s, block_s)] = s
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new), axis=1, keepdims=True)
        if track_nonpeak_max:
            s2 = jnp.where(col == 0, NEG_INF, s)
            m2 = jnp.maximum(m2, jnp.max(s2, axis=1, keepdims=True))
        return m_new, l, m2

    bt = q.shape[0]
    m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bt, 1), jnp.float32)
    m20 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    m, l, m2 = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, m20))
    return (m, l, m2) if track_nonpeak_max else (m, l)


def _quant_accum_loop(q, k_ref, v_ref, m, l, delta, *, scale, s_valid,
                      block_s, sm_mode, sm_bits, start_peak,
                      scores_in_ref=None, z_row=False, d_slice=None):
    """Accumulate loop: probs = exp(s - m)/l (exact final softmax), quantize,
    multiply V. Shared by the fused real_time kernel's phase 1 and the
    merged static-delta kernel.

    log2 mode is transcendental-free: -log2(p/delta) with p = exp(s-m)/l is
    LINEAR in the raw score,
        -log2(p/delta) = log2(delta) + (m + ln l - s) / ln 2,
    so the quantized exponent is round(a - s/ln2) and 2^-q·delta is
    constructed directly in the float bit pattern. This loop runs no exp/log
    in log2 mode, and the whole quantize is ~6 VPU ops per element:

        y  = a_row - s/ln2               (fused multiply-add)
        y  = clamp(y, 0, ub)             (ub = min(level-1, exp(delta)-1))
        t  = y + 1.5·2^23                 # mantissa now holds round(y),
        pq = bitcast(bits(delta) - (bits(t) << 23))
                                          # 2^-round(y) · delta EXACTLY:
                                          # subtracting q<<23 decrements the
                                          # exponent field of delta by q

    bits(t) = C + round(y) with C's low 9 bits zero, so (bits(t)<<23) ==
    round(y)<<23 (mod 2^32) — no masking needed. The upper clamp `ub` keeps
    the exponent subtraction clear of the denormal range: codes the
    reference clips to [0, level-1] and that underflow 2^-q·delta to ~0 in
    f32 land at 2^(1-126)-scale values (≤1.2e-38) instead of exact 0 —
    below bf16's smallest subnormal, so outputs are identical. Rounding is
    round-half-even both ways (f32 addition vs jnp.round).
    """
    s_total = k_ref.shape[1]
    n_blocks = s_total // block_s
    level = 2 ** sm_bits
    needs_mask = s_valid < s_total
    inv_ln2 = 1.4426950408889634
    # per-row affine constant: q_exp = round(a_row - s * inv_ln2).
    # z_row: caller passes z = m + ln(l) pre-combined in `m` (l unused) —
    # the only form the loop needs (m, l) in.
    z = m if z_row else m + jnp.log(l)  # (bt, 1)
    a_row = jnp.log2(delta) + z * inv_ln2  # (bt, 1)
    # (1,1) vectors, not scalars: Mosaic's tpu.bitcast only takes vectors
    d_bits = jax.lax.bitcast_convert_type(
        jnp.full((1, 1), delta, jnp.float32), jnp.int32)
    ub = jnp.minimum((d_bits >> 23) - 1, level - 1).astype(jnp.float32)
    magic = jnp.float32(1.5 * 2 ** 23)
    inv_delta = 1.0 / delta          # scalar (uniform mode)
    a2_row = z                       # (bt, 1) row constant (uniform/peak)

    def body(j, acc):
        if scores_in_ref is not None:
            # scores (already masked) cached by the stats loop of this grid
            # cell — no second QKᵀ matmul
            s = scores_in_ref[:, pl.ds(j * block_s, block_s)]
        else:
            k = k_ref[0, pl.ds(j * block_s, block_s), :]
            if d_slice is not None:
                k = k[:, d_slice[0]:d_slice[1]]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        col = None
        if needs_mask or start_peak:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_s
        if needs_mask and scores_in_ref is None:
            s = jnp.where(col < s_valid, s, NEG_INF)
        if sm_mode == "log2":
            # jnp.minimum/maximum (not lax.clamp): ub is a (1,1) vector
            y = jnp.minimum(jnp.maximum(a_row - s * inv_ln2, 0.0), ub)
            t_bits = jax.lax.bitcast_convert_type(y + magic, jnp.int32)
            pq = jax.lax.bitcast_convert_type(
                d_bits - (t_bits << 23), jnp.float32)
        elif sm_mode == "uniform":
            # exp(s-m)/l = exp(s - (m + ln l)): inv_l folds into the row
            # constant, and the delta divide is a hoisted reciprocal multiply
            p = jnp.exp(s - a2_row)
            pq = jnp.minimum(jnp.maximum(jnp.round(p * inv_delta), 0.0),
                             float(level - 1)) * delta
        else:
            pq = jnp.exp(s - a2_row)
        if start_peak:
            # key position 0 is restored unquantized (sd.py:191-195).
            # Only the first column can match, so the exact probability is
            # computed for that single column — a (bt, 1) exp — instead of
            # re-materializing exp(s - m)/l over the whole block (which
            # would reintroduce the full transcendental cost the log2
            # bit-trick path eliminates).
            p0 = jnp.exp(s[:, 0:1] - a2_row)
            pq = jnp.where(col == 0, p0, pq)
        if needs_mask:
            pq = jnp.where(col < s_valid, pq, 0.0)
        v = v_ref[0, pl.ds(j * block_s, block_s), :]
        if d_slice is not None:
            v = v[:, d_slice[0]:d_slice[1]]
        return acc + jax.lax.dot_general(
            pq.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    d_out = v_ref.shape[2] if d_slice is None else d_slice[1] - d_slice[0]
    acc0 = jnp.zeros((q.shape[0], d_out), jnp.float32)
    return jax.lax.fori_loop(0, n_blocks, body, acc0)


# ------------------------------------------- merged static-delta quant ------
def _static_quant_kernel(q_ref, k_ref, v_ref, delta_ref, o_ref, scores_ref,
                         *, scale, s_valid, block_s, sm_mode, sm_bits,
                         start_peak, sub_heads=1):
    """Stats + quantized accumulation in ONE program (static-delta modes).

    The two-pass split exists because `log2_real_time` needs a GLOBAL
    reduction (delta = 1/min(l) over every row) between the passes. The
    static-delta modes — 'uniform' (the g=1 policy) and calibrated 'log2' —
    have no cross-tile dependency, so both loops run back-to-back in one
    kernel over the same VMEM-resident K/V: one pallas_call instead of two,
    no HBM re-read of Q/K between phases, no m/l round-trip through HBM.

    The stats loop caches this q-tile's (masked) scores in a VMEM scratch
    (`scores_ref`) that the accumulate loop reads back — QKᵀ runs ONCE, so
    the quantized kernel's MXU work equals the unquantized flash kernel's
    (the caller sizes block_t to keep the scratch within VMEM). Numerics
    are identical to the two-pass form (same shared loop bodies).

    sub_heads=2 (pair-packed): each head's stats+accumulate completes before
    the next starts, so the ONE scores scratch is reused — no extra VMEM.
    """
    dp = q_ref.shape[2]
    ds = dp // sub_heads
    outs = []
    for u in range(sub_heads):
        sl = None if sub_heads == 1 else (u * ds, (u + 1) * ds)
        q = q_ref[0] if sl is None else q_ref[0][:, sl[0]:sl[1]]
        m, l = _stats_loop(q, k_ref, scale=scale, s_valid=s_valid,
                           block_s=block_s, scores_out_ref=scores_ref,
                           d_slice=sl)
        acc = _quant_accum_loop(
            q, k_ref, v_ref, m, l, delta_ref[0, 0],
            scale=scale, s_valid=s_valid, block_s=block_s, sm_mode=sm_mode,
            sm_bits=sm_bits, start_peak=start_peak, scores_in_ref=scores_ref,
            d_slice=sl,
        )
        outs.append(acc.astype(o_ref.dtype))
    o_ref[0] = outs[0] if sub_heads == 1 else jnp.concatenate(outs, axis=1)


# ------------------------------------- fast static-uniform (g=1 policy) -----
def _static_uniform_kernel(q_ref, k_ref, v_ref, delta_ref, o_ref,
                           p_scratch, mrec_scratch, *,
                           scale, s_valid, block_s, sm_bits, sub_heads=1):
    """Uniform softmax quantization (the reference's g=1 policy) at
    unquantized-flash cost plus ~3 VPU ops per element.

    Loop 1 is the flash stats loop, except the exp(s - m_running) blocks it
    computes for l anyway are SAVED to a VMEM scratch, along with the
    running row max at each block (mrec). Loop 2 then reconstructs the exact
    final probability per element as   p = p_saved · exp(m_block - m_final)
    — one multiply, no second QKᵀ and no second exp. The quantize itself is
        codes = min(round(p_saved · cf), level-1),
        cf    = exp(m_block - m_final) / (l · Δ)     (per row-block scalar)
    and Δ is hoisted OUT of the matmul: the kernel accumulates integer codes
    (exact in bf16, ≤ 2^bits-1) against V and scales the f32 accumulator by
    Δ once at the end. round(x) ≥ 0 since p ≥ 0, so no lower clip is needed.
    Numerically this differs from quantize-then-matmul only in f32
    reassociation (p·(1/(lΔ)) vs (p/l)/Δ), which can flip a rounding bin for
    values within one ulp of a bin boundary — the same measure-zero boundary
    class the log2 kernel documents.

    sub_heads=2 (pair-packed): sequential per-head processing reusing the
    same probs/mrec scratch (each head's loop 2 completes before the next
    head's loop 1 overwrites)."""
    s_total = k_ref.shape[1]
    n_blocks = s_total // block_s
    level = 2 ** sm_bits
    needs_mask = s_valid < s_total
    dp = q_ref.shape[2]
    ds = dp // sub_heads
    bt = q_ref.shape[1]
    delta = delta_ref[0, 0]
    # round-half-even via the magic-constant trick, reading the rounded
    # value out of the BIT PATTERN (jnp.round lowers to a multi-op
    # sign-handling sequence on the VPU; a float (x+magic)-magic pair gets
    # algebraically cancelled / computed in excess precision by XLA:CPU).
    # bits(x + 1.5*2^23) = C0 + round(x) exactly for 0 <= x < 2^22, with
    # C0 = bits(1.5*2^23); clipping to level-1 BEFORE the round is
    # equivalent to clipping after (x in (L-1.5, L-1] rounds to L-1 either
    # way) and keeps the mantissa in range for any delta.
    magic = jnp.float32(1.5 * 2 ** 23)
    c0 = jnp.int32((150 << 23) | (1 << 22))

    outs = []
    for u in range(sub_heads):
        sl = (u * ds, (u + 1) * ds)
        q = q_ref[0] if sub_heads == 1 else q_ref[0][:, sl[0]:sl[1]]

        def body1(j, carry, q=q, sl=sl):
            m, l = carry
            k = k_ref[0, pl.ds(j * block_s, block_s), :]
            if sub_heads > 1:
                k = k[:, sl[0]:sl[1]]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if needs_mask:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_s
                s = jnp.where(col < s_valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            p_scratch[:, pl.ds(j * block_s, block_s)] = p
            # one 128-wide aligned stripe per block (Mosaic requires lane-dim
            # dynamic indices provably 128-aligned; a 1-lane store is not)
            mrec_scratch[:, pl.ds(pl.multiple_of(j * 128, 128), 128)] = (
                jnp.broadcast_to(m_new, (bt, 128)))
            l = l * jnp.exp(m - m_new) + jnp.sum(p, axis=1, keepdims=True)
            return m_new, l

        m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bt, 1), jnp.float32)
        m, l = jax.lax.fori_loop(0, n_blocks, body1, (m0, l0))

        inv_ld = 1.0 / (l * delta)

        def body2(j, acc, m=m, inv_ld=inv_ld, sl=sl):
            mj = mrec_scratch[:, pl.ds(pl.multiple_of(j * 128, 128), 128)][:, :1]
            cf = jnp.exp(mj - m) * inv_ld  # (bt, 1)
            p = p_scratch[:, pl.ds(j * block_s, block_s)]
            x = jnp.minimum(p * cf, float(level - 1))
            codes = jax.lax.bitcast_convert_type(x + magic, jnp.int32) - c0
            v = v_ref[0, pl.ds(j * block_s, block_s), :]
            if sub_heads > 1:
                v = v[:, sl[0]:sl[1]]
            return acc + jax.lax.dot_general(
                codes.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc0 = jnp.zeros((bt, ds), jnp.float32)
        acc = jax.lax.fori_loop(0, n_blocks, body2, acc0)
        outs.append((delta * acc).astype(o_ref.dtype))
    o_ref[0] = outs[0] if sub_heads == 1 else jnp.concatenate(outs, axis=1)


# ---------------------------------- two-call log2 real_time (alternate) -----
def _stats_kernel(q_ref, k_ref, o_m_ref, o_l_ref, *, scale, s_valid, block_s):
    """Row max and normalizer over all key blocks (one grid cell = q tile)."""
    # keep q bf16: the MXU runs bf16 at 4x f32 throughput
    m, l = _stats_loop(q_ref[0], k_ref, scale=scale, s_valid=s_valid,
                       block_s=block_s)
    o_m_ref[0] = m
    o_l_ref[0] = l


def _stats_kernel_nonpeak(q_ref, k_ref, o_m_ref, o_l_ref, o_p2_ref, *,
                          scale, s_valid, block_s):
    """Stats kernel variant for start_peak real_time: also emits the per-row
    largest NON-PEAK probability exp(m2 - m)/l (column 0 excluded), whose
    global max is the reference's dynamic delta for the sliced tensor."""
    m, l, m2 = _stats_loop(q_ref[0], k_ref, scale=scale, s_valid=s_valid,
                           block_s=block_s, track_nonpeak_max=True)
    o_m_ref[0] = m
    o_l_ref[0] = l
    o_p2_ref[0] = jnp.exp(m2 - m) / l


def _accum_kernel(q_ref, k_ref, v_ref, m_ref, l_ref, delta_ref, o_ref, *,
                  scale, s_valid, block_s, sm_mode, sm_bits, start_peak):
    """probs = exp(s - m)/l, quantize, multiply V; delta in SMEM."""
    acc = _quant_accum_loop(
        q_ref[0], k_ref, v_ref, m_ref[0], l_ref[0], delta_ref[0, 0],
        scale=scale, s_valid=s_valid, block_s=block_s, sm_mode=sm_mode,
        sm_bits=sm_bits, start_peak=start_peak,
    )
    o_ref[0] = acc.astype(o_ref.dtype)


# ------------------------------------ fused two-phase log2 real_time --------
def _rt_fused_kernel(q_ref, k_ref, v_ref, o_ref, ml_scr, red_smem, *,
                     scale, s_valid, t_valid, block_s, sm_bits, start_peak,
                     n_tiles, sub_heads=1):
    """log2 real_time quantized attention in ONE pallas_call.

    The dynamic delta is a GLOBAL reduction over every row's normalizer
    (delta = 1/min(l), or max nonpeak-prob under start_peak), so the stats
    and accumulate phases cannot share a score tile — but they CAN share a
    kernel: the TPU grid is sequential, so a leading phase dimension runs
    all stats cells before any accumulate cell. Per-row (m, l) persist
    across grid steps in a VMEM scratch (stored as (1, bt) rows — Mosaic
    handles the (bt,1)<->(1,bt) relayout), and the global reduction lives
    in SMEM: phase 0 folds each tile's min(l)/max(p2) into it, phase 1
    reads the finished delta. vs the two-pallas_call form (`_rt_two_call`,
    selectable via rt_impl; scripts/bench_rt_ab.py A/Bs them in-model) this
    drops one kernel dispatch, the (BH,T) m/l HBM round-trip, and the
    XLA-level reduce+broadcast between the calls. The second QK^T (phase 1
    re-computes scores rather than caching (T,S) floats) is semantic: the
    delta is unknown until every row's stats are in.

    Numerics are identical to the two-call form: the same `_stats_loop` /
    `_quant_accum_loop` bodies run with the same delta (f32 min/max is
    order-independent), and padded q-rows are harmless in the SMEM
    reduction — a zero q row scores 0 on every valid key, so its l equals
    s_valid, the maximum any row can attain (p2 rows ARE masked: a
    peak-dominated tensor can push every real row's nonpeak max below the
    padded rows' 1/s_valid).
    """
    ph = pl.program_id(0)
    b = pl.program_id(1)
    i = pl.program_id(2)
    cell = b * n_tiles + i
    bt = q_ref.shape[1]
    dp = q_ref.shape[2]
    ds = dp // sub_heads

    @pl.when(ph == 0)
    def _stats():
        @pl.when(cell == 0)
        def _init():
            red_smem[0] = jnp.inf
            red_smem[1] = 0.0

        for u in range(sub_heads):
            sl = None if sub_heads == 1 else (u * ds, (u + 1) * ds)
            q = q_ref[0] if sl is None else q_ref[0][:, sl[0]:sl[1]]
            res = _stats_loop(q, k_ref, scale=scale, s_valid=s_valid,
                              block_s=block_s, track_nonpeak_max=start_peak,
                              d_slice=sl)
            m, l = res[0], res[1]
            # phase 1 consumes (m, l) ONLY through z = m + ln(l) (both a_row
            # and the start_peak column-0 exp), so one row per tile/sub-head
            ml_scr[pl.ds(cell, 1), pl.ds(u * bt, bt)] = jnp.reshape(
                m + jnp.log(l), (1, bt))

            red_smem[0] = jnp.minimum(red_smem[0], jnp.min(l))
            if start_peak:
                row = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) + i * bt
                p2 = jnp.where(row < t_valid, jnp.exp(res[2] - m) / l, 0.0)
                red_smem[1] = jnp.maximum(red_smem[1], jnp.max(p2))

    @pl.when(ph == 1)
    def _accum():
        delta = red_smem[1] if start_peak else 1.0 / red_smem[0]
        outs = []
        for u in range(sub_heads):
            sl = None if sub_heads == 1 else (u * ds, (u + 1) * ds)
            q = q_ref[0] if sl is None else q_ref[0][:, sl[0]:sl[1]]
            z = jnp.reshape(ml_scr[pl.ds(cell, 1), pl.ds(u * bt, bt)], (bt, 1))
            acc = _quant_accum_loop(
                q, k_ref, v_ref, z, None, delta,
                scale=scale, s_valid=s_valid, block_s=block_s, sm_mode="log2",
                sm_bits=sm_bits, start_peak=start_peak, z_row=True, d_slice=sl,
            )
            outs.append(acc.astype(o_ref.dtype))
        o_ref[0] = outs[0] if sub_heads == 1 else jnp.concatenate(outs, axis=1)


# ------------------------------------------------------- single-pass FP -----
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, s_valid, block_s,
                  sub_heads=1):
    """Classic single-pass flash. sub_heads=2: the pair-packed layout — the
    128-lane block holds two 64-wide head slots, processed sequentially with
    64-wide contractions (half the lane-padding MXU waste of one-head-per-
    128 for SD's 40-wide heads; zero waste for SDXL's 64-wide ones)."""
    s_total = k_ref.shape[1]
    n_blocks = s_total // block_s
    dp = q_ref.shape[2]
    ds = dp // sub_heads
    bt = q_ref.shape[1]
    needs_mask = s_valid < s_total

    outs = []
    for u in range(sub_heads):
        sl = (u * ds, (u + 1) * ds)
        q = q_ref[0] if sub_heads == 1 else q_ref[0][:, sl[0]:sl[1]]

        def body(j, carry, q=q, sl=sl):
            m, l, acc = carry
            k = k_ref[0, pl.ds(j * block_s, block_s), :]
            if sub_heads > 1:
                k = k[:, sl[0]:sl[1]]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if needs_mask:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_s
                s = jnp.where(col < s_valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * corr + jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[0, pl.ds(j * block_s, block_s), :]
            if sub_heads > 1:
                v = v[:, sl[0]:sl[1]]
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bt, 1), jnp.float32)
        acc0 = jnp.zeros((bt, ds), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
        outs.append((acc / l).astype(o_ref.dtype))
    o_ref[0] = outs[0] if sub_heads == 1 else jnp.concatenate(outs, axis=1)


# ----------------------------------------------------------------- API ------
@functools.partial(
    jax.jit,
    static_argnames=("scale", "sm_mode", "sm_bits", "start_peak",
                     "block_t", "block_s", "interpret", "rt_impl",
                     "num_heads"),
)
def fused_attention(
    q: jax.Array,                  # (BH, T, D), or (B, T, H*dp) packed
    k: jax.Array,                  # (BH, S, D), or (B, S, H*dp) packed
    v: jax.Array,                  # (BH, S, D), or (B, S, H*dp) packed
    scale: float,
    sm_mode: str = "none",         # none | log2 | log2_real_time | uniform
    sm_bits: int = 8,
    sm_delta: Optional[jax.Array] = None,   # static delta (log2/uniform modes)
    start_peak: bool = False,
    block_t: Optional[int] = None,
    block_s: Optional[int] = None,
    interpret: bool = False,
    rt_impl: Optional[str] = None,  # real_time structure: fused | two_call
    num_heads: Optional[int] = None,  # packed head-slot layout (see below)
) -> jax.Array:
    """num_heads=None: the classic (BH, T, D) per-head layout — inputs are
    transposed/padded here, output sliced back.

    num_heads=H: PACKED head-slot layout. q/k/v are (B, T, H*dp) with each
    head occupying a dp-wide lane slot (dp a multiple of 128, zero-padded
    beyond the true head_dim at WEIGHT-FOLD time — see
    calib.weight_calib.pack_attention_heads). The grid splits heads via the
    BlockSpec lane index, so the kernel reads projection outputs DIRECTLY:
    no (B,T,H,D)->(B,H,T,D) transpose, no jnp.pad of activations, no output
    slice — profiled at ~10 ms/forward of pure data movement at SD 512px.
    Numerics are bit-identical to the unpacked path: the padding lanes are
    exact zeros through the folded projections (and quantizers map 0 -> 0),
    so every QK^T contraction and PV lane is unchanged.
    """
    if num_heads is not None:
        return _fused_attention_packed(
            q, k, v, scale, num_heads, sm_mode, sm_bits, sm_delta,
            start_peak, block_t, block_s, interpret, rt_impl)
    bh, t, d = q.shape
    s = k.shape[1]
    if block_s is None:
        # Per-mode inner-loop granularity (measured on v5e at the 64px
        # self-attention shape, scripts/bench_attn.py): a larger K-block
        # amortizes fori_loop overhead and feeds bigger MXU dots. The
        # dedicated uniform kernel and the two-pass real_time kernels take
        # full-S blocks (6.52 -> 5.72 ms and 7.79 -> 7.52 / +sp 8.35 -> 7.49);
        # the merged static-delta kernel caps at 2048 (6.05 -> 5.76; 4096
        # overflows its default VMEM scope and fails to compile); the
        # unquantized flash kernel is flat in block_s (5.61 at 1024).
        if sm_mode == "uniform" and not start_peak:
            block_s = 4096
        elif sm_mode in ("log2", "uniform"):
            block_s = 2048
        elif sm_mode == "log2_real_time":
            block_s = 4096
        else:
            block_s = 1024
    # pad head_dim to a half-register (64) when possible: SD heads are 40/80
    # wide, and padding to 128 wastes up to 3.2x MXU work on the D contraction
    dp = _round_up(d, 64 if d <= 64 else 128)
    bs = min(block_s, _round_up(s, 128))
    if block_t is None:
        # Small key axes (cross-attention: S=77 -> sp=128) make a 512-row
        # q-tile pathologically launch-bound: T=4096 yields 8*BH tiny grid
        # steps (measured 2.19 ms for an S=77 FP call whose compute+memory
        # SOL is <0.1 ms — pure per-step overhead). Grow the q-tile until
        # the per-tile f32 score block reaches ~2 MB; the measured-good 512
        # is unchanged for the big self-attention shapes (bs >= 1024).
        block_t = 512
        while (block_t < t and block_t < 2048
               and block_t * 2 * bs * 4 <= 2 * 1024 * 1024):
            block_t *= 2
    bt = min(block_t, _round_up(t, 8))
    tp = _round_up(t, bt)
    sp = _round_up(s, bs)

    qp = jnp.pad(q, ((0, 0), (0, tp - t), (0, dp - d)))
    kp = jnp.pad(k, ((0, 0), (0, sp - s), (0, dp - d)))
    vp = jnp.pad(v, ((0, 0), (0, sp - s), (0, dp - d)))
    grid = (bh, tp // bt)
    common = dict(scale=scale, s_valid=s, block_s=bs)

    if sm_mode == "none":
        out = pl.pallas_call(
            functools.partial(_flash_kernel, **common),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bt, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bt, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, tp, dp), q.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * tp * sp * dp,
                bytes_accessed=2 * bh * (tp + 2 * sp) * dp,
                transcendentals=bh * tp * sp,
            ),
        )(
            qp, kp, vp
        )
        return out[:, :t, :d]

    if sm_mode in ("log2", "uniform"):
        # static delta: no cross-tile dependency -> one merged kernel with a
        # VMEM score scratch (QKᵀ once). The scratch is (bt, sp) f32; shrink
        # the q-tile when a long key axis would blow the ~16 MB VMEM budget
        # (SDXL 1024px self-attention: sp = 16384 -> bt 128).
        assert sm_delta is not None, "static softmax quant needs sm_delta"
        # scratch budget 8 MB with the kernel's scoped-VMEM limit raised to
        # 32 MB (v5e default scope is 16 MB; at sp=4096/bt=512 the probs
        # scratch + mrec + K/V double-buffers total 16.1 MB — 116 KB over —
        # and halving bt instead measured 1.3 ms slower at the 64px shape:
        # grid overhead beats scratch pressure)
        bt_s = bt
        while bt_s > 128 and bt_s * sp * 4 > _STATIC_SCRATCH_BUDGET:
            bt_s //= 2
        tp_s = _round_up(t, bt_s)
        if tp_s != tp:
            qp_s = jnp.pad(q, ((0, 0), (0, tp_s - t), (0, dp - d)))
        else:
            qp_s = qp
        grid_s = (bh, tp_s // bt_s)
        delta_arr = jnp.reshape(sm_delta, (1, 1)).astype(jnp.float32)
        if sm_mode == "uniform" and not start_peak:
            # dedicated fast path: probs cached from the stats loop, integer
            # codes into the MXU, delta hoisted to the epilogue
            out = pl.pallas_call(
                functools.partial(
                    _static_uniform_kernel, **common, sm_bits=sm_bits,
                ),
                grid=grid_s,
                in_specs=[
                    pl.BlockSpec((1, bt_s, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((1, bt_s, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bh, tp_s, dp), q.dtype),
                scratch_shapes=[
                    pltpu.VMEM((bt_s, sp), jnp.float32),
                    pltpu.VMEM((bt_s, (sp // bs) * 128), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024),
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=4 * bh * tp_s * sp * dp,
                    bytes_accessed=2 * bh * (tp_s + 2 * sp) * dp,
                    transcendentals=bh * tp_s * sp,
                ),
            )(qp_s, kp, vp, delta_arr)
            return out[:, :t, :d]
        out = pl.pallas_call(
            functools.partial(
                _static_quant_kernel, **common, sm_mode=sm_mode,
                sm_bits=sm_bits, start_peak=start_peak,
            ),
            grid=grid_s,
            in_specs=[
                pl.BlockSpec((1, bt_s, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, bt_s, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, tp_s, dp), q.dtype),
            scratch_shapes=[pltpu.VMEM((bt_s, sp), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * tp_s * sp * dp,
                bytes_accessed=2 * bh * (tp_s + 2 * sp) * dp,
                transcendentals=2 * bh * tp_s * sp,
            ),
        )(qp_s, kp, vp, delta_arr)
        return out[:, :t, :d]

    # ---- log2_real_time: fused two-phase kernel (delta is a GLOBAL
    # reduction, exchanged through SMEM scratch between the grid phases) ----
    assert sm_mode == "log2_real_time", f"unknown sm_mode {sm_mode!r}"
    if rt_impl is None:
        rt_impl = "fused"
    if rt_impl == "two_call":
        return _rt_two_call(qp, kp, vp, q.dtype, bh, t, tp, d, dp, sp, bt,
                            common, sm_bits, start_peak, grid, interpret)
    assert rt_impl == "fused", f"unknown rt_impl {rt_impl!r}"
    n_tiles = tp // bt
    out = pl.pallas_call(
        functools.partial(
            _rt_fused_kernel, **common, t_valid=t, sm_bits=sm_bits,
            start_peak=start_peak, n_tiles=n_tiles,
        ),
        grid=(2, bh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, bt, dp), lambda p, b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda p, b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            # V is only read in phase 1; parking phase 0 on block 0 saves
            # one full fetch of V per batch-head
            pl.BlockSpec((1, sp, dp), lambda p, b, i: (p * b, 0, 0), memory_space=pltpu.VMEM),
        ],
        # phase-0 cells never write the output; mapping them all onto block
        # (0, 0) — which phase 1 then starts on — means no block index
        # change until real data exists, so no garbage ever hits HBM
        out_specs=pl.BlockSpec((1, bt, dp), lambda p, b, i: (p * b, p * i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh * n_tiles, bt), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tp * sp * dp,
            bytes_accessed=2 * bh * (tp + 2 * sp) * dp,
            transcendentals=2 * bh * tp * sp,
        ),
    )(qp, kp, vp)
    return out[:, :t, :d]


def _rt_two_call(qp, kp, vp, out_dtype, bh, t, tp, d, dp, sp, bt, common,
                 sm_bits, start_peak, grid, interpret):
    """Alternate real_time structure: stats pallas_call -> XLA global
    reduce -> accumulate pallas_call, with per-row (m, l) round-tripping
    through HBM. Kept selectable (`rt_impl="two_call"`) as the measured
    alternative to the fused kernel; see the A/B note in the module docs."""
    stats_fn = _stats_kernel_nonpeak if start_peak else _stats_kernel
    row_spec = pl.BlockSpec((1, bt, 1), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    row_shape = jax.ShapeDtypeStruct((bh, tp, 1), jnp.float32)
    n_out = 3 if start_peak else 2
    stats = pl.pallas_call(
        functools.partial(stats_fn, **common),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec,) * n_out,
        out_shape=(row_shape,) * n_out,
        interpret=interpret,
    )(qp, kp)
    m, l = stats[0], stats[1]

    row_valid = (jnp.arange(tp) < t)[None, :, None]
    if start_peak:
        # reference real_time under start_peak: column 0 is sliced off
        # BEFORE the quantizer (sd.py:191-195), so its dynamic delta is the
        # largest NON-PEAK probability — max over rows of exp(m2 - m)/l
        delta = jnp.max(jnp.where(row_valid, stats[2], 0.0))
    else:
        # reference real_time: delta = max of the softmax tensor = 1/min(l)
        delta = 1.0 / jnp.min(jnp.where(row_valid, l, jnp.inf))

    delta_arr = jnp.reshape(delta, (1, 1)).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _accum_kernel, **common, sm_mode="log2", sm_bits=sm_bits,
            start_peak=start_peak,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tp, dp), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tp * sp * dp,
            bytes_accessed=2 * bh * (tp + 2 * sp) * dp,
            transcendentals=2 * bh * tp * sp,
        ),
    )(qp, kp, vp, m, l, delta_arr)
    return out[:, :t, :d]


def _fused_attention_packed(q, k, v, scale, num_heads, sm_mode, sm_bits,
                            sm_delta, start_peak, block_t, block_s,
                            interpret, rt_impl):
    """Packed head-slot dispatch: arrays stay (B, T/S, H*dp); the BlockSpec
    lane index carves per-head dp-wide slots, so no activation transpose/pad
    ever materializes. Kernel bodies are the same as the unpacked path.

    dp == 64 (pair-packed, even head count): each 128-lane block holds TWO
    64-wide head slots; the grid runs over head PAIRS and the kernel
    processes both slots sequentially with 64-wide contractions. SD's
    40-wide heads then pay a 64/40 lane tax instead of 128/40, and SDXL's
    64-wide heads none at all — on both the attention dots and (via the
    matching weight packing) the projection matmul widths."""
    h_n = num_heads
    b, t, qc = q.shape
    s = k.shape[1]
    dp = qc // h_n
    bh = b * h_n
    sub = 1
    if dp == 64:
        if h_n % 2:
            raise ValueError("pair-packed layout needs an even head count")
        sub = 2
    elif dp % 128:
        raise ValueError(f"packed head slot width {dp} must be 64 or a "
                         "multiple of 128")
    hc = h_n // sub          # head-slot cells per batch row
    slot_w = dp * sub        # lane width of one grid cell's block
    if block_s is None:
        if sm_mode == "uniform" and not start_peak:
            block_s = 4096
        elif sm_mode in ("log2", "uniform"):
            block_s = 2048
        elif sm_mode == "log2_real_time":
            block_s = 4096
        else:
            block_s = 1024
    bs = min(block_s, _round_up(s, 128))
    sp = _round_up(s, bs)
    if sp != s:
        # rows only (cross-attention S=77 -> 128); lanes are pre-padded in
        # the folded weights
        k = jnp.pad(k, ((0, 0), (0, sp - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sp - s), (0, 0)))
    if block_t is None:
        # pair-mode real_time at big key axes prefers a 1024-row q-tile
        # (measured 6.91 vs 7.30 ms at the 64px self-attention shape,
        # scripts/bench_pair_blocks.py — each grid cell runs two sub-heads,
        # so larger tiles amortize the doubled per-cell loop setup)
        block_t = 1024 if (sub == 2 and sm_mode == "log2_real_time"
                           and s >= 2048) else 512
        while (block_t < t and block_t < 2048
               and block_t * 2 * bs * 4 <= 2 * 1024 * 1024):
            block_t *= 2
    bt = min(block_t, t)
    while t % bt:
        bt //= 2
    n_tiles = t // bt
    common = dict(scale=scale, s_valid=s, block_s=bs)
    out_shape = jax.ShapeDtypeStruct((b, t, h_n * dp), q.dtype)

    def q_spec(bt_):
        return pl.BlockSpec((1, bt_, slot_w), lambda j, i: (j // hc, i, j % hc),
                            memory_space=pltpu.VMEM)

    kv_spec = pl.BlockSpec((1, sp, slot_w), lambda j, i: (j // hc, 0, j % hc),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * bh * t * sp * dp,
        bytes_accessed=2 * bh * (t + 2 * sp) * dp,
        transcendentals=2 * bh * t * sp,
    )

    if sm_mode == "none":
        return pl.pallas_call(
            functools.partial(_flash_kernel, **common, sub_heads=sub),
            grid=(b * hc, n_tiles),
            in_specs=[q_spec(bt), kv_spec, kv_spec],
            out_specs=q_spec(bt),
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost,
        )(q, k, v)

    if sm_mode in ("log2", "uniform"):
        assert sm_delta is not None, "static softmax quant needs sm_delta"
        bt_s = bt
        while bt_s > 128 and bt_s * sp * 4 > _STATIC_SCRATCH_BUDGET:
            bt_s //= 2
        while t % bt_s:
            bt_s //= 2
        grid_s = (b * hc, t // bt_s)
        delta_arr = jnp.reshape(sm_delta, (1, 1)).astype(jnp.float32)
        delta_spec = pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                                  memory_space=pltpu.SMEM)
        if sm_mode == "uniform" and not start_peak:
            return pl.pallas_call(
                functools.partial(
                    _static_uniform_kernel, **common, sm_bits=sm_bits,
                    sub_heads=sub),
                grid=grid_s,
                in_specs=[q_spec(bt_s), kv_spec, kv_spec, delta_spec],
                out_specs=q_spec(bt_s),
                out_shape=out_shape,
                scratch_shapes=[
                    pltpu.VMEM((bt_s, sp), jnp.float32),
                    pltpu.VMEM((bt_s, (sp // bs) * 128), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024),
                interpret=interpret,
                cost_estimate=cost,
            )(q, k, v, delta_arr)
        return pl.pallas_call(
            functools.partial(
                _static_quant_kernel, **common, sm_mode=sm_mode,
                sm_bits=sm_bits, start_peak=start_peak, sub_heads=sub),
            grid=grid_s,
            in_specs=[q_spec(bt_s), kv_spec, kv_spec, delta_spec],
            out_specs=q_spec(bt_s),
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((bt_s, sp), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=cost,
        )(q, k, v, delta_arr)

    assert sm_mode == "log2_real_time", f"unknown sm_mode {sm_mode!r}"
    # the fused two-phase kernel is the only packed real_time structure
    # (the two_call alternate exists for A/B on the unpacked path only)
    rt_q = pl.BlockSpec((1, bt, slot_w), lambda p, j, i: (j // hc, i, j % hc),
                        memory_space=pltpu.VMEM)
    rt_k = pl.BlockSpec((1, sp, slot_w), lambda p, j, i: (j // hc, 0, j % hc),
                        memory_space=pltpu.VMEM)
    # V is only read in phase 1; park phase 0 on head-slot 0 of batch 0
    rt_v = pl.BlockSpec((1, sp, slot_w),
                        lambda p, j, i: (p * (j // hc), 0, p * (j % hc)),
                        memory_space=pltpu.VMEM)
    rt_o = pl.BlockSpec((1, bt, slot_w),
                        lambda p, j, i: (p * (j // hc), p * i, p * (j % hc)),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _rt_fused_kernel, **common, t_valid=t, sm_bits=sm_bits,
            start_peak=start_peak, n_tiles=n_tiles, sub_heads=sub),
        grid=(2, b * hc, n_tiles),
        in_specs=[rt_q, rt_k, rt_v],
        out_specs=rt_o,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b * hc * n_tiles, sub * bt), jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=cost,
    )(q, k, v)


def attention_reference(q, k, v, scale, sm_mode="none", sm_bits=8,
                        sm_delta=None, start_peak=False):
    """XLA oracle with materialized softmax (the reference's math)."""
    s = jnp.einsum("btd,bsd->bts", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    level = 2 ** sm_bits
    if sm_mode != "none":
        if sm_mode == "log2_real_time":
            # start_peak slices column 0 off BEFORE the quantizer
            # (sd.py:191-195), so the dynamic delta excludes the peak
            delta = jnp.max(p[..., 1:]) if start_peak else jnp.max(p)
        else:
            delta = sm_delta
        if sm_mode in ("log2", "log2_real_time"):
            pq = 2.0 ** (-jnp.clip(jnp.round(-jnp.log2(p / delta)), 0, level - 1)) * delta
        else:
            pq = jnp.clip(jnp.round(p / delta), 0, level - 1) * delta
        if start_peak:
            pq = pq.at[..., 0].set(p[..., 0])
        p = pq
    return jnp.einsum("bts,bsd->btd", p, v.astype(jnp.float32)).astype(q.dtype)
