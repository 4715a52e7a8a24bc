"""Fused group-quantized conv Pallas kernel (SURVEY §7 hard part 3).

DGQ's group activation quantization applies a distinct (scale, zero point)
per (input-channel, tap) position of the im2col'd input — the same input
pixel is quantized differently for each of the kh*kw taps that read it
(reference quant_layer.py:630-657). That forbids a native conv (one input,
shared across taps), and the alternatives all pay HBM amplification,
measured on v5e (SD g=8 flagship, 50-step 512px, img/s):

  * materialized unfold (reference semantics verbatim): 9x input
    blow-up in HBM                                            0.36
  * tap decomposition in XLA (kh*kw fake-quant + matmul, f32
    accumulator materialized between taps)                    0.65
  * pallas, grid (B, H, O): tap quantize re-run per O tile    0.60
  * pallas, grid (B, H), weights streamed per program: full
    weight set re-read B*H/BH times                           0.60
  * pallas, weight-stationary (this file)                     0.61
  * tap-major quantized im2col (one fused concat + one K=9C
    matmul; per-conv 2.41 vs taps 1.72 ms at 8x64x64x320)     loses/conv

This version is weight-stationary: the grid is (O/BO,) alone. Each program
holds ALL kh*kw weight tiles for its output columns in VMEM (read from HBM
exactly once per layer) and streams (BH+kh-1)-row input bands through two
double-buffered VMEM scratches, quantizing each tap once per band on the
VPU between the MXU contractions, and DMAs each finished output band
straight back to HBM. Weight traffic x1, input traffic x(O/BO), output
written once — the same reuse structure XLA gives a plain matmul, with the
per-tap quantization fused in.

VERDICT OF THE MEASUREMENTS: even with optimal reuse this kernel trails
XLA's tap decomposition by ~6% end-to-end, the same pattern as the int8
matmul kernel (bench.py --int8): a pallas_call is a fusion barrier, so the
conv input must materialize in HBM instead of fusing with its producer
(groupnorm+SiLU), and on a bandwidth-bound op that tax exceeds the
dataflow win. The deploy default is therefore group_conv_impl='taps';
this kernel stays available ('fused'), parity-tested, as the documented
experiment and the starting point if XLA's fusion behavior changes.

(The ladder above was measured with in-kernel dequantize arithmetic; the
kernel has since adopted the same algebraic dequant fold as the taps path
— dm*dl folded into the resident weights, shifted-clip integer codes on
the MXU feed — cutting the per-tap VPU work from ~7 to ~4 ops/element.
Parity-verified; its end-to-end number awaits re-measurement.)

Layout: NHWC x, pre-padded to 8-aligned W and 128-aligned C; weights
reshaped to (kh*kw, C, O) with O padded to 128. Stride-1 only — stride-2
group convs (the three downsamplers, ~2% of conv FLOPs) stay on the
tap-decomposed XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# all kh*kw weight tiles of one O block live in VMEM at once (Mosaic also
# needs stack room for the accumulator + quantize temporaries)
_WEIGHT_SET_BYTES = 4 * 1024 * 1024


def _pick_block_o(kh: int, kw: int, cp: int, op: int, dtype_bytes: int = 2):
    """Largest Mosaic-legal O tile (128-multiple or full dim) whose full
    per-tap weight set fits the residency budget."""
    for cand in [op] + [x for x in (512, 256, 128)
                        if x < op and op % x == 0]:
        if kh * kw * cp * cand * dtype_bytes <= _WEIGHT_SET_BYTES:
            return cand
    return None


def _kernel(x_hbm, w_hbm, rd_ref, z_ref, b_ref, o_hbm,
            wt_ref, band0, band1, stage0, stage1, sem_w, sem_x, sem_o, *,
            kh, kw, bh, w_out, h_blocks, nbatch, a_bits, bo):
    """One O tile: all input bands stream through this program.

    Band buffers and output stages are double-buffered; the fori_loop body
    processes two bands per step so buffer selection stays static.

    The dequantize half of fake-quant is folded away algebraically, same as
    the taps path (models/layers.py group_quant_conv2d_taps): dm*dl is
    pre-folded into the resident weights, the zero point lives in the clip
    BOUNDS (shifted-clip codes, so it telescopes out of the tap sum), and
    the MXU is fed exact integer codes in bf16 — ~4 input-sized VPU ops per
    tap (mul, round, two clips) instead of ~7, and no bf16 rounding of
    dequantized values."""
    oi = pl.program_id(0)
    qmax = float(2 ** a_bits - 1)
    nb = nbatch * h_blocks
    bands = (band0, band1)
    stages = (stage0, stage1)

    cw = pltpu.make_async_copy(
        w_hbm.at[:, :, pl.dslice(oi * bo, bo)], wt_ref, sem_w)
    cw.start()

    def band_copy(idx, buf):
        bi = idx // h_blocks
        h0 = (idx % h_blocks) * bh
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.dslice(h0, bh + kh - 1)], bands[buf],
            sem_x.at[buf])

    def out_copy(idx, buf):
        bi = idx // h_blocks
        h0 = (idx % h_blocks) * bh
        return pltpu.make_async_copy(
            stages[buf],
            o_hbm.at[bi, pl.dslice(h0, bh), :, pl.dslice(oi * bo, bo)],
            sem_o.at[buf])

    band_copy(0, 0).start()
    cw.wait()

    def sub_iter(idx, buf, first, last):
        band_copy(idx, buf).wait()
        acc = jnp.zeros((bh * w_out, bo), jnp.float32)
        for t in range(kh * kw):
            i, j = t // kw, t % kw
            xs = bands[buf][i : i + bh, j : j + w_out, :]
            rd = rd_ref[t, :]          # 1/(dm*dl): no VPU divides
            z = z_ref[t, :]            # zm + zl, in the clip bounds only
            xq = jnp.clip(jnp.round(xs.astype(jnp.float32) * rd),
                          -z, qmax - z)
            xm = xq.reshape(bh * w_out, -1).astype(wt_ref.dtype)
            acc = acc + jax.lax.dot_general(
                xm, wt_ref[t],        # weights carry the dm*dl fold
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # band consumed: prefetch the band after next into this buffer
        @pl.when(idx + 2 < nb)
        def _():
            band_copy(idx + 2, buf).start()

        # stage may still be draining from two bands ago
        @pl.when(jnp.logical_not(first))
        def _():
            out_copy(idx - 2, buf).wait()
        stages[buf][...] = (acc + b_ref[0, :]).reshape(
            bh, w_out, bo).astype(stages[buf].dtype)
        out_copy(idx, buf).start()
        # drain the final copies before the program ends
        @pl.when(last)
        def _():
            out_copy(idx, buf).wait()

    band_copy(1, 1).start()

    def body(step, _):
        idx = step * 2
        sub_iter(idx, 0, first=step == 0, last=idx == nb - 2)
        sub_iter(idx + 1, 1, first=step == 0, last=idx + 1 == nb - 1)
        return 0

    jax.lax.fori_loop(0, nb // 2, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "padding", "a_bits", "block_h", "interpret"),
)
def group_quant_conv(
    x: jax.Array,          # (B, H, W, C) bf16/f32
    w: jax.Array,          # (kh, kw, C, O)
    dm: jax.Array,         # (kh*kw, C) per-tap-channel delta (c-major mid axis)
    zm: jax.Array,         # (kh*kw, C) zero points
    dl: jax.Array,         # scalar spatial/last-axis delta factor
    zl: jax.Array,         # scalar last-axis zero-point offset
    bias,                  # (O,) or None
    kh: int = 3,
    kw: int = 3,
    padding: int = 1,
    a_bits: int = 8,
    block_h: int = 16,
    interpret: bool = False,
) -> jax.Array:
    b, h, w_in, c = x.shape
    o = w.shape[-1]
    w_out = w_in + 2 * padding - kw + 1
    h_out = h + 2 * padding - kh + 1
    # DMA alignment: sublane (W) extent 8-aligned, lane (C/O) 128-aligned.
    # Padded channels quantize to exactly 0 (delta=1, zp=0) and meet zero
    # weights; the MXU pads K to 128 internally anyway.
    wp8 = -(-(w_in + 2 * padding) // 8) * 8
    cp = -(-c // 128) * 128
    op = -(-o // 128) * 128
    xp = jnp.pad(x, ((0, 0), (padding, padding),
                     (padding, wp8 - w_in - padding), (0, cp - c)))
    if cp != c or op != o:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, op - o)))
        dm = jnp.pad(dm, ((0, 0), (0, cp - c)), constant_values=1.0)
        zm = jnp.pad(zm, ((0, 0), (0, cp - c)))

    dtype_bytes = jnp.dtype(x.dtype).itemsize
    bh = _pick_block_h(h_out, b, block_h)
    if bh is None:
        raise ValueError(f"group_quant_conv: cannot tile h_out={h_out} — "
                         f"guard calls with fused_eligible()")
    h_blocks = h_out // bh
    bo = _pick_block_o(kh, kw, cp, op, dtype_bytes)
    if bo is None:
        raise ValueError(
            f"group_quant_conv: weight set for C={c} exceeds VMEM budget — "
            f"guard calls with fused_eligible()")

    if bias is None:
        bias = jnp.zeros((o,), jnp.float32)
    if op != o:
        bias = jnp.pad(jnp.asarray(bias), (0, op - o))

    dmf = dm.astype(jnp.float32)
    dlf = dl.reshape(()).astype(jnp.float32)
    # fold dm*dl into the weights (f32, then the MXU feed dtype) so the
    # kernel contracts exact integer codes — the taps-path fold
    # (models/layers.py) applied to the streamed kernel
    w_t = (jnp.reshape(w, (kh * kw, cp, op)).astype(jnp.float32)
           * (dmf * dlf)[:, :, None]).astype(x.dtype)
    rd = 1.0 / (dmf * dlf)
    z = zm.astype(jnp.float32) + zl.reshape(()).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, bh=bh, w_out=w_out,
                          h_blocks=h_blocks, nbatch=b, a_bits=a_bits, bo=bo),
        grid=(op // bo,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x: streamed in-kernel
            pl.BlockSpec(memory_space=pltpu.ANY),   # w: tile set per program
            pl.BlockSpec((kh * kw, cp), lambda oi: (0, 0),
                         memory_space=pltpu.VMEM),  # rd = 1/(dm*dl)
            pl.BlockSpec((kh * kw, cp), lambda oi: (0, 0),
                         memory_space=pltpu.VMEM),  # z = zm + zl
            pl.BlockSpec((1, bo), lambda oi: (0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # written via DMA
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, op), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((kh * kw, cp, bo), x.dtype),      # resident weights
            pltpu.VMEM((bh + kh - 1, wp8, cp), x.dtype),  # band 0
            pltpu.VMEM((bh + kh - 1, wp8, cp), x.dtype),  # band 1
            pltpu.VMEM((bh, w_out, bo), x.dtype),         # out stage 0
            pltpu.VMEM((bh, w_out, bo), x.dtype),         # out stage 1
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_out * w_out * kh * kw * c * o,
            bytes_accessed=(
                (op // (bo or 1)) * b * (h + 2 * padding) * wp8 * cp * 2
                + kh * kw * cp * op * 2 + b * h_out * w_out * op * 2),
            transcendentals=0,
        ),
    )(xp, w_t, rd, z, bias.reshape(1, -1).astype(jnp.float32))
    return out[..., :o]


def _pick_block_h(h_out: int, b: int, block_h: int = 16):
    """bh dividing h_out with an even total band count (the kernel's
    fori_loop processes two bands per step); None when impossible."""
    bh = block_h
    while bh and (h_out % bh or (b * (h_out // bh)) % 2):
        bh //= 2
    return bh or None


def fused_eligible(x_shape, o: int, kh: int, kw: int, stride: int,
                   padding: int, gqp, dtype_bytes: int = 2) -> bool:
    """Static trace-time check: fused kernel supports stride-1 k×k convs with
    per-(tap,channel) mid-axis scales and scalar last-axis factors; the
    height must tile into an even band count, and the resident weight set +
    band/stage buffers (allocated in the activation dtype) must fit VMEM."""
    from dgq_tpu.models.qconfig import GroupQParams

    if stride != 1:
        return False
    if not isinstance(gqp, GroupQParams):
        return False
    b, h, w, c = x_shape
    if gqp.delta_mid.shape[-1] != c * kh * kw:
        return False
    if gqp.delta_last.shape[-1] != 1:  # spatial (per-L) groups not supported
        return False
    h_out = h + 2 * padding - kh + 1
    bh = _pick_block_h(h_out, b)
    if bh is None:
        return False
    cp = -(-c // 128) * 128
    op = -(-o // 128) * 128
    bo = _pick_block_o(kh, kw, cp, op, dtype_bytes)
    if bo is None:
        return False
    wp8 = -(-(w + 2 * padding) // 8) * 8
    w_out = w + 2 * padding - kw + 1
    vmem = (kh * kw * cp * bo * dtype_bytes            # resident weight set
            + 2 * (bh + kh - 1) * wp8 * cp * dtype_bytes  # band double-buffer
            + 2 * bh * w_out * bo * dtype_bytes)          # output stages
    return vmem < 12 * 1024 * 1024
