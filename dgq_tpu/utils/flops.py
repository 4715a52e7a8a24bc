"""Model cost accounting: Params / MACs / FLOPs / BOPs.

The reference counts by monkey-patching torch functionals with hooks
(/root/reference/diffusers_rewrite/flops.py:23-846, CLI at sd.py:632-645).
Here costs are computed two ways:

  * `spec_cost`: analytic walk of the layer spec with symbolic spatial sizes
    (exact for conv/linear; attention added from the transformer topology);
  * `jaxpr_flops`: XLA's own cost analysis of the jitted forward
    (`jax.jit(f).lower(...).compile().cost_analysis()`), covering everything.

BOPs follow the reference convention: MACs * w_bits * a_bits
(sd.py:645 uses 32x32 for fp32).
"""
from __future__ import annotations

from typing import Optional

import jax


def _make_level_hw(spec, latent_hw: int):
    """Per-layer spatial size from the UNet topology encoded in spec names.

    The level count is read off the down-block indices (SD has 4 levels —
    mid at /8, up_blocks.i at /2^(3-i); SDXL has 3 — mid at /4, up at
    /2^(2-i)), so one helper serves both models. Upsampler convs run AFTER
    the nearest-2x interpolation (unet_sd.py upsample-then-conv), so their
    input is at twice the block scale."""
    top = max((int(n.split(".")[1]) for n, _, _ in spec
               if n.startswith("down_blocks.")), default=3)

    def level_hw(name: str) -> int:
        if name.startswith("down_blocks."):
            # a block's convs (incl. its stride-2 downsampler input) run at
            # the scale before the downsample
            h = latent_hw // (2 ** int(name.split(".")[1]))
        elif name.startswith("mid_block"):
            h = latent_hw // (2 ** top)
        elif name.startswith("up_blocks."):
            i = int(name.split(".")[1])
            h = latent_hw // (2 ** max(top - i, 0))
            if ".upsamplers." in name:
                h *= 2  # conv after the 2x interpolation
        else:
            h = latent_hw
        return max(h, 1)

    return level_hw


def _is_token_linear(name: str) -> bool:
    """Linears applied per spatial/sequence token (vs once per sample).
    time_emb_proj contains 'proj' but is a per-sample vector op."""
    if "time_emb_proj" in name:
        return False
    return ".attn" in name or ".ff." in name or "proj" in name


def spec_cost(spec, latent_hw: int = 64, seq: int = 77, heads: int = 8,
              head_dim_divisor: int = 64) -> dict:
    """Analytic Params/MACs for a UNet spec at a given latent size.

    Spatial sizes are tracked per level from the spec topology; attention
    token counts follow the conv feature map at each transformer's level.
    """
    params = 0
    macs = 0
    level_hw = _make_level_hw(spec, latent_hw)

    for name, kind, meta in spec:
        if kind == "conv":
            cin, cout, k, stride, pad = meta
            params += cin * cout * k * k + cout
            h = level_hw(name)
            ho = h // stride
            macs += cin * cout * k * k * ho * ho
        elif kind == "linear":
            cin, cout, bias = meta
            params += cin * cout + (cout if bias else 0)
            if _is_token_linear(name):
                t = level_hw(name) ** 2
                if ".to_k" in name or ".to_v" in name:
                    # cross attention keys/values read the text sequence
                    t = seq if ".attn2." in name else t
                macs += cin * cout * t
                if name.endswith(".to_q"):
                    # score + value matmuls for this attention
                    tq = level_hw(name) ** 2
                    ts = seq if ".attn2." in name else tq
                    d_total = cout
                    macs += 2 * tq * ts * d_total
            else:
                macs += cin * cout  # per-sample vector ops (time embedding)
        else:
            (c,) = meta
            params += 2 * c
    return {"params": params, "macs": macs, "flops": 2 * macs}


def bops(macs: int, w_bits: int, a_bits: int) -> int:
    """Bit operations (reference sd.py:645 convention)."""
    return macs * w_bits * a_bits


def spec_roofline(spec, latent_hw: int = 64, batch: int = 8, seq: int = 77,
                  peak_tfs: float = 197.0, hbm_gbs: float = 819.0,
                  heads: int = 8, attn_head_dim: Optional[int] = None,
                  mxu_lane: int = 128) -> dict:
    """Speed-of-light estimate of one UNet forward on a TPU chip.

    Per layer: time = max(compute, memory) with compute = 2*MACs / peak and
    memory = (weights + input + output bytes in bf16) / HBM bandwidth — the
    'XLA fuses all elementwise producers' ideal, so each activation is read
    and written once per layer. Attention is modeled as flash (score/value
    matmul FLOPs counted; the TxT score matrix never touches HBM; q/k/v/o
    traffic is counted at their projection layers), with the per-head MXU
    lane-padding tax made explicit: a head_dim below the 128-wide MXU tile
    (SD runs 40/80/160 at the three widths) pads its contraction/output
    lanes, running the score/value matmuls at head_dim/128 efficiency — an
    architectural cost of the model shape, not a software gap. Norm layers
    are one read+write of their tensor. Defaults are TPU v5e: 197 bf16 TF/s,
    819 GB/s HBM; SD heads=8 (head_dim = width/8), pass attn_head_dim=64 for
    SDXL's fixed 64-wide heads.

    Returns totals plus a per-scale-level breakdown; `sol_s` is the
    irreducible sum of per-layer maxima, `compute_s`/`memory_s` the pure
    single-resource bounds. Model-width floor only — it excludes quantizer
    arithmetic, schedulers, and the VAE."""
    BY = 2  # bf16
    level_hw = _make_level_hw(spec, latent_hw)

    per_scale: dict = {}
    tot_c = tot_m = sol = 0.0
    for name, kind, meta in spec:
        h = level_hw(name)
        macs = 0
        byt = 0
        if kind == "conv":
            cin, cout, k, stride, pad = meta
            ho = h // stride
            macs = batch * cin * cout * k * k * ho * ho
            byt = (cin * cout * k * k
                   + batch * h * h * cin + batch * ho * ho * cout) * BY
        elif kind == "linear":
            cin, cout, bias = meta
            if _is_token_linear(name):
                t = h * h
                if (".to_k" in name or ".to_v" in name) and ".attn2." in name:
                    t = seq
                macs = batch * cin * cout * t
                byt = (cin * cout + batch * t * (cin + cout)) * BY
                if name.endswith(".to_q"):
                    tq = h * h
                    ts = seq if ".attn2." in name else tq
                    hd = attn_head_dim or max(cout // heads, 1)
                    # lane-padding tax: heads pad to the smallest slot the
                    # kernel can address — 64 lanes via the pair-packed
                    # layout (two heads per 128-lane block; SD's 40-wide
                    # heads run at 64/40, SDXL's 64-wide at 1.0), otherwise
                    # the next mxu_lane multiple. An architectural cost of
                    # the model's head shape, not a software gap.
                    g = 64 if (mxu_lane == 128 and hd <= 64) else mxu_lane
                    slot = -(-hd // g) * g
                    pad = max(slot / hd, 1.0)
                    macs += int(batch * 2 * tq * ts * cout * pad)  # flash
            else:  # per-sample vectors (time embedding)
                macs = batch * cin * cout
                byt = (cin * cout + batch * (cin + cout)) * BY
        else:  # norm: one fused read+write of the activation
            (c,) = meta
            byt = 2 * batch * h * h * c * BY
        c_s = 2 * macs / (peak_tfs * 1e12)
        m_s = byt / (hbm_gbs * 1e9)
        tot_c += c_s
        tot_m += m_s
        sol += max(c_s, m_s)
        lv = per_scale.setdefault(h, {"compute_s": 0.0, "memory_s": 0.0,
                                      "sol_s": 0.0, "macs": 0, "bytes": 0})
        lv["compute_s"] += c_s
        lv["memory_s"] += m_s
        lv["sol_s"] += max(c_s, m_s)
        lv["macs"] += macs
        lv["bytes"] += byt
    return {"sol_s": sol, "compute_s": tot_c, "memory_s": tot_m,
            "per_scale": dict(sorted(per_scale.items(), reverse=True))}


def xla_cost(fn, *example_args) -> Optional[dict]:
    """XLA compiled cost analysis of a jitted callable (exact graph cost)."""
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return dict(ca) if ca else None
    except Exception:
        return None
