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


def spec_cost(spec, latent_hw: int = 64, seq: int = 77, heads: int = 8,
              head_dim_divisor: int = 64) -> dict:
    """Analytic Params/MACs for a UNet spec at a given latent size.

    Spatial sizes are tracked per level from stride-2 convs; attention token
    counts follow the conv feature map at each transformer's level.
    """
    params = 0
    macs = 0
    # track output H of each layer by simulating strides per block prefix
    hw = {}

    def level_hw(name: str) -> int:
        # down_blocks.i at scale /2^i (after i downsamples); mid at /8; up
        # blocks mirror. This matches SD/SDXL topology.
        if name.startswith("down_blocks."):
            i = int(name.split(".")[1])
            # a block's convs run at the scale BEFORE its downsampler
            scale = 2 ** i
            if ".downsamplers." in name:
                scale = 2 ** i  # conv input at current scale, stride 2
            return max(latent_hw // scale, 1)
        if name.startswith("mid_block"):
            return max(latent_hw // 8, 1)
        if name.startswith("up_blocks."):
            i = int(name.split(".")[1])
            n_up = 3  # SD has 4 up blocks at scales 8,8,4,2 / SDXL 3
            return max(latent_hw // (2 ** max(3 - i, 0)), 1)
        return latent_hw

    attn_token_ch = []
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
            if ".attn" in name or ".ff." in name or "proj" in name:
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

    def level_hw(name: str) -> int:
        if name.startswith("down_blocks."):
            return max(latent_hw // (2 ** int(name.split(".")[1])), 1)
        if name.startswith("mid_block"):
            return max(latent_hw // 8, 1)
        if name.startswith("up_blocks."):
            i = int(name.split(".")[1])
            return max(latent_hw // (2 ** max(3 - i, 0)), 1)
        return latent_hw

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
            if ".attn" in name or ".ff." in name or "proj" in name:
                t = h * h
                if (".to_k" in name or ".to_v" in name) and ".attn2." in name:
                    t = seq
                macs = batch * cin * cout * t
                byt = (cin * cout + batch * t * (cin + cout)) * BY
                if name.endswith(".to_q"):
                    tq = h * h
                    ts = seq if ".attn2." in name else tq
                    hd = attn_head_dim or max(cout // heads, 1)
                    pad = max(mxu_lane / hd, 1.0)  # lane-padding tax
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
