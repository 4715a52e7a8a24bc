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
