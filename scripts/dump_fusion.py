#!/usr/bin/env python
"""Dump the HLO of named fusions from the profiled deploy forward (compile
is cached, so this is fast after scripts/profile_step.py has run)."""
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dgq_tpu.calib.weight_calib import (pack_attention_heads,  # noqa: E402
                                        quantize_model_weights)
from dgq_tpu.models.qconfig import QConfig  # noqa: E402
from dgq_tpu.models.unet_sd import init_unet_sd, sd_unet_spec, unet_sd_apply  # noqa: E402
from dgq_tpu.quant.scalers import Scaler  # noqa: E402
from dgq_tpu.utils.synthetic import synthetic_pertensor_qstate  # noqa: E402

B = 8


def main():
    dtype = jnp.bfloat16
    spec = sd_unet_spec()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet_sd(jax.random.PRNGKey(0), spec=spec, fast=True)
        cfg = QConfig(w_bits=4, a_bits=8, softmax_bits=8, use_wq=True,
                      use_aq=True, use_pallas_attention=True,
                      packed_attention=True)
        params_q, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)
        params_q = pack_attention_heads(params_q, spec, num_heads=8)
        params_q = jax.tree.map(
            lambda x: x.astype(dtype) if x is not None and x.dtype == jnp.float32 else x,
            params_q, is_leaf=lambda x: x is None)

    x = jnp.zeros((B, 64, 64, 4), dtype)
    t = jnp.full((B,), 500.0, dtype)
    ehs = jnp.zeros((B, 77, 768), dtype)
    qstate = synthetic_pertensor_qstate(spec, 0, False, dtype)

    fn = jax.jit(lambda p, xx, tt, ee, q: unet_sd_apply(
        p, xx, tt, ee, qstate=q, cfg=cfg))
    # lower/compile on the default (TPU) backend to get the same fusion names
    hlo = fn.lower(params_q, x, t, ehs, qstate).compile().as_text()
    pat = sys.argv[1] if len(sys.argv) > 1 else "add_divide_fusion"
    # print each matching fusion computation (the fused_computation body)
    names = sorted(set(re.findall(rf"(%?{pat}[\w.]*)\s*=", hlo)))
    print("instances:", names[:20])
    # find the fused computation bodies by locating 'calls=' references
    for m in re.finditer(rf"{pat}[\w.]* = [^\n]+calls=%?([\w.\-]+)", hlo):
        body = m.group(1)
        cm = re.search(rf"%?{re.escape(body)} \(([^)]*)\) -> [^{{]+\{{(.*?)\n\}}",
                       hlo, re.S)
        print("=" * 80)
        print(m.group(0)[:400])
        if cm:
            lines = cm.group(2).strip().splitlines()
            print(f"--- body {body}: {len(lines)} instrs")
            for ln in lines[:40]:
                print("   ", ln.strip()[:180])
        break  # one representative body is enough
    # also count total instances and their output shapes
    shapes = re.findall(rf"(\S+) {pat}[\w.]* =", hlo)
    print("output dtypes/shapes:", shapes[:12])


if __name__ == "__main__":
    main()
