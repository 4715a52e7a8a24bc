#!/usr/bin/env python
"""Dump representative HLO bodies of named fusions in the compiled VAE decode."""
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dgq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dgq_tpu.pipeline.vae import init_vae_decoder, vae_decode  # noqa: E402


def main():
    dtype = jnp.bfloat16
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_vae_decoder(jax.random.PRNGKey(0), dtype=dtype)
    lat = jnp.zeros((4, 64, 64, 4), dtype)
    hlo = jax.jit(vae_decode).lower(params, lat).compile().as_text()
    for pat in (sys.argv[1:] or ["select_bitcast_fusion", "convert_multiply_fusion",
                                 "copy.210", "reshape.221"]):
        print("#" * 90)
        m = re.search(rf"%?{pat}[\w.]* = [^\n]+", hlo)
        if not m:
            print(pat, ": not found")
            continue
        print(m.group(0)[:500])
        cm = re.search(rf"{pat}[\w.]* = [^\n]+calls=%?([\w.\-]+)", hlo)
        if cm:
            body = cm.group(1)
            bm = re.search(rf"%?{re.escape(body)} \(([^)]*)\) -> [^{{]+\{{(.*?)\n\}}", hlo, re.S)
            if bm:
                lines = bm.group(2).strip().splitlines()
                print(f"--- body {body}: {len(lines)} instrs")
                for ln in lines[:25]:
                    print("   ", ln.strip()[:170])


if __name__ == "__main__":
    main()
