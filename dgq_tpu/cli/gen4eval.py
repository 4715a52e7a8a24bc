"""Batch image generation for evaluation (reference src/gen4eval_SD.py /
gen4eval_SDXL.py / gen4eval_fp.py).

Data parallelism: the reference's embarrassing parallel scheme
(--gpu_rank/--world_size prompt slicing, gen4eval_SD.py:235) across
processes, and additionally `--dp N` shards each generation batch over an
N-device in-process mesh (GSPMD partitions the sampling scan; the batch
size must be a multiple of N — short tail batches are padded by repeating
the last prompt and the extra images dropped).
"""
from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np

from dgq_tpu.cli.common import (
    add_quant_args,
    build_model,
    model_type_from_env,
    qconfig_from_args,
)


def read_prompts(path: str) -> list[str]:
    """metadata.csv (COCO-30k) or PartiPrompts.tsv (reference utils.py)."""
    prompts = []
    if path.endswith(".tsv"):
        with open(path) as f:
            for i, row in enumerate(csv.reader(f, delimiter="\t")):
                if i == 0 and row and row[0].lower() == "prompt":
                    continue
                if row:
                    prompts.append(row[0])
    else:
        with open(path) as f:
            rd = csv.DictReader(f)
            for row in rd:
                prompts.append(row.get("caption") or row.get("prompt") or list(row.values())[0])
    return prompts


def parse_args():
    ap = argparse.ArgumentParser(description="DGQ-TPU eval generation")
    ap.add_argument("--model", default=model_type_from_env(), choices=["sd", "sdxl"])
    add_quant_args(ap)
    ap.add_argument("--prompts", required=True, help="metadata.csv / PartiPrompts.tsv")
    ap.add_argument("--outdir", default="eval_images")
    ap.add_argument("--gpu_rank", type=int, default=0)
    ap.add_argument("--world_size", type=int, default=1)
    ap.add_argument("--dp", type=int, default=1,
                    help="in-process data-parallel devices: each batch "
                         "shards over a dp mesh (batch must be a multiple)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=-1)
    ap.add_argument("--n_per_prompt", type=int, default=1)
    ap.add_argument("--height", type=int, default=-1,
                    help="image height (default 512 sd / 1024 sdxl)")
    ap.add_argument("--width", type=int, default=-1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cali_ckpt", default=None)
    ap.add_argument("--use_aq", action="store_true")
    ap.add_argument("--use_group", action="store_true")
    ap.add_argument("--fp", action="store_true", help="full precision (no quant)")
    ap.add_argument("--im256", action="store_true", help="also save 256px copies")
    # --text_weights/--text_weights_2/--tokenizer/--tokenizer_2 come from
    # add_quant_args (shared with the calibration CLIs)
    ap.add_argument("--unet_weights", default=None)
    ap.add_argument("--vae_weights", default=None)
    ap.add_argument("--base", type=int, default=None)
    return ap.parse_args()


def main():
    args = parse_args()
    from dgq_tpu.cli.common import maybe_init_multihost

    maybe_init_multihost(args)
    steps = args.steps if args.steps > 0 else (25 if args.model == "sd" else 4)
    from dgq_tpu.parallel.mesh import shard_prompts

    all_prompts = read_prompts(args.prompts)
    prompts = shard_prompts(all_prompts, args.gpu_rank, args.world_size)
    # global prompt index base for this rank's shard (collision-free image
    # naming across ranks; shard_prompts slices contiguously)
    per_rank = (len(all_prompts) + args.world_size - 1) // args.world_size
    prompt_base = args.gpu_rank * per_rank
    os.makedirs(args.outdir, exist_ok=True)
    im256_dir = args.outdir.rstrip("/") + "_im256"
    if args.im256:
        os.makedirs(im256_dir, exist_ok=True)

    spec, params, apply_fn, latent_hw, cross = build_model(
        args.model, base=args.base, seed=args.seed, hf_unet_path=args.unet_weights,
        sdxl_depths=args.sdxl_depths,
    )
    from dgq_tpu.models.qconfig import QConfig

    qstate = None
    time_aware = False
    if args.fp:
        cfg, params_q = QConfig(), params
    else:
        cfg = qconfig_from_args(args, use_wq=True, use_aq=args.use_aq)
        if args.cali_ckpt:
            from dgq_tpu.calib.act_calib import stack_time_qstates
            from dgq_tpu.calib.weight_calib import fold_weight_quant
            from dgq_tpu.io.dgq_ckpt import load_merged

            p2, wqp, alphas, per_t, group_layers = load_merged(args.cali_ckpt, spec)
            if p2 is not None:
                params = p2
            params_q = fold_weight_quant(params, wqp or {}, spec, cfg,
                                         alphas=alphas or None, soft=False)
            if args.use_group and group_layers:
                cfg = cfg.replace(group_conv_layers=group_layers)
            if args.use_aq and per_t:
                if args.time_aware_aqtizer and len(per_t) > 1:
                    qstate = stack_time_qstates(per_t)
                    time_aware = True
                else:
                    qstate = per_t["act_0"]
        else:
            from dgq_tpu.calib.weight_calib import quantize_model_weights
            from dgq_tpu.quant.scalers import Scaler

            params_q, _ = quantize_model_weights(params, spec, cfg, Scaler.MINMAX)

    from dgq_tpu.pipeline.sd_pipeline import SDPipeline
    from dgq_tpu.calib.data import synthetic_prompt_embeddings

    # text encoder / tokenizer optional; fall back to synthetic embeddings
    text_params = text_params_2 = tokenizer = tokenizer_2 = vae_params = None
    if args.text_weights and args.tokenizer:
        from dgq_tpu.io.hf_loader import load_state_dict_any
        from dgq_tpu.pipeline.text_encoder import hf_clip_text_to_params
        from transformers import CLIPTokenizer

        text_params = hf_clip_text_to_params(load_state_dict_any(args.text_weights))
        tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer)
    if args.text_weights_2 and args.tokenizer_2:
        from dgq_tpu.io.hf_loader import load_state_dict_any
        from dgq_tpu.pipeline.text_encoder import hf_clip_text_to_params
        from transformers import CLIPTokenizer

        text_params_2 = hf_clip_text_to_params(
            load_state_dict_any(args.text_weights_2))
        tokenizer_2 = CLIPTokenizer.from_pretrained(args.tokenizer_2)
    if args.vae_weights:
        from dgq_tpu.io.hf_loader import load_state_dict_any
        from dgq_tpu.pipeline.vae import hf_vae_to_params

        vae_params = hf_vae_to_params(load_state_dict_any(args.vae_weights))

    if args.model == "sdxl":
        from dgq_tpu.cli.common import pooled_dim_for
        from dgq_tpu.pipeline.sd_pipeline import SDXLTurboPipeline

        pipe = SDXLTurboPipeline(
            unet_params=params_q, vae_params=vae_params, cfg=cfg,
            qstate=qstate, time_aware=time_aware, unet_apply=apply_fn,
            text_params_l=text_params, text_params_g=text_params_2,
            tokenizer=tokenizer, tokenizer_2=tokenizer_2,
        )
    else:
        pipe = SDPipeline(
            unet_params=params_q, text_params=text_params, vae_params=vae_params,
            tokenizer=tokenizer, cfg=cfg, qstate=qstate, time_aware=time_aware,
            unet_apply=apply_fn,
        )

    mesh = None
    if args.dp > 1:
        import jax

        from dgq_tpu.parallel.mesh import make_mesh, shard_params_tp

        if len(jax.devices()) < args.dp:
            raise SystemExit(
                f"--dp {args.dp} needs {args.dp} devices, "
                f"found {len(jax.devices())}")
        if args.batch % args.dp:
            raise SystemExit(f"--batch {args.batch} must be a multiple of "
                             f"--dp {args.dp}")
        mesh = make_mesh(dp=args.dp, tp=1)
        # tp=1: every weight leaf lands replicated on the mesh; the batch
        # axis of the embeddings below is what shards
        pipe.unet_params = shard_params_tp(mesh, pipe.unet_params)

    def batch_embeds(batch_prompts, seed):
        """(cond, other) embedding pair for one batch: real encoders when
        mounted, synthetic otherwise."""
        if args.model == "sdxl":
            if None not in (tokenizer, tokenizer_2, text_params, text_params_2):
                return pipe.encode_prompts(batch_prompts)
            from dgq_tpu.calib.data import synthetic_sdxl_embeddings

            return synthetic_sdxl_embeddings(
                len(batch_prompts), dim=cross,
                pooled_dim=pooled_dim_for(args.model, args.base), seed=seed)
        if tokenizer is not None and text_params is not None:
            return pipe.encode_prompts(batch_prompts)
        return synthetic_prompt_embeddings(
            len(batch_prompts), dim=cross, seed=seed)

    t_start = time.perf_counter()
    count = 0
    for i in range(0, len(prompts), args.batch):
        batch_prompts = prompts[i : i + args.batch]
        n_real = len(batch_prompts)
        if mesh is not None and n_real % args.dp:
            # pad the tail batch to a dp multiple; padded outputs dropped
            batch_prompts = batch_prompts + [batch_prompts[-1]] * (
                args.dp - n_real % args.dp)
        for rep in range(args.n_per_prompt):
            seed = args.seed + rep * 100003 + i
            emb_a, emb_b = batch_embeds(batch_prompts, seed)
            if mesh is not None:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec

                dp_sh = NamedSharding(mesh, PartitionSpec("dp"))
                emb_a = jax.device_put(emb_a, dp_sh)
                emb_b = jax.device_put(emb_b, dp_sh)
            size_kw = {}
            if args.height > 0:
                size_kw["height"] = args.height
            if args.width > 0:
                size_kw["width"] = args.width
            imgs = pipe.generate_from_embeddings(
                emb_a, emb_b, steps=steps, seed=seed, **size_kw)[:n_real]
            for j, img in enumerate(imgs):
                # '{global_prompt_idx}_{rep}' (the reference's name_rep
                # scheme, gen4eval_SD.py:247): collision-free for ANY
                # n_per_prompt and rank count, and eval_scores recovers the
                # prompt index from the stem for CLIP alignment
                name = f"{prompt_base + i + j}_{rep}"
                if img.dtype == np.uint8:
                    from PIL import Image

                    Image.fromarray(img).save(
                        os.path.join(args.outdir, f"{name}.png"))
                    if args.im256:
                        Image.fromarray(img).resize((256, 256)).save(
                            os.path.join(im256_dir, f"{name}.png"))
                else:
                    np.save(os.path.join(args.outdir, f"{name}.npy"), img)
                count += 1
    dt = time.perf_counter() - t_start
    print(f"rank {args.gpu_rank}: {count} images in {dt:.1f}s "
          f"({count / max(dt, 1e-9):.3f} img/s)")


if __name__ == "__main__":
    main()
