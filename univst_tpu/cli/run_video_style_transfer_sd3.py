"""Localized video style transfer CLI (SD3/SD3.5 backbone).

Rebuild of src/sd3/run_video_style_transfer_sd3.py: loads both trajectories
AND the clean content image latents (ddim_latents_0) for the controlled
velocity pull, AdaIN-shifts the initial noise per-frame, runs the 3-branch
flow stylization. The reference file has a broken ``from util import`` path
and an undefined-variable crash in its masked AdaIN window
(custom_pipeline.py:303) — both fixed by construction here (SURVEY.md §7)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from univst_tpu.cli.common import (
    add_mesh_flag, setup_jax, singleton_style_or_fallback,
)
from univst_tpu.cli.run_content_inversion_sd3 import build_sd3_pipeline
from univst_tpu.utils.io import load_mask, save_frames, seed_everything


def main(args):
    setup_jax(args.platform)
    import jax.numpy as jnp

    from univst_tpu.core.adain import latent_adain_sd3
    from univst_tpu.core.config import StyleTransferConfig
    from univst_tpu.core.trajectory import load_trajectory
    if args.seed is not None:
        seed_everything(args.seed)

    pipe = build_sd3_pipeline(args)

    content_rev = load_trajectory(args.content_inv_path, args.time_steps, reverse=True)
    style_rev = load_trajectory(args.style_inv_path, args.time_steps, reverse=True)
    if pipe.style_singleton:
        pipe, style_rev = singleton_style_or_fallback(
            pipe, style_rev, args.style_inv_path, args.time_steps)
    # clean content image latents (= ddim_latents_0 = last of reversed order)
    img_latents = content_rev[-1]

    # init latent shift, per-frame variant (sd3 pnp_utils.py:305-316)
    init_latents = latent_adain_sd3(content_rev[0], style_rev[0])

    mask = None
    if args.mask_path:
        mask = jnp.asarray(load_mask(args.mask_path, args.num_frames))

    context, pooled = pipe.encode_prompt("")
    # prompts are encoded once; release the ~11 GB of T5/CLIP params so the
    # denoise loop fits a 16 GB chip (pipelines/sd3.py free_text_encoders)
    pipe.free_text_encoders()
    context3 = jnp.concatenate([context] * 3, axis=0)
    pooled3 = jnp.concatenate([pooled] * 3, axis=0)

    out = pipe.stylize_latents(
        content_rev, style_rev, init_latents, img_latents, context3, pooled3,
        mask=mask,
        cfg=StyleTransferConfig(
            num_steps=args.time_steps, eta_base=0.85, eta_trend="constant",
            eta_start_step=25, eta_end_step=39,
        ),
    )
    frames = np.asarray(pipe.decode_latents(out))

    content_name = os.path.normpath(args.content_inv_path).split(os.sep)[-2]
    style_name = os.path.normpath(args.style_inv_path).split(os.sep)[-2]
    out_dir = os.path.join(args.output_path, args.backbone, f"{content_name}_{style_name}")
    save_frames(frames, out_dir)
    print(f"done -> {out_dir}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--content_inv_path", type=str,
                   default="results/contents-inv/sd3/mallard-fly/inversion")
    p.add_argument("--style_inv_path", type=str,
                   default="results/styles-inv/sd3/00033/inversion")
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--output_path", type=str, default="results/stylizations")
    p.add_argument("--weight_dtype", type=str, default="bf16")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--time_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--variant", type=str, default="sd3", choices=["sd3", "sd35", "sd35m", "tiny"])
    p.add_argument("--backbone", type=str, default="sd3")
    p.add_argument("--platform", type=str, default=None)
    add_mesh_flag(p)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
