"""Localized video style transfer CLI (SD backbone).

Rebuild of src/sd/run_video_style_transfer_sd.py: loads both inversion
trajectories, AdaIN-shifts the initial noise (pnp_utils.py latent_adain),
runs the 3-branch stylization scan with optional localized masking, and writes
per-frame PNGs to {out}/sd/{content}_{style}/."""

from __future__ import annotations

import argparse
import os

import numpy as np

from univst_tpu.utils.io import fetch_array

from univst_tpu.cli.common import (
    add_mesh_flag, build_pipeline_from_args, setup_jax,
    singleton_style_or_fallback,
)
from univst_tpu.utils.io import load_mask, save_frames, seed_everything


def main(args):
    setup_jax(args.platform)
    import jax.numpy as jnp

    from univst_tpu.core.adain import latent_adain
    from univst_tpu.core.config import StyleTransferConfig
    from univst_tpu.core.trajectory import load_trajectory

    if args.seed is not None:
        seed_everything(args.seed)

    pipe = build_pipeline_from_args(args)
    if args.smoother and args.flow == "raft":
        import dataclasses as _dc

        import jax

        from univst_tpu.models.convert import (
            convert_raft,
            load_torch_state_dict,
            merge_into_params,
        )
        from univst_tpu.models.raft import RAFT, RAFTConfig, make_raft_flow

        if not args.raft_ckpt:
            raise SystemExit("--flow raft requires --raft_ckpt (torchvision "
                             "Raft_Large_Weights or princeton-vl layout)")
        rcfg = RAFTConfig()
        zero = jnp.zeros((1, 64, 64, 3), jnp.float32)
        init = RAFT(rcfg).init(jax.random.PRNGKey(0), zero, zero)["params"]
        rparams = merge_into_params(
            init, convert_raft(load_torch_state_dict(args.raft_ckpt))
        )
        pipe = _dc.replace(pipe, flow_fn=make_raft_flow(rparams, rcfg))

    # trajectories ordered so index i holds latents at inversion step N-i
    content_rev = load_trajectory(args.content_inv_path, args.time_steps, reverse=True)
    style_rev = load_trajectory(args.style_inv_path, args.time_steps, reverse=True)
    if pipe.style_singleton and args.smoother is None:
        pipe, style_rev = singleton_style_or_fallback(
            pipe, style_rev, args.style_inv_path, args.time_steps)

    # init latent shift (run_video_style_transfer_sd.py:55-57); the
    # AnimateDiff runner passes the raw content noise instead
    # (run_video_style_transfer_animatediff.py:59-69 — no latent_adain)
    if args.backbone == "animatediff":
        init_latents = content_rev[0]
    else:
        init_latents = latent_adain(content_rev[0], style_rev[0])

    mask = None
    if args.mask_path:
        mask = jnp.asarray(load_mask(args.mask_path, args.num_frames))

    context = pipe.encode_text(args.prompt)
    context3 = jnp.concatenate([context, context, context], axis=0)

    out = pipe.stylize_latents(
        content_rev, style_rev, init_latents, context3, mask=mask,
        cfg=StyleTransferConfig(num_steps=args.time_steps, smoother=args.smoother),
    )
    frames = fetch_array(pipe.decode_latents_uint8(out))

    content_name = os.path.normpath(args.content_inv_path).split(os.sep)[-2]
    style_name = os.path.normpath(args.style_inv_path).split(os.sep)[-2]
    out_dir = os.path.join(args.output_path, args.backbone, f"{content_name}_{style_name}")
    save_frames(frames, out_dir)
    print(f"done -> {out_dir}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--content_inv_path", type=str,
                   default="results/contents-inv/sd/mallard-fly/inversion")
    p.add_argument("--style_inv_path", type=str,
                   default="results/styles-inv/sd/00033/inversion")
    p.add_argument("--mask_path", type=str, default=None,
                   help="directory of propagated per-frame masks; omit for full-frame transfer")
    p.add_argument("--output_path", type=str, default="results/stylizations")
    p.add_argument("--weight_dtype", type=str, default="bf16")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--time_steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--smoother", type=str, default=None, choices=[None, "pixel"],
                   help="sliding-window flow smoother (the reference ships this "
                        "feature disabled; 'pixel' enables it)")
    p.add_argument("--flow", type=str, default="lk", choices=["lk", "raft"],
                   help="smoother optical flow: built-in Lucas-Kanade pyramid or "
                        "RAFT-large (the reference's flow, cal_optica_flow.py:53)")
    p.add_argument("--raft_ckpt", type=str, default=None,
                   help="RAFT checkpoint (torchvision Raft_Large_Weights or "
                        "princeton-vl .pth) for --flow raft")
    p.add_argument("--variant", type=str, default="sd15", choices=["sd15", "sd21", "tiny"])
    p.add_argument("--backbone", type=str, default="sd")
    p.add_argument("--prompt", type=str, default="",
                   help="shared 3-branch prompt (reference uses '')")
    p.add_argument("--platform", type=str, default=None)
    add_mesh_flag(p)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
