"""Content-video rectified-flow inversion CLI (SD3/SD3.5 backbone).

Flag-for-flag rebuild of src/sd3/run_content_inversion_sd3.py: RF-Inversion
(default) or RF-Solver (--is_rf_solver) over the MMDiT, trajectory written in
the reference format ([F, C, H, W] fp16 per step — SD3 batches frames), block
feature capture for mask propagation, controlled-velocity reconstruction as
the oracle."""

from __future__ import annotations

import argparse
import os

import numpy as np

from univst_tpu.utils.io import fetch_array

from univst_tpu.cli.common import add_mesh_flag, apply_mesh_arg, make_output_tree, parse_dtype, save_feature_pt, setup_jax
from univst_tpu.utils.io import load_video, save_video, seed_everything


def build_sd3_pipeline(args, capture_block=None):
    from univst_tpu.pipelines.sd3 import SD3VideoPipeline

    pipe = SD3VideoPipeline.build(
        pretrained_model_path=args.pretrained_model_path,
        variant=args.variant,
        num_frames=args.num_frames,
        height=args.height,
        width=args.width,
        dtype=parse_dtype(args.weight_dtype),
        capture_block=capture_block,
        seed=args.seed or 0,
    )
    return apply_mesh_arg(pipe, args)


def main(args):
    setup_jax(args.platform)
    import jax

    from univst_tpu.core.trajectory import save_trajectory
    if args.seed is not None:
        seed_everything(args.seed)

    pipe = build_sd3_pipeline(args, capture_block=args.ft_indices)
    name = os.path.basename(os.path.normpath(args.content_path)).split(".")[0]
    paths = make_output_tree(args.output_path, args.backbone, name)

    frames = load_video(args.content_path, args.num_frames, (args.width, args.height))
    latents = pipe.encode_frames(frames, jax.random.PRNGKey(args.seed or 0))
    context, pooled = pipe.encode_prompt("")
    # prompts are encoded once; release the ~11 GB of T5/CLIP params so the
    # denoise loop fits a 16 GB chip (pipelines/sd3.py free_text_encoders)
    pipe.free_text_encoders()

    print("inversion:")
    traj, feat = pipe.invert(
        latents, context, pooled, num_steps=args.time_steps,
        is_rf_solver=args.is_rf_solver, capture_step=args.ft_timesteps,
    )
    save_trajectory(fetch_array(traj), paths["inversion"], reference_rank=4)
    if feat is not None:
        save_feature_pt(np.asarray(feat), paths["features"], args.ft_indices, args.ft_timesteps)

    print("reconstruction:")
    lat0 = pipe.reconstruct_latents(
        traj[-1], latents, context, pooled, num_steps=args.time_steps,
        eta_base=0.85, eta_trend="constant", start_step=25, end_step=39,
    )
    video = fetch_array(pipe.decode_latents(lat0))
    save_video(video, os.path.join(paths["reconstruction"], "content_video.mp4"), fps=8)
    print(f"done -> {paths['base']}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--content_path", type=str, default="examples/contents/mallard-fly")
    p.add_argument("--output_path", type=str, default="results/contents-inv")
    p.add_argument("--weight_dtype", type=str, default="bf16")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--time_steps", type=int, default=50)
    p.add_argument("--ft_indices", type=int, default=20, help="transformer block index")
    p.add_argument("--ft_timesteps", type=int, default=5, help="inversion step index")
    p.add_argument("--is_rf_solver", action="store_true", help="use RF-Solver")
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--variant", type=str, default="sd3", choices=["sd3", "sd35", "sd35m", "tiny"])
    p.add_argument("--backbone", type=str, default="sd3")
    p.add_argument("--platform", type=str, default=None)
    add_mesh_flag(p)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
