"""Content-video DDIM inversion CLI (SD backbone).

Flag-for-flag rebuild of src/sd/run_content_inversion_sd.py: inverts the
content video with (optionally EasyInv-optimized) DDIM, writes the full latent
trajectory as ``ddim_latents_{i}.pt`` (reference layout), captures the
up-block feature map for mask propagation, and writes a reconstruction mp4 as
the correctness oracle.

Extra flags beyond the reference: --variant (sd15|sd21|tiny), --platform, and
weights are optional (random init when no checkpoint dir is given — this
environment has no model hub access).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from univst_tpu.utils.io import fetch_array

from univst_tpu.cli.common import add_mesh_flag, build_pipeline_from_args, make_output_tree, save_feature_pt, setup_jax
from univst_tpu.utils.io import load_video, save_video, seed_everything


def main(args):
    setup_jax(args.platform)
    import jax

    from univst_tpu.core.trajectory import save_trajectory
    
    if args.seed is not None:
        seed_everything(args.seed)

    pipe = build_pipeline_from_args(args, capture_up_block=args.ft_indices)
    name = os.path.basename(os.path.normpath(args.content_path)).split(".")[0]
    paths = make_output_tree(args.output_path, args.backbone, name)

    frames = load_video(args.content_path, args.num_frames, (args.width, args.height))
    key = jax.random.PRNGKey(args.seed or 0)
    latents = pipe.encode_frames(frames, key)
    context = pipe.encode_text(args.prompt)

    print("inversion:")
    traj, feat = pipe.invert(
        latents, context, num_steps=args.time_steps, is_opt=args.is_opt,
        capture_timestep=args.ft_timesteps,
    )
    save_trajectory(fetch_array(traj), paths["inversion"])
    if feat is not None:
        save_feature_pt(np.asarray(feat), paths["features"], args.ft_indices, args.ft_timesteps)

    print("reconstruction:")
    lat0 = pipe.reconstruct_latents(traj[-1], context, num_steps=args.time_steps)
    video = fetch_array(pipe.decode_latents(lat0))
    save_video(video, os.path.join(paths["reconstruction"], "content_video.mp4"))
    print(f"done -> {paths['base']}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_path", type=str, default=None,
                   help="diffusers-layout checkpoint dir; random init if omitted")
    p.add_argument("--content_path", type=str, default="examples/contents/mallard-fly")
    p.add_argument("--output_path", type=str, default="results/contents-inv")
    p.add_argument("--weight_dtype", type=str, default="bf16")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--time_steps", type=int, default=50)
    p.add_argument("--ft_indices", type=int, default=2)
    p.add_argument("--ft_timesteps", type=int, default=301)
    p.add_argument("--is_opt", action="store_true", help="use EasyInv")
    p.add_argument("--seed", type=int, default=33)
    p.add_argument("--variant", type=str, default="sd15", choices=["sd15", "sd21", "tiny"])
    p.add_argument("--backbone", type=str, default="sd")
    p.add_argument("--prompt", type=str, default="",
                   help="inversion prompt (reference always uses ''; non-empty "
                        "prompts need tokenizer files under --pretrained_model_path)")
    p.add_argument("--platform", type=str, default=None)
    add_mesh_flag(p)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
