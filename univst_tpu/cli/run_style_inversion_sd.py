"""Style-image DDIM inversion CLI (SD backbone).

Rebuild of src/sd/run_style_inversion_sd.py: the style image is repeated to
num_frames frames (inversion_tools/ddim_inversion.py:45-65), inverted without
EasyInv by default, trajectory + reconstruction written like content inversion
(no feature capture).

TPU-native fast path: repeating one image over frames makes every frame of
the inversion identical (temporal layers are identity at init, GroupNorm and
cross-frame attention are frame-symmetric over identical frames), so the
inversion runs on a SINGLE frame — ~16x less compute — and the trajectory is
tiled back to num_frames on save, byte-identical to the reference's
``ddim_latents_{i}.pt`` layout (exactness: tests/test_style_singleton.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from univst_tpu.utils.io import fetch_array

from univst_tpu.cli.common import add_mesh_flag, build_pipeline_from_args, make_output_tree, setup_jax
from univst_tpu.utils.io import load_style_image, save_video, seed_everything


def main(args):
    setup_jax(args.platform)
    import jax

    from univst_tpu.core.trajectory import save_trajectory
    
    if args.seed is not None:
        seed_everything(args.seed)

    num_frames_out = args.num_frames
    single = args.backbone != "animatediff"
    if single:
        # invert one frame; all repeated frames evolve identically
        args = argparse.Namespace(**{**vars(args), "num_frames": 1})
    pipe = build_pipeline_from_args(args)
    name = os.path.basename(args.style_path).split(".")[0]
    paths = make_output_tree(args.output_path, args.backbone, name)

    frames = load_style_image(args.style_path, args.num_frames, (args.width, args.height))
    latents = pipe.encode_frames(frames, jax.random.PRNGKey(args.seed or 0))
    context = pipe.encode_text(args.prompt)

    print("inversion:")
    traj, _ = pipe.invert(latents, context, num_steps=args.time_steps, is_opt=args.is_opt)
    traj_np = np.asarray(traj)
    if single and num_frames_out > 1:
        traj_np = np.tile(traj_np, (1, num_frames_out, 1, 1, 1))
    save_trajectory(traj_np, paths["inversion"])

    print("reconstruction:")
    lat0 = pipe.reconstruct_latents(traj[-1], context, num_steps=args.time_steps)
    video = fetch_array(pipe.decode_latents(lat0))
    if single and num_frames_out > 1:
        video = np.tile(video, (num_frames_out, 1, 1, 1))
    save_video(video, os.path.join(paths["reconstruction"], "style_video.mp4"), fps=8)
    print(f"done -> {paths['base']}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--style_path", type=str, default="examples/styles/00033.png")
    p.add_argument("--output_path", type=str, default="results/styles-inv")
    p.add_argument("--weight_dtype", type=str, default="bf16")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--time_steps", type=int, default=50)
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
