"""Write synthetic checkpoint DIRECTORIES with the released layouts.

The weights-day fire drill (VERDICT r3 #4): every CLI accepts
``--pretrained_model_path``; this script materializes directories whose
file layout and tensor key names/shapes match the released checkpoints
(diffusers SD UNet/VAE + transformers CLIP; AnimateDiff motion ckpt;
SD3 MMDiT + dual CLIP + T5), with random values, so the complete
load -> convert -> merge -> run path can be exercised offline. Any
key-name drift in the converters fails the load loudly.

    python scripts/make_synthetic_checkpoints.py --root /tmp/synth_ckpt \
        [--variant tiny] [--families sd,ad,sd3] [--frames 4]

Layout written (reference: run_content_inversion_sd.py:39-43 builds from
unet/, vae/, text_encoder/; run_content_inversion_sd3.py:42-52 from
transformer/, vae/, text_encoder{,_2,_3}/; AnimateDiff motion weights are
a single ckpt file, util.py:89-121):

    {root}/sd/{unet,vae,text_encoder}/diffusion_pytorch_model.safetensors
    {root}/ad/{unet,vae,text_encoder}/... + {root}/ad/mm.ckpt
    {root}/sd3/{transformer,vae,text_encoder,text_encoder_2,text_encoder_3}/...
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import os


def _save(sd, dirpath, name="diffusion_pytorch_model.safetensors"):
    from safetensors.numpy import save_file

    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, name)
    save_file(sd, path)
    print(f"  {path}: {len(sd)} tensors")


def make_sd(root: str, variant: str, frames: int, size: int):
    import jax.numpy as jnp

    from univst_tpu.models import synth_ckpt as sk
    from univst_tpu.pipelines.sd import SDVideoPipeline

    pipe = SDVideoPipeline.build(
        variant=variant, num_frames=frames, height=size, width=size,
        dtype=jnp.float32,
    )
    _save(sk.synth_sd_unet(pipe.unet_params, pipe.unet.cfg),
          os.path.join(root, "unet"))
    _save(sk.synth_vae(pipe.vae_params, pipe.vae.cfg),
          os.path.join(root, "vae"))
    _save(sk.synth_clip_text(pipe.text_params, pipe.text_encoder.cfg),
          os.path.join(root, "text_encoder"), name="model.safetensors")


def make_ad(root: str, variant: str, frames: int, size: int):
    import torch

    import jax.numpy as jnp

    from univst_tpu.models import synth_ckpt as sk
    from univst_tpu.pipelines.animatediff import build_animatediff

    pipe = build_animatediff(
        variant=variant, num_frames=frames, height=size, width=size,
        dtype=jnp.float32,
    )
    _save(sk.synth_ad_unet(pipe.unet_params, pipe.unet.cfg),
          os.path.join(root, "unet"))
    _save(sk.synth_vae(pipe.vae_params, pipe.vae.cfg),
          os.path.join(root, "vae"))
    _save(sk.synth_clip_text(pipe.text_params, pipe.text_encoder.cfg),
          os.path.join(root, "text_encoder"), name="model.safetensors")
    mm = sk.synth_motion_module(pipe.unet_params, pipe.unet.cfg)
    os.makedirs(root, exist_ok=True)
    mm_path = os.path.join(root, "mm.ckpt")
    # real motion ckpts are torch pickles (epoch/global_step + state_dict)
    torch.save(
        {"epoch": 0, "global_step": 0,
         "state_dict": {k: torch.from_numpy(v) for k, v in mm.items()}},
        mm_path,
    )
    print(f"  {mm_path}: {len(mm)} tensors")


def make_sd3(root: str, variant: str, frames: int, size: int):
    import jax.numpy as jnp

    from univst_tpu.models import synth_ckpt as sk
    from univst_tpu.pipelines.sd3 import SD3VideoPipeline

    pipe = SD3VideoPipeline.build(
        variant=variant, num_frames=frames, height=size, width=size,
        dtype=jnp.float32,
    )
    _save(sk.synth_mmdit(pipe.mmdit_params, pipe.mmdit.cfg),
          os.path.join(root, "transformer"))
    _save(sk.synth_vae(pipe.vae_params, pipe.vae.cfg),
          os.path.join(root, "vae"))
    _save(sk.synth_clip_text(pipe.clip_l_params, pipe.clip_l.cfg),
          os.path.join(root, "text_encoder"), name="model.safetensors")
    _save(sk.synth_clip_text(pipe.clip_g_params, pipe.clip_g.cfg),
          os.path.join(root, "text_encoder_2"), name="model.safetensors")
    _save(sk.synth_t5(pipe.t5_params, pipe.t5.cfg),
          os.path.join(root, "text_encoder_3"), name="model.safetensors")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/synth_ckpt")
    p.add_argument("--variant", default="tiny",
                   help="tiny (tests) or the real configs (sd15/ad/sd3) for "
                        "full-scale layout manifests")
    p.add_argument("--families", default="sd,ad,sd3")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    fams = args.families.split(",")
    variants = {
        "sd": args.variant if args.variant != "tiny" else "tiny",
        "ad": "ad" if args.variant not in ("tiny",) else "tiny",
        "sd3": "sd3" if args.variant not in ("tiny",) else "tiny",
    }
    if "sd" in fams:
        print("sd:")
        make_sd(os.path.join(args.root, "sd"), variants["sd"], args.frames, args.size)
    if "ad" in fams:
        print("ad:")
        make_ad(os.path.join(args.root, "ad"), variants["ad"], args.frames, args.size)
    if "sd3" in fams:
        print("sd3:")
        make_sd3(os.path.join(args.root, "sd3"), variants["sd3"], args.frames, args.size)
    print(f"synthetic checkpoints written under {args.root}")


if __name__ == "__main__":
    main()
