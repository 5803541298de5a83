"""Standalone optical-flow / warp CLI (rebuild of src/cal_optica_flow.py's
__main__, :102-108): compute bidirectional flow between two images, write the
occlusion mask and the occlusion-blended warped image."""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image

from univst_tpu.cli.common import setup_jax


def main(args):
    setup_jax(args.platform)
    import jax.numpy as jnp

    from univst_tpu.methods.flow import (
        compute_occlusion_mask,
        get_warp,
        lucas_kanade_flow,
    )

    img1 = np.asarray(Image.open(args.image1).convert("RGB"), np.float32) / 255.0
    img2 = np.asarray(Image.open(args.image2).convert("RGB"), np.float32) / 255.0
    fwd = lucas_kanade_flow(jnp.asarray(img1), jnp.asarray(img2))
    bwd = lucas_kanade_flow(jnp.asarray(img2), jnp.asarray(img1))
    occ = np.asarray(compute_occlusion_mask(fwd, bwd, args.threshold))
    warped = np.asarray(get_warp(lucas_kanade_flow, jnp.asarray(img1), jnp.asarray(img2)))
    if args.occlusion_mask_save_path:
        Image.fromarray((occ * 255).astype(np.uint8)).save(args.occlusion_mask_save_path)
        print(f"Occlusion mask saved at {args.occlusion_mask_save_path}")
    if args.warped_image_save_path:
        Image.fromarray((np.clip(warped, 0, 1) * 255).astype(np.uint8)).save(
            args.warped_image_save_path
        )
        print(f"Warped image saved at {args.warped_image_save_path}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--image1", required=True)
    p.add_argument("--image2", required=True)
    p.add_argument("--occlusion_mask_save_path", default="occlusion_mask.png")
    p.add_argument("--warped_image_save_path", default="warped_image_with_mask.png")
    p.add_argument("--threshold", type=float, default=1.5)
    p.add_argument("--platform", type=str, default=None)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
