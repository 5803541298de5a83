"""Compare two stylization output directories (VERDICT r3 #5b).

The turnkey harness for the day real checkpoints are available: point it at
this framework's output frames and the reference's
(`%05d.png` directories, reference layout utils/util.py save conventions)
and it prints per-frame + aggregate PSNR/SSIM, and latent MSE when given
trajectory files.

Usage:
  python scripts/compare_outputs.py DIR_A DIR_B [--json]
  python scripts/compare_outputs.py --latents A.pt B.pt [--json]

Exit code 1 when --psnr-min / --ssim-min gates are given and violated, so it
doubles as a CI/regression gate.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from univst_tpu.utils.metrics import compare_frame_stacks, latent_mse


def load_dir(path: str) -> np.ndarray:
    from PIL import Image

    names = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not names:
        raise SystemExit(f"no image frames in {path}")
    frames = [np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
              for n in names]
    return np.stack(frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="*", help="two frame directories")
    ap.add_argument("--latents", nargs=2, metavar=("A.pt", "B.pt"),
                    help="compare two trajectory/latent .pt files instead")
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    ap.add_argument("--psnr-min", type=float, default=None)
    ap.add_argument("--ssim-min", type=float, default=None)
    ap.add_argument("--lpips-alexnet", type=str, default=None,
                    help="torchvision AlexNet state_dict .pth (adds LPIPS; "
                         "SURVEY §6 north star is LPIPS <= 0.02)")
    ap.add_argument("--lpips-lin", type=str, default=None,
                    help="lpips 'lin' heads state_dict .pth")
    ap.add_argument("--lpips-max", type=float, default=None,
                    help="fail when mean LPIPS exceeds this")
    args = ap.parse_args()

    result = {}
    if args.latents:
        import torch

        a = torch.load(args.latents[0], map_location="cpu", weights_only=True)
        b = torch.load(args.latents[1], map_location="cpu", weights_only=True)
        result["latent_mse"] = latent_mse(
            np.asarray(a, np.float64), np.asarray(b, np.float64)
        )
    else:
        if len(args.dirs) != 2:
            ap.error("pass two frame directories (or --latents)")
        a, b = load_dir(args.dirs[0]), load_dir(args.dirs[1])
        if a.shape[0] != b.shape[0]:
            raise SystemExit(
                f"frame count mismatch: {a.shape[0]} vs {b.shape[0]}"
            )
        result = compare_frame_stacks(a, b)
        if args.lpips_alexnet and args.lpips_lin:
            from univst_tpu.utils.lpips import lpips_distance, load_lpips_params

            params = load_lpips_params(args.lpips_alexnet, args.lpips_lin)
            d = np.asarray(lpips_distance(
                params, a.astype(np.float32) / 127.5 - 1.0,
                b.astype(np.float32) / 127.5 - 1.0))
            result["lpips_per_frame"] = [round(float(x), 5) for x in d]
            result["lpips_mean"] = float(d.mean())

    if args.json:
        print(json.dumps(result))
    else:
        for k, v in result.items():
            if isinstance(v, list):
                print(f"{k}: " + " ".join(f"{x:.3f}" for x in v))
            else:
                print(f"{k}: {v:.4f}")

    # A gate whose metric was never computed is a configuration error, not a
    # pass — otherwise a forgotten --lpips-alexnet/--lpips-lin pair (or gating
    # PSNR in --latents mode) reports green without measuring anything.
    fail = []
    for gate, flag, key, op in (
        (args.psnr_min, "--psnr-min", "psnr_min", "<"),
        (args.ssim_min, "--ssim-min", "ssim_min", "<"),
        (args.lpips_max, "--lpips-max", "lpips_mean", ">"),
    ):
        if gate is None:
            continue
        if key not in result:
            raise SystemExit(
                f"GATE ERROR: {flag} given but {key} was never computed "
                "(latents mode, or missing --lpips-alexnet/--lpips-lin)"
            )
        v = result[key]
        if (v < gate) if op == "<" else (v > gate):
            fail.append(f"{key} {v:.4f} {op} {gate}")
    if fail:
        print("GATE FAILED: " + "; ".join(fail), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
