"""Cold-start wall-clock: 4-process workflow vs the one-process runner.

The reference runs its workflow as four separate python processes
(scripts/start_*.sh); through the remote-TPU relay every process pays
~1 min of backend init plus ~50 s of executable upload per major graph even
on a warm persistent compile cache (BENCH_NOTES round-3 graph census).
`univst_tpu.cli.run_workflow` chains the four stages in one process. This
script times both forms on identical inputs/flags and prints the comparison
— the measured number behind BENCH_NOTES' cold-start entry.

Usage:
  python scripts/bench_coldstart.py [--variant tiny --size 64 --frames 4
                                     --steps 10 --platform cpu] [--json]
TPU (real scale): python scripts/bench_coldstart.py --variant sd15
                  --size 512 --frames 16 --steps 50
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_inputs(root: str, size: int, frames: int) -> None:
    import numpy as np
    from PIL import Image

    os.makedirs(f"{root}/contents/vid", exist_ok=True)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    for i in range(frames):
        img = np.roll(base, 2 * i, axis=1)
        Image.fromarray(img).save(f"{root}/contents/vid/%05d.png" % i)
    Image.fromarray(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    ).save(f"{root}/style.png")
    m = np.zeros((size, size), np.uint8)
    m[size // 4 : size // 2, size // 4 : size // 2] = 1
    Image.fromarray(m, mode="L").save(f"{root}/mask.png")


def run(argv, env=None):
    t0 = time.time()
    subprocess.run(argv, check=True, cwd=REPO, env=env)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="tiny")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--root", default="/tmp/univst_coldstart")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--skip-multi", action="store_true",
                    help="time only the one-process form")
    args = ap.parse_args()

    shutil.rmtree(args.root, ignore_errors=True)
    make_inputs(args.root, args.size, args.frames)
    env = dict(os.environ)

    common = [
        "--variant", args.variant, "--num_frames", str(args.frames),
        "--height", str(args.size), "--width", str(args.size),
        "--time_steps", str(args.steps),
    ]
    if args.platform:
        common += ["--platform", args.platform]
    py = [sys.executable, "-m"]
    result = {}

    if not args.skip_multi:
        r = f"{args.root}/results_4proc"
        t = 0.0
        t += run(py + ["univst_tpu.cli.run_content_inversion_sd", *common,
                       "--content_path", f"{args.root}/contents/vid",
                       "--output_path", f"{r}/contents-inv",
                       "--is_opt"], env)
        t += run(py + ["univst_tpu.cli.run_style_inversion_sd", *common,
                       "--style_path", f"{args.root}/style.png",
                       "--output_path", f"{r}/styles-inv"], env)
        mp = ["univst_tpu.cli.mask_propagation",
              "--num_frames", str(args.frames),
              "--feature_path", f"{r}/contents-inv/sd/vid/features/"
              "inversion_feature_map_2_block_301_step.pt",
              "--backbone", "sd", "--mask_path", f"{args.root}/mask.png",
              "--output_path", f"{r}/masks"]
        if args.platform:
            mp += ["--platform", args.platform]
        t += run(py + mp, env)
        t += run(py + ["univst_tpu.cli.run_video_style_transfer_sd", *common,
                       "--content_inv_path", f"{r}/contents-inv/sd/vid/inversion",
                       "--style_inv_path", f"{r}/styles-inv/sd/style/inversion",
                       "--mask_path", f"{r}/masks/sd/mask",
                       "--output_path", f"{r}/stylizations"], env)
        result["four_process_s"] = round(t, 1)

    t1 = run(py + ["univst_tpu.cli.run_workflow", "--backbone", "sd", *common,
                   "--content_path", f"{args.root}/contents/vid",
                   "--style_path", f"{args.root}/style.png",
                   "--mask_path", f"{args.root}/mask.png",
                   "--ft_timesteps", "301",
                   "--output_root", f"{args.root}/results_1proc"], env)
    result["one_process_s"] = round(t1, 1)
    if "four_process_s" in result:
        result["saving_s"] = round(result["four_process_s"] - t1, 1)
        result["speedup"] = round(result["four_process_s"] / t1, 2)
    print(json.dumps(result) if args.json else result)


if __name__ == "__main__":
    main()
