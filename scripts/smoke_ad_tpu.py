"""AnimateDiff stylization smoke at reference scale on the real TPU.

Runs a few steps of the 3-branch AnimateDiff video style transfer at 512px /
16 frames (reference default) with random weights and synthetic
trajectories. AD keeps the legacy 3-branch batch (motion-module positional
encodings break the style-singleton identity) and its temporal layers are
REAL compute (motion modules), so this exercises the heaviest epsilon
backbone. Usage: python scripts/smoke_ad_tpu.py [--steps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("UNIVST_EXEC_CHUNK", "4")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from univst_tpu.core.config import StyleTransferConfig
from univst_tpu.pipelines.animatediff import build_animatediff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON result line "
                         "(consumed by bench.py --families)")
    ap.add_argument("--prepass", type=int, default=0,
                    help="batch the style capture forwards for N steps into "
                         "one call (_stylize_chunk_prepass); 0 = per-step")
    args = ap.parse_args()

    t0 = time.time()
    pipe = build_animatediff(
        variant="ad", num_frames=args.frames, height=args.size,
        width=args.size, seed=0,
    )
    if args.prepass:
        import dataclasses
        pipe = dataclasses.replace(pipe, style_prepass_chunk=args.prepass)
    print(f"build: {time.time()-t0:.1f}s")
    h8 = args.size // 8
    key = jax.random.PRNGKey(0)
    ka, kb, kc, kd = jax.random.split(key, 4)
    n = args.steps
    content = jax.random.normal(ka, (n + 1, args.frames, h8, h8, 4), jnp.float32)
    style = jax.random.normal(kb, (n + 1, args.frames, h8, h8, 4), jnp.float32)
    init = jax.random.normal(kc, (args.frames, h8, h8, 4), jnp.float32)
    mask = (jax.random.uniform(kd, (args.frames, args.size, args.size)) > 0.5
            ).astype(jnp.float32)
    context3 = jnp.concatenate([pipe.encode_text("")] * 3, axis=0)

    cfg = StyleTransferConfig(num_steps=n)
    t0 = time.time()
    out = pipe.stylize_latents(content, style, init, context3, mask=mask, cfg=cfg)
    arr = np.asarray(out)
    assert np.isfinite(arr).all(), "non-finite stylized latents"
    print(f"stylize {n} steps @ {args.size}px x {args.frames}f (3-branch): "
          f"{time.time()-t0:.1f}s (incl. compile) -> {arr.shape}, finite ok")

    t0 = time.time()
    np.asarray(pipe.stylize_latents(content, style, init, context3, mask=mask,
                                    cfg=cfg))
    dt = time.time() - t0
    print(f"warm: {dt:.2f}s, {dt/n*1e3:.0f} ms/step -> est. 50-step run "
          f"{dt/n*50:.1f}s = {args.frames/(dt/n*50):.3f} frames/s")
    if args.json:
        import json
        print(json.dumps({
            "family": "ad", "size": args.size, "frames": args.frames,
            "measured_steps": n, "ms_per_step": round(dt / n * 1e3, 1),
            "frames_per_sec_50step": round(args.frames / (dt / n * 50), 4),
        }))


if __name__ == "__main__":
    main()
