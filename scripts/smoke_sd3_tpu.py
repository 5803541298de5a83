"""SD3 stylization smoke at reference scale on the real TPU.

Runs a few steps of the 3-branch SD3 video style transfer at 1024px /
16 frames (the reference SD3 default, run_content_inversion_sd3.py:109-110)
with random weights and synthetic trajectories — proves the joint-attention
flash path + memory behavior at real shapes (the naive path would need
hundreds of GB of logits). Usage:
  python scripts/smoke_sd3_tpu.py [--size 1024] [--steps 4] [--variant sd3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("UNIVST_EXEC_CHUNK", "2")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from univst_tpu.core.config import StyleTransferConfig
from univst_tpu.pipelines.sd3 import SD3VideoPipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--variant", default="sd3")
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON result line "
                         "(consumed by bench.py --families)")
    args = ap.parse_args()

    t0 = time.time()
    pipe = SD3VideoPipeline.build(
        variant=args.variant, num_frames=args.frames, height=args.size,
        width=args.size, seed=0,
    )
    print(f"build: {time.time()-t0:.1f}s")
    h8 = args.size // 8
    lat_c = pipe.vae.cfg.latent_channels
    key = jax.random.PRNGKey(0)
    ka, kb, kc, kd = jax.random.split(key, 4)
    n = args.steps
    content = jax.random.normal(ka, (n + 1, args.frames, h8, h8, lat_c), jnp.float32)
    style = jax.random.normal(kb, (n + 1, 1, h8, h8, lat_c), jnp.float32)
    init = jax.random.normal(kc, (args.frames, h8, h8, lat_c), jnp.float32)
    mask = (jax.random.uniform(kd, (args.frames, args.size, args.size)) > 0.5
            ).astype(jnp.float32)
    img_latents = content[0]
    context, pooled = pipe.encode_prompt("")
    pipe.free_text_encoders()  # ~11 GB back before the denoise loop
    context3 = jnp.concatenate([context] * 3, axis=0)
    pooled3 = jnp.concatenate([pooled] * 3, axis=0)
    print(f"context {context3.shape} img_tokens {(h8 // 2) ** 2} "
          f"joint_len {(h8 // 2) ** 2 + context.shape[1]}")

    cfg = StyleTransferConfig(num_steps=n)
    t0 = time.time()
    out = pipe.stylize_latents(
        content, style, init, img_latents, context3, pooled3, mask=mask, cfg=cfg
    )
    arr = np.asarray(out)
    dt = time.time() - t0
    assert np.isfinite(arr).all(), "non-finite stylized latents"
    print(f"stylize {n} steps @ {args.size}px x {args.frames}f: {dt:.1f}s "
          f"(incl. compile) -> {arr.shape}, finite ok")

    # steady-state step time. NOTE: a flat dt/n * 50 extrapolation is wrong
    # whenever the phase mix at n steps differs from the mix at 50 (the
    # in-window capture+inject steps cost ~2x the solo steps) — compose the
    # 50-step estimate from the measured per-phase rates instead.
    from univst_tpu.core.config import SD3_STYLE_SHIFT
    from univst_tpu.pipelines.segments import phase_segments

    t0 = time.time()
    out = pipe.stylize_latents(
        content, style, init, img_latents, context3, pooled3, mask=mask, cfg=cfg
    )
    np.asarray(out)
    dt = time.time() - t0
    p1, p2 = phase_segments(n, SD3_STYLE_SHIFT.window_end(), pipe.exec_chunk_default)
    n1 = sum(c for _, c in p1)
    n2 = n - n1
    print(f"warm: {dt:.2f}s total, {dt/n*1e3:.0f} ms/step avg over "
          f"{n1} capture+inject + {n2} solo steps")
    est = None
    if n == 50:
        est = dt
        print(f"-> 50-step run {dt:.1f}s = {args.frames/dt:.3f} frames/s")
    elif n2 == 0:
        # all measured steps were phase-1; estimate 50-step with the solo
        # steps at the measured ~x0.48 ratio (bench_sd3_anatomy: 3566/7386)
        f1 = dt / n
        p1_50, p2_50 = phase_segments(50, SD3_STYLE_SHIFT.window_end(), 50)
        k1 = sum(c for _, c in p1_50)
        est = k1 * f1 + (50 - k1) * f1 * 0.48
        print(f"-> est. 50-step run {est:.1f}s = {args.frames/est:.3f} "
              f"frames/s ({k1} phase-1 steps @ {f1*1e3:.0f} ms, "
              f"{50-k1} solo @ ~48%)")
    else:
        print(f"-> run --steps 50 for the true 50-step number")
    if args.json:
        import json
        print(json.dumps({
            "family": "sd3", "variant": args.variant, "size": args.size,
            "frames": args.frames, "measured_steps": n,
            "ms_per_step": round(dt / n * 1e3, 1),
            "frames_per_sec_50step":
                None if est is None else round(args.frames / est, 4),
        }))


if __name__ == "__main__":
    main()
