"""Reconstruction-fidelity gate at real scale (VERDICT r3 #5a).

Inverts the synthetic corpus with the real-size SD-1.5 model and reconstructs
it, then asserts the reconstruction matches the input — the reference's own
implicit oracle (inversion_tools/ddim_inversion.py:38-42: invert, then sample
back with the same schedule; a faithful implementation returns the input) run
at production scale on the TPU. This is a standing regression gate for every
kernel/precision change: a wrong flash-attention block, a bf16 cast in the
wrong place, or a scheduler sign error shows up as a reconstruction-error
jump long before any visual inspection would catch it.

Weights are random (no checkpoints offline), so the VAE is not an identity —
fidelity is measured where it is well-defined regardless of weights:
  * latent space: PSNR + relative MSE between the encoded input z0 and the
    reconstructed z0 (the actual inversion-roundtrip error), and
  * pixel space: PSNR between decode(z0) and decode(recon) — both through
    the SAME decoder, so decoder randomness cancels.

Usage:
  python scripts/recon_gate.py [--variant sd15 --size 512 --frames 8
                                --steps 50] [--psnr-min 30] [--json]
Recorded thresholds live in BENCH_NOTES.md (round 3).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="sd15")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu for local runs)")
    ap.add_argument("--psnr-min", type=float, default=None,
                    help="fail (exit 1) if latent PSNR falls below this")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from univst_tpu.pipelines.sd import SDVideoPipeline
    from univst_tpu.utils.metrics import psnr

    t0 = time.time()
    pipe = SDVideoPipeline.build(
        variant=args.variant, num_frames=args.frames, height=args.size,
        width=args.size, seed=0,
    )
    build_s = time.time() - t0

    # synthetic corpus: smooth translating sinusoid pattern + texture, the
    # same character as scripts/make_examples.py (natural-image-like spectra,
    # deterministic)
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0 : args.size, 0 : args.size].astype(np.float32)
    tex = rng.normal(0, 0.15, (args.size, args.size, 3)).astype(np.float32)
    frames = []
    for i in range(args.frames):
        ph = 2 * np.pi * i / max(args.frames, 1)
        base = np.stack(
            [
                0.5 + 0.4 * np.sin(xx / 37.0 + ph) * np.cos(yy / 53.0),
                0.5 + 0.4 * np.cos(xx / 61.0 - ph) * np.sin(yy / 29.0),
                0.5 + 0.4 * np.sin((xx + yy) / 83.0 + ph),
            ],
            axis=-1,
        )
        frames.append(np.clip(base + np.roll(tex, 3 * i, axis=1), 0, 1))
    frames = np.stack(frames) * 2.0 - 1.0  # [-1, 1] model range

    context = pipe.encode_text("")
    z0 = pipe.encode_frames(jnp.asarray(frames), jax.random.PRNGKey(0))
    t0 = time.time()
    traj, _ = pipe.invert(z0, context, num_steps=args.steps)
    rec = pipe.reconstruct_latents(traj[-1], context, num_steps=args.steps)
    z0h = np.asarray(z0, np.float64)
    rech = np.asarray(rec, np.float64)
    run_s = time.time() - t0

    rng_range = float(z0h.max() - z0h.min())
    lat_psnr = psnr(z0h, rech, data_range=rng_range)
    rel_mse = float(np.mean((z0h - rech) ** 2) / np.var(z0h))

    # pixel-space check through the shared decoder
    pa = np.asarray(pipe.decode_latents(z0), np.float64)
    pb = np.asarray(pipe.decode_latents(rec), np.float64)
    pix_psnr = psnr(pa, pb, data_range=1.0)

    result = {
        "metric": "recon_latent_psnr_db",
        "value": round(lat_psnr, 2),
        "latent_rel_mse": rel_mse,
        "pixel_psnr_db": round(pix_psnr, 2),
        "variant": args.variant,
        "size": args.size,
        "frames": args.frames,
        "steps": args.steps,
        "build_s": round(build_s, 1),
        "run_s": round(run_s, 1),
    }
    print(json.dumps(result) if args.json else result)

    if args.psnr_min is not None and lat_psnr < args.psnr_min:
        print(f"GATE FAILED: latent PSNR {lat_psnr:.2f} < {args.psnr_min}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
