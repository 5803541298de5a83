"""Step-time anatomy microbenchmark (run on the real TPU).

Times the individual pieces of the SD-1.5 @512 stylization step so
BENCH_NOTES.md's breakdown stays measured, not estimated:
  * phase-1 singleton chunk (2-branch batch 2F) per-step
  * phase-2 solo chunk (stylized-only batch F) per-step
  * style K/V pre-pass
  * one-call UNet forwards at batch 2F and F
  * per-resolution sparse-causal attention (the Pallas video kernel)
  * VAE decode (+uint8 quantize)

Usage: python scripts/bench_anatomy.py [--reps 3]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from univst_tpu.core.config import SD_PNP_FRAME_INDICES, StyleTransferConfig
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.pipelines.sd import (
    SDVideoPipeline,
    _style_prepass,
    _stylize_chunk_singleton,
    _stylize_chunk_solo,
)
from univst_tpu.pipelines.segments import phase_segments


def timed(name, fn, reps=3):
    fn()  # compile
    best = min(_run_once(fn) for _ in range(reps))
    print(f"{name:52s} {best*1e3:9.1f} ms")
    return best


def _run_once(fn):
    t0 = time.perf_counter()
    out = fn()
    # reduce before transferring: np.asarray of the raw outputs would ship
    # hundreds of MB through the TPU tunnel (~24 MB/s) and swamp the timing
    leaves = jax.tree.leaves(out)
    np.asarray(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    frames, size, steps = args.frames, args.size, 50
    pipe = SDVideoPipeline.build(variant="sd15", num_frames=frames,
                                 height=size, width=size, seed=0)
    h8 = size // 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    content_rev = jax.random.normal(k1, (steps + 1, frames, h8, h8, 4), jnp.float32)
    style_rev = jax.random.normal(k2, (steps + 1, 1, h8, h8, 4), jnp.float32)
    init = jax.random.normal(k3, (frames, h8, h8, 4), jnp.float32)
    mask = (jax.random.uniform(k4, (frames, size, size)) > 0.5).astype(jnp.float32)
    context = pipe.encode_text("")
    context3 = jnp.concatenate([context] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)
    scfg = pipe.style_shift_cfg

    phase1, phase2 = phase_segments(steps, scfg.window_end())
    kk1 = phase2[0][0] if phase2 else steps
    c1 = phase1[0][1]
    ts_np = pipe.schedule.timesteps(steps).copy()
    ctx2 = context3[jnp.asarray([0, 2])]
    print(f"device={jax.devices()[0]} frames={frames} size={size} "
          f"phase1={phase1} phase2={phase2}")

    kv = _style_prepass(pipe, pipe.unet_params, style_rev, ts_np[:kk1],
                        context3, kk1)
    timed("style pre-pass (batch k1 single-frame fwd)", lambda: _style_prepass(
        pipe, pipe.unet_params, style_rev, ts_np[:kk1], context3, kk1
    ), args.reps)

    t = timed(f"phase1 chunk ({c1} steps, batch {2*frames})", lambda: _stylize_chunk_singleton(
        pipe, pipe.unet_params, content_rev, style_rev, kv, init,
        ts_np[:kk1], 0, context3, mask, cfg, scfg, c1, kk1,
    ), args.reps)
    print(f"{'  -> per step':52s} {t/c1*1e3:9.1f} ms")

    if phase2:
        c2 = phase2[0][1]
        t = timed(f"phase2 solo chunk ({c2} steps, batch {frames})", lambda: _stylize_chunk_solo(
            pipe, pipe.unet_params, content_rev, style_rev[:, :1], init,
            ts_np, phase2[0][0], context3, mask, cfg, c2, steps,
        ), args.reps)
        print(f"{'  -> per step':52s} {t/c2*1e3:9.1f} ms")

    # single UNet forwards (outside the scan); params as jit ARGS — a closure
    # would bake 3.4GB of weight constants into the lowering
    kv0 = jax.tree.map(lambda a: a[:1], kv)
    x2 = jnp.concatenate([init, init], axis=0).astype(jnp.bfloat16)

    @jax.jit
    def fwd2(p, x, t, kv):
        d = pipe._denoise_fn(p, ctx2, pipe.pnp_frame_indices, scfg)
        return d(x, t, jnp.asarray(1), style_kv=kv)[0]

    timed(f"UNet fwd batch {2*frames} (2-branch, injected KV)",
          lambda: fwd2(pipe.unet_params, x2, jnp.asarray(301), kv0), args.reps)

    @jax.jit
    def fwd1(p, x, t):
        d = pipe._denoise_fn(p, context3[2:3], pipe.pnp_frame_indices, None,
                             pnp_plain=True)
        return d(x, t, jnp.asarray(40))[0]

    timed(f"UNet fwd batch {frames} (solo)",
          lambda: fwd1(pipe.unet_params, init.astype(jnp.bfloat16),
                       jnp.asarray(301)), args.reps)

    # per-resolution sparse-causal attention (video kernel), batch 2F and F
    from univst_tpu.attention.ops import video_mha
    from univst_tpu.core.config import SD_BASE_FRAME_INDICES

    for b in (2 * frames, frames):
        for idx_name, idx in (("pnp 2-src", SD_PNP_FRAME_INDICES),
                              ("base 3-src", SD_BASE_FRAME_INDICES)):
            for hw, d, heads in [(h8, 320, 8), (h8 // 2, 640, 8),
                                 (h8 // 4, 1280, 8)]:
                L = hw * hw
                q = jax.random.normal(key, (b, L, d), jnp.bfloat16)
                fatt = jax.jit(lambda q, i=idx: video_mha(q, q, q, heads,
                                                          frames, i))
                timed(f"video attn b={b} L={L} d={d} ({idx_name})",
                      lambda: fatt(q), args.reps)

    # VAE decode
    timed("VAE decode -> uint8 (16 frames @512)",
          lambda: pipe.decode_latents_uint8(init), args.reps)


if __name__ == "__main__":
    main()
