"""Stage-level timing of the exact bench.py workload (run on the real TPU).

Times each dispatch of the stylization flow separately with a sync between
stages, to locate non-step overhead (prepass, per-phase scans, VAE decode,
uint8 transfer). Usage: python scripts/bench_stages.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("UNIVST_EXEC_CHUNK", "26")
jax.config.update("jax_compilation_cache_dir", "/tmp/univst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from univst_tpu.core.config import StyleTransferConfig
from univst_tpu.pipelines.sd import (
    SDVideoPipeline,
    _style_prepass,
    _stylize_chunk_singleton,
    _stylize_chunk_solo,
)
from univst_tpu.pipelines.segments import phase_segments


def sync(x):
    np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def main():
    frames, size, steps = 16, 512, 50
    pipe = SDVideoPipeline.build(variant="sd15", num_frames=frames,
                                 height=size, width=size, seed=0)
    h8 = size // 8
    key = jax.random.PRNGKey(0)
    k1_, k2, k3, k4 = jax.random.split(key, 4)
    content = jax.random.normal(k1_, (steps + 1, frames, h8, h8, 4), jnp.float32)
    style = jax.random.normal(k2, (steps + 1, 1, h8, h8, 4), jnp.float32)
    init = jax.random.normal(k3, (frames, h8, h8, 4), jnp.float32)
    mask = (jax.random.uniform(k4, (frames, size, size)) > 0.5).astype(jnp.float32)
    context = pipe.encode_text("")
    context3 = jnp.concatenate([context] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)
    scfg = pipe.style_shift_cfg

    n = steps
    ts_full = jnp.asarray(pipe.schedule.timesteps(n).copy())
    steps_full = jnp.arange(n)
    phase1, phase2 = phase_segments(n, scfg.window_end())
    k1 = phase2[0][0] if phase2 else n
    print(f"phase1={phase1} phase2={phase2}")

    sty_lats = style[:n, :1]
    sty_k1, cnt_k1 = sty_lats[:k1], content[:k1]
    steps_k1, ts_k1 = steps_full[:k1], ts_full[:k1]
    context2 = context3[jnp.asarray([0, 2])]
    context1 = context3[2:3]
    cnt_n = content[:n]

    def stage(name, fn, reps=2):
        fn()  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {best*1e3:9.1f} ms")
        return best

    kv = _style_prepass(pipe, pipe.unet_params, sty_k1[:, 0], ts_k1, context3[1:2])
    sync(kv)
    stage("prepass", lambda: _style_prepass(
        pipe, pipe.unet_params, sty_k1[:, 0], ts_k1, context3[1:2]))

    lat = init.astype(jnp.float32)
    outs = {}

    def p1(seg):
        s0, c = seg
        return _stylize_chunk_singleton(
            pipe, pipe.unet_params, cnt_k1, sty_k1, kv, lat, steps_k1, ts_k1,
            jnp.asarray(s0, jnp.int32), context2, mask, cfg, scfg, c)

    for seg in phase1:
        outs[seg] = stage(f"phase1 seg {seg}", lambda seg=seg: p1(seg))

    def p2(seg):
        s0, c = seg
        return _stylize_chunk_solo(
            pipe, pipe.unet_params, cnt_n, sty_lats, lat, steps_full, ts_full,
            jnp.asarray(s0, jnp.int32), context1, mask, cfg, c)

    for seg in phase2:
        outs[seg] = stage(f"phase2 seg {seg}", lambda seg=seg: p2(seg))

    px = pipe.decode_latents_uint8(lat)
    sync(px)
    stage("decode (sync'd, no transfer)",
          lambda: pipe.decode_latents_uint8(lat + 0.0))

    t0 = time.perf_counter()
    arr = np.asarray(px)
    print(f"{'uint8 pixel transfer (12.6 MB)':46s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    # full pipeline via the public API, for the residual
    def full():
        out = pipe.stylize_latents(content, style, init, context3, mask=mask, cfg=cfg)
        return np.asarray(pipe.decode_latents_uint8(out))

    full()
    t0 = time.perf_counter()
    full()
    print(f"{'full stylize+decode+transfer':46s} {(time.perf_counter()-t0)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
