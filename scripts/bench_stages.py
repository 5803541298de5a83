"""Stage-level timing of the exact bench.py workload (run on the real TPU).

Times each dispatch of the stylization flow separately with a sync between
stages, to locate non-step overhead (prepass, per-phase scans, VAE decode,
uint8 transfer). Usage: python scripts/bench_stages.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("UNIVST_EXEC_CHUNK", "26")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
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
    ts_np = pipe.schedule.timesteps(n).copy()
    phase1, phase2 = phase_segments(n, scfg.window_end())
    k1 = phase2[0][0] if phase2 else n
    print(f"phase1={phase1} phase2={phase2}")

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

    kv = _style_prepass(pipe, pipe.unet_params, style, ts_np[:k1], context3, k1)
    sync(kv)
    stage("prepass", lambda: _style_prepass(
        pipe, pipe.unet_params, style, ts_np[:k1], context3, k1))

    lat = init.astype(jnp.float32)
    outs = {}

    def p1(seg):
        s0, c = seg
        return _stylize_chunk_singleton(
            pipe, pipe.unet_params, content, style, kv, lat, ts_np[:k1],
            s0, context3, mask, cfg, scfg, c, k1)

    for seg in phase1:
        outs[seg] = stage(f"phase1 seg {seg}", lambda seg=seg: p1(seg))

    def p2(seg):
        s0, c = seg
        return _stylize_chunk_solo(
            pipe, pipe.unet_params, content, style[:, :1], lat, ts_np,
            s0, context3, mask, cfg, c, n)

    for seg in phase2:
        outs[seg] = stage(f"phase2 seg {seg}", lambda seg=seg: p2(seg))

    px = pipe.decode_latents_uint8(lat)
    sync(px)
    stage("decode (sync'd, no transfer)",
          lambda: pipe.decode_latents_uint8(lat + 0.0))

    t0 = time.perf_counter()
    arr = np.asarray(px)
    print(f"{'uint8 pixel transfer (12.6 MB)':46s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    from univst_tpu.utils.io import fetch_array

    def dec_overlap():
        chunks = pipe.decode_latents_uint8_chunks(lat + 0.0, chunk=8)
        return np.concatenate([fetch_array(c) for c in chunks])

    dec_overlap()
    t0 = time.perf_counter()
    dec_overlap()
    print(f"{'chunked decode + threaded fetch':46s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    # full pipeline via the public API, for the residual
    def full():
        out = pipe.stylize_latents(content, style, init, context3, mask=mask, cfg=cfg)
        chunks = pipe.decode_latents_uint8_chunks(out, chunk=8)
        return np.concatenate([fetch_array(c) for c in chunks])

    full()
    t0 = time.perf_counter()
    full()
    print(f"{'full stylize+decode+transfer':46s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    # dispatch-blocking anatomy: time each python call return (no syncs)
    for rep in range(2):
        marks = [("start", time.perf_counter())]
        kv2 = _style_prepass(pipe, pipe.unet_params, style, ts_np[:k1],
                             context3, k1)
        marks.append(("prepass dispatched", time.perf_counter()))
        l1 = _stylize_chunk_singleton(
            pipe, pipe.unet_params, content, style, kv2, lat, ts_np[:k1],
            0, context3, mask, cfg, scfg, 26, k1)
        marks.append(("phase1 dispatched", time.perf_counter()))
        l2 = _stylize_chunk_solo(
            pipe, pipe.unet_params, content, style[:, :1], l1, ts_np,
            26, context3, mask, cfg, 24, n)
        marks.append(("phase2 dispatched", time.perf_counter()))
        chunks = pipe.decode_latents_uint8_chunks(l2, chunk=8)
        marks.append(("decodes dispatched", time.perf_counter()))
        np.concatenate([fetch_array(c) for c in chunks])
        marks.append(("fetched", time.perf_counter()))
        prev = marks[0][1]
        for name, t in marks[1:]:
            print(f"  rep{rep} {name:24s} +{(t - prev)*1e3:9.1f} ms")
            prev = t


if __name__ == "__main__" and not os.environ.get("UNIVST_STAGES_MAIN2"):
    main()


def marked_public(pipe, content, style, init, context3, mask, cfg):
    """pipe.stylize_latents body, instrumented per python statement."""
    import time as _t

    import jax.numpy as jnp

    from univst_tpu.pipelines.sd import (
        _style_prepass as pp,
        _stylize_chunk_singleton as ch1,
        _stylize_chunk_solo as ch2,
    )
    from univst_tpu.pipelines.segments import phase_segments as ps
    from univst_tpu.utils.io import fetch_array

    marks = [("t0", _t.perf_counter())]
    scfg = pipe.style_shift_cfg
    n = cfg.num_steps
    ts_np = pipe.schedule.timesteps(n).copy()
    window_end = scfg.window_end()
    phase1, phase2 = ps(n, window_end)
    k1 = phase2[0][0] if phase2 else n
    marks.append(("setup", _t.perf_counter()))
    latents = init
    kv = pp(pipe, pipe.unet_params, style, ts_np[:k1], context3, k1)
    marks.append(("prepass call", _t.perf_counter()))
    for s0, c in phase1:
        latents = ch1(pipe, pipe.unet_params, content, style, kv, latents,
                      ts_np[:k1], s0, context3, mask, cfg, scfg, c, k1)
    marks.append(("phase1 calls", _t.perf_counter()))
    sty1 = style[:, :1]
    marks.append(("style[:, :1] eager", _t.perf_counter()))
    for s0, c in phase2:
        latents = ch2(pipe, pipe.unet_params, content, sty1, latents, ts_np,
                      s0, context3, mask, cfg, c, n)
    marks.append(("phase2 calls", _t.perf_counter()))
    chunks = pipe.decode_latents_uint8_chunks(latents, chunk=8)
    marks.append(("decode calls", _t.perf_counter()))
    import numpy as _np
    out = _np.concatenate([fetch_array(c) for c in chunks])
    marks.append(("fetch", _t.perf_counter()))
    prev = marks[0][1]
    for name, t in marks[1:]:
        print(f"  pub {name:22s} +{(t-prev)*1e3:9.1f} ms")
        prev = t
    return out


def main2():
    import jax
    import jax.numpy as jnp
    frames, size, steps = 16, 512, 50
    pipe = SDVideoPipeline.build(variant="sd15", num_frames=frames,
                                 height=size, width=size, seed=0)
    h8 = size // 8
    key = jax.random.PRNGKey(0)
    ka, kb, kc, kd = jax.random.split(key, 4)
    content = jax.random.normal(ka, (steps + 1, frames, h8, h8, 4), jnp.float32)
    style = jax.random.normal(kb, (steps + 1, 1, h8, h8, 4), jnp.float32)
    init = jax.random.normal(kc, (frames, h8, h8, 4), jnp.float32)
    mask = (jax.random.uniform(kd, (frames, size, size)) > 0.5).astype(jnp.float32)
    context3 = jnp.concatenate([pipe.encode_text("")] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)
    for rep in range(3):
        t0 = time.perf_counter()
        marked_public(pipe, content, style, init, context3, mask, cfg)
        print(f"  pub total rep{rep}: {(time.perf_counter()-t0):.2f} s")
    # and the REAL public API for comparison
    from univst_tpu.utils.io import fetch_array
    for rep in range(2):
        t0 = time.perf_counter()
        out = pipe.stylize_latents(content, style, init, context3, mask=mask, cfg=cfg)
        chunks = pipe.decode_latents_uint8_chunks(out, chunk=8)
        np.concatenate([fetch_array(c) for c in chunks])
        print(f"  REAL public rep{rep}: {(time.perf_counter()-t0):.2f} s")


if __name__ == "__main__" and os.environ.get("UNIVST_STAGES_MAIN2"):
    main2()
