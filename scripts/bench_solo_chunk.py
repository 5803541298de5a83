"""Time just the phase-2 solo chunk (12 steps, batch F) — for XLA flag A/Bs.

Usage: XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=49152" \
       python scripts/bench_solo_chunk.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("UNIVST_EXEC_CHUNK", "13")
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


def main():
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
    context = pipe.encode_text("")
    context3 = jnp.concatenate([context] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)
    scfg = pipe.style_shift_cfg

    n = steps
    ts_np = pipe.schedule.timesteps(n).copy()
    phase1, phase2 = phase_segments(n, scfg.window_end())
    k1 = phase2[0][0] if phase2 else n
    lat = init.astype(jnp.float32)

    copts = None
    if os.environ.get("UNIVST_SCOPED_VMEM_KIB"):
        copts = {"xla_tpu_scoped_vmem_limit_kib":
                 os.environ["UNIVST_SCOPED_VMEM_KIB"]}
        print(f"compiler_options={copts}")

    def wrap(f):
        return jax.jit(f, compiler_options=copts) if copts else f

    @wrap
    def _solo(params, lat):
        s0, c = phase2[0]
        return _stylize_chunk_solo(
            pipe, params, content, style[:, :1], lat, ts_np, s0, context3,
            mask, cfg, c, n)

    def solo():
        return _solo(pipe.unet_params, lat)

    def sync(x):
        np.asarray(jnp.sum(x.astype(jnp.float32)))

    sync(solo())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(solo())
        best = min(best, time.perf_counter() - t0)
    c = phase2[0][1]
    print(f"solo chunk ({c} steps): {best*1e3:.1f} ms -> {best/c*1e3:.1f} ms/step")

    # phase-1 singleton too (2-branch)
    kv = _style_prepass(pipe, pipe.unet_params, style, ts_np[:k1], context3, k1)

    def p1():
        s0, c1 = phase1[0]
        return _stylize_chunk_singleton(
            pipe, pipe.unet_params, content, style, kv, lat,
            ts_np[:k1], s0, context3, mask, cfg, scfg, c1, k1)

    sync(p1())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(p1())
        best = min(best, time.perf_counter() - t0)
    c1 = phase1[0][1]
    print(f"singleton chunk ({c1} steps): {best*1e3:.1f} ms -> {best/c1*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
