"""Ablation timing of the phase-2 solo step (batch F=16): stub out one
component at a time to get the exact per-component time split. The stubs are
monkeypatches on univst_tpu.models.layers bindings — timing only, outputs are
garbage. Usage: python scripts/bench_ablate.py
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

import univst_tpu.models.layers as L
from univst_tpu.core.config import StyleTransferConfig
from univst_tpu.pipelines.sd import SDVideoPipeline, _stylize_chunk_solo
from univst_tpu.pipelines.segments import phase_segments

import flax.linen as nn

ORIG = {
    "video_mha": L.video_mha,
    "mha": L.mha,
    "ffn": L.FeedForwardGEGLU.__call__,
    "gn": L.GroupNorm.__call__,
    "dense": nn.Dense.__call__,
    "conv": nn.Conv.__call__,
}


def restore():
    L.video_mha = ORIG["video_mha"]
    L.mha = ORIG["mha"]
    L.FeedForwardGEGLU.__call__ = ORIG["ffn"]
    L.GroupNorm.__call__ = ORIG["gn"]
    nn.Dense.__call__ = ORIG["dense"]
    nn.Conv.__call__ = ORIG["conv"]


def _fake_conv(self, x):
    """Shape-preserving stand-in for nn.Conv (stride + channel adjust via
    slice/tile, no MACs). Timing-only: isolates the conv share of the step."""
    strides = self.strides if self.strides is not None else (1, 1)
    s = strides[0] if isinstance(strides, (tuple, list)) else strides
    out = x[:, ::s, ::s, :] if x.ndim == 4 else x
    c_out, c_in = self.features, out.shape[-1]
    if c_out <= c_in:
        out = out[..., :c_out]
    else:
        out = jnp.tile(out, (1,) * (out.ndim - 1) + (-(-c_out // c_in),))[..., :c_out]
    return out


def _square_dense_identity(self, x):
    """Identity for d->d Dense layers (qkv/out projections, proj_in/out,
    square time-emb stages); non-square ones (GEGLU, time-emb down-proj)
    keep the real matmul. Timing-only."""
    if self.features == x.shape[-1]:
        return x.astype(self.dtype) if self.dtype is not None else x
    return ORIG["dense"](self, x)


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

    n = steps
    ts_np = pipe.schedule.timesteps(n).copy()
    _, phase2 = phase_segments(n, pipe.style_shift_cfg.window_end())
    lat = init.astype(jnp.float32)
    s0, c = phase2[0]

    def run():
        # fresh jit wrapper per ablation (the patched bindings change the
        # traced graph; _stylize_chunk_solo's own jit cache would collide)
        @jax.jit
        def f(params, lat):
            return _stylize_chunk_solo.__wrapped__(
                pipe, params, content, style[:, :1], lat, ts_np, s0,
                context3, mask, cfg, c, n)

        def go():
            return f(pipe.unet_params, lat)

        np.asarray(jnp.sum(go().astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(go().astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / c * 1e3

    base = run()
    print(f"{'baseline':34s} {base:8.1f} ms/step")

    # UNet-only scan at the same shapes: baseline - this = scheduler step +
    # mask/AdaIN blends + trajectory slicing (the non-UNet step work)
    from univst_tpu.models.layers import StyleCtx, VideoCtx

    vctx = VideoCtx(num_frames=frames,
                    frame_indices=pipe.base_frame_indices,
                    pnp_frame_indices=pipe.pnp_frame_indices)

    @jax.jit
    def unet_scan(params, lat):
        # cfg-less ctx = the pnp_plain/solo form (shift inactive, PnP indices
        # active) — matches _stylize_chunk_solo's denoiser
        sctx = StyleCtx(step_idx=jnp.asarray(40))

        def body(x, t):
            eps, _ = pipe.unet.apply(
                {"params": params}, x.astype(pipe.dtype), t,
                jnp.broadcast_to(context3[2:3], (1, 77, context3.shape[-1])
                                 ).astype(pipe.dtype),
                vctx, sctx)
            return x + eps.astype(x.dtype) * 1e-6, ()

        out, _ = jax.lax.scan(body, lat, jnp.asarray(ts_np[s0:s0 + c]))
        return out

    np.asarray(jnp.sum(unet_scan(pipe.unet_params, lat).astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(unet_scan(pipe.unet_params, lat).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{'UNet-only scan':34s} {best / c * 1e3:8.1f} ms/step  "
          f"(delta {base - best / c * 1e3:+.1f})")

    ablations = {
        "no self-attn (video_mha -> q)": lambda: setattr(
            L, "video_mha", lambda q, k, v, H, F, idx, scale=None: q),
        "no cross-attn+temporal (mha -> q)": lambda: setattr(
            L, "mha", lambda q, k, v, H, scale=None: q),
        "no FFN (GEGLU -> x)": lambda: setattr(
            L.FeedForwardGEGLU, "__call__", lambda self, x: x),
        "no GroupNorm (gn -> x)": lambda: setattr(
            L.GroupNorm, "__call__", lambda self, x: x),
        "no square Dense (d->d projs -> x)": lambda: setattr(
            nn.Dense, "__call__", _square_dense_identity),
        "no spatial convs (conv -> slice/tile)": lambda: setattr(
            nn.Conv, "__call__", _fake_conv),
    }
    for name, patch in ablations.items():
        restore()
        patch()
        try:
            t = run()
            print(f"{name:34s} {t:8.1f} ms/step  (delta {base - t:+.1f})")
        except Exception as e:
            print(f"{name:34s} FAILED {type(e).__name__}: {e}")
    restore()

    # HLO cost analysis of the unablated chunk: is the non-MXU remainder
    # structural HBM traffic? bytes/819GB/s + flops/197T are the two walls.
    try:
        compiled = jax.jit(
            lambda params, lat: _stylize_chunk_solo.__wrapped__(
                pipe, params, content, style[:, :1], lat, ts_np, s0,
                context3, mask, cfg, c, n)
        ).lower(pipe.unet_params, lat).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = ca.get("flops", 0) / c
        by = ca.get("bytes accessed", 0) / c
        print(f"cost_analysis/step: {fl/1e12:.2f} TFLOP, {by/1e9:.2f} GB "
              f"accessed -> walls {fl/197e12*1e3:.1f} ms MXU / "
              f"{by/819e9*1e3:.1f} ms HBM")
    except Exception as e:
        print(f"cost_analysis FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
