"""SD3 step-time anatomy on the real TPU (VERDICT r3 #1).

The 1024px/16f SD3 stylize step measured 7.48 s; its FLOP budget (~410
TFLOP for the legacy 3-branch forward, ~270 for the pipeline's 2-branch
capture+inject form) puts speed-of-light on v5e (197 TFLOPS bf16 peak) at
1.4-2.1 s — so the step runs well under 30% MFU and the question is where.
This script times the pieces separately so the optimization pass attacks
measured costs, not guesses:
  * probe=segments: the actual pipeline segments (_stylize2_segment in the
    window, _stylize1_segment past it) per-step, plus one-call MMDiT
    forwards at batch 2F / F / 1.
  * probe=attn: the joint flash attention alone at the real shape
    (S=T=4429 -> padded 4608, dh=64) for several block-size choices.
  * probe=matmul: the projection/MLP GEMMs at real token counts -> the
    achievable matmul ceiling for the non-attention share.

Usage: python scripts/bench_sd3_anatomy.py --probe segments|attn|matmul
Run probes in separate processes: segments holds ~4.2 GB of params.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("UNIVST_EXEC_CHUNK", "2")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(name, fn, reps=3, divisor=1):
    fn()  # compile
    best = min(_run_once(fn) for _ in range(reps))
    print(f"{name:58s} {best*1e3:9.1f} ms"
          + (f"  ({best/divisor*1e3:7.1f} ms/step)" if divisor != 1 else ""))
    return best


def _run_once(fn):
    t0 = time.perf_counter()
    out = fn()
    leaves = jax.tree.leaves(out)
    np.asarray(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))
    return time.perf_counter() - t0


def probe_segments(args):
    from univst_tpu.core.config import (
        SD3_FRAME_INDICES, SD3_STYLE_SHIFT, StyleTransferConfig,
    )
    from univst_tpu.pipelines.sd3 import (
        SD3VideoPipeline,
        _stylize1_segment,
        _stylize2_segment,
    )
    from univst_tpu.pipelines.segments import phase_segments

    frames, size, steps = args.frames, args.size, 50
    pipe = SD3VideoPipeline.build(variant="sd3", num_frames=frames,
                                  height=size, width=size, seed=0)
    h8 = size // 8
    lc = pipe.vae.cfg.latent_channels
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    content = jax.random.normal(k1, (steps + 1, frames, h8, h8, lc), jnp.float32)
    style = jax.random.normal(k2, (steps + 1, 1, h8, h8, lc), jnp.float32)
    init = jax.random.normal(k3, (frames, h8, h8, lc), jnp.float32)
    mask = (jax.random.uniform(k4, (frames, size, size)) > 0.5).astype(jnp.float32)
    context, pooled = pipe.encode_prompt("")
    pipe.free_text_encoders()
    context3 = jnp.concatenate([context] * 3, axis=0)
    pooled3 = jnp.concatenate([pooled] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)
    scfg = SD3_STYLE_SHIFT
    mu = pipe._mu(h8, h8)
    sigmas = jnp.asarray(pipe.schedule.sigmas(steps, mu=mu))
    from univst_tpu.core.scheduler import generate_eta_values, scale_eta_window

    ts = pipe.schedule.timesteps(steps, mu=mu)
    e0, e1 = scale_eta_window(cfg.eta_start_step, cfg.eta_end_step, steps)
    etas = jnp.asarray(generate_eta_values(ts, e0, e1, cfg.eta_base, cfg.eta_trend))
    stepsj = jnp.arange(steps)
    img32 = content[0]
    phase1, phase2 = phase_segments(steps, scfg.window_end(), pipe.exec_chunk_default)
    print(f"device={jax.devices()[0]} phase1={phase1[:3]}... "
          f"({sum(c for _, c in phase1)} steps) phase2={phase2[:3]}... "
          f"({sum(c for _, c in phase2)} steps)")

    s0, c1 = phase1[0]
    timed(f"phase1 capture+inject segment ({c1} steps, batch 1+{2*frames})",
          lambda: _stylize2_segment(
              pipe, pipe.mmdit_params, content, style[:, :1], init, stepsj,
              sigmas, etas, jnp.asarray(s0, jnp.int32), img32, context3,
              pooled3, mask, cfg, scfg, c1), args.reps, divisor=c1)

    if phase2:
        s0b, c2 = phase2[0]
        timed(f"phase2 solo segment ({c2} steps, batch {frames})",
              lambda: _stylize1_segment(
                  pipe, pipe.mmdit_params, content, style[:, :1], init, stepsj,
                  sigmas, etas, jnp.asarray(s0b, jnp.int32), img32, context3,
                  pooled3, mask, cfg, c2), args.reps, divisor=c2)

    # one-call MMDiT forwards (params as jit args)
    from univst_tpu.models.layers import StyleCtx, VideoCtx

    x2 = jnp.concatenate([init, init], axis=0).astype(jnp.bfloat16)
    ctx2 = context3[jnp.asarray([0, 2])].astype(jnp.bfloat16)
    pl2 = pooled3[jnp.asarray([0, 2])].astype(jnp.bfloat16)
    vctx = VideoCtx(num_frames=frames, frame_indices=SD3_FRAME_INDICES)
    vctx1 = VideoCtx(num_frames=1, frame_indices=())

    def fwd(p, x, c, pl, f_static):
        v, _ = pipe.mmdit.apply(
            {"params": p}, x, jnp.asarray(500.0), c, pl,
            VideoCtx(num_frames=f_static, frame_indices=SD3_FRAME_INDICES
                     if f_static > 1 else ()),
            StyleCtx(step_idx=jnp.asarray(45), cfg=None),
        )
        return v

    fwdj = jax.jit(fwd, static_argnums=(4,))
    timed(f"MMDiT fwd batch {2*frames} (no shift gate)",
          lambda: fwdj(pipe.mmdit_params, x2, ctx2, pl2, frames), args.reps)
    timed(f"MMDiT fwd batch {frames}",
          lambda: fwdj(pipe.mmdit_params, init.astype(jnp.bfloat16),
                       ctx2[:1], pl2[:1], frames), args.reps)
    timed("MMDiT fwd batch 1 (style capture cost)",
          lambda: fwdj(pipe.mmdit_params, init[:1].astype(jnp.bfloat16),
                       ctx2[:1], pl2[:1], 1), args.reps)


def probe_attn(args):
    from univst_tpu.attention.ops import heads_attention

    heads, dh = 24, 64
    t = (args.size // 16) ** 2 + 333  # joint length (img tokens + context)
    for b in (8, 16):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, heads, t, dh), jnp.bfloat16)
        fl = jax.jit(lambda q: heads_attention(q, q, q))
        bytes_flops = 4 * b * heads * t * t * dh
        sec = timed(f"joint flash attn B={b} T=S={t} (current blocks)",
                    lambda: fl(q), args.reps)
        print(f"{'':58s} -> {bytes_flops/sec/1e12:8.1f} TFLOPS effective")

    # raw library kernel with explicit block sizes at the padded length
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    tp = -(-t // 512) * 512
    b = 16
    q = jax.random.normal(jax.random.PRNGKey(1), (b, heads, tp, dh), jnp.bfloat16)
    flops = 4 * b * heads * tp * tp * dh
    for bq, bkm, bk in ((512, 512, 512), (1536, 1536, 512), (4608, 1536, 512),
                        (512, 512, 256), (1536, 512, 512)):
        if tp % bq or tp % bkm or tp % bk:
            continue
        bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bkm,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq)
        fl = jax.jit(lambda q, bs=bs: flash_attention(
            q, q, q, sm_scale=dh**-0.5, block_sizes=bs))
        try:
            sec = timed(f"raw flash T={tp} blocks q={bq} kM={bkm} k={bk}",
                        lambda: fl(q), args.reps)
            print(f"{'':58s} -> {flops/sec/1e12:8.1f} TFLOPS effective")
        except Exception as e:  # noqa: BLE001
            print(f"blocks q={bq} kM={bkm} k={bk}: {type(e).__name__}: {str(e)[:100]}")


def probe_matmul(args):
    d = 1536
    tokens = 32 * ((args.size // 16) ** 2 + 333)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (tokens, d), jnp.bfloat16)
    w1 = jax.random.normal(key, (d, 4 * d), jnp.bfloat16)
    w2 = jax.random.normal(key, (4 * d, d), jnp.bfloat16)

    @jax.jit
    def mlp(x, w1, w2):
        return jnp.dot(jax.nn.gelu(jnp.dot(x, w1)), w2)

    flops = 2 * tokens * d * 4 * d * 2
    sec = timed(f"MLP GEMM pair [{tokens},{d}]x[{d},{4*d}]x[{4*d},{d}]",
                lambda: mlp(x, w1, w2), args.reps)
    print(f"{'':58s} -> {flops/sec/1e12:8.1f} TFLOPS effective")

    wq = jax.random.normal(key, (d, 3 * d), jnp.bfloat16)

    @jax.jit
    def qkv(x, w):
        return jnp.dot(x, w)

    flops = 2 * tokens * d * 3 * d
    sec = timed(f"qkv GEMM [{tokens},{d}]x[{d},{3*d}]", lambda: qkv(x, wq),
                args.reps)
    print(f"{'':58s} -> {flops/sec/1e12:8.1f} TFLOPS effective")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="segments",
                    choices=("segments", "attn", "matmul"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()
    {"segments": probe_segments, "attn": probe_attn,
     "matmul": probe_matmul}[args.probe](args)


if __name__ == "__main__":
    main()
