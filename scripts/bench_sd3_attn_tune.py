"""Fused-video-kernel tuning sweep at the SD3 joint-attention shape.

The SD3 1024px step (4.26 s measured, ~2 s speed-of-light) spends most of
its time in 24 layers of joint attention running through
``video_flash_attention`` at [b=2, f=16, h=24, L=4096, dh=64] with slots
('first', -1, 0) plus a 333-token context step.  This sweeps the kernel's
(block_q, block_k, chain-count) space at exactly that shape, scan-amortized
(ITERS iterations inside one jit so the ~28 ms tunnel RTT amortizes), and
prints useful-TFLOPS per config so `joint_video_attention` can pin the
winner.  Usage: python scripts/bench_sd3_attn_tune.py [--iters 8]
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

from univst_tpu.attention.ops import resolve_frame_indices
from univst_tpu.attention.pallas_attention import video_flash_attention

IDX = ("first", -1, 0)


def useful_flops(b, f, h, l, dh, lc_valid, idx):
    """QK+PV flops over the ELIDED slot set + the ctx step (the kernel's
    useful math; padding dh 64->128 doubles the executed count)."""
    srcs = np.stack(resolve_frame_indices(idx, f), axis=1)
    uniq = sum(len(set(srcs[fi])) for fi in range(f))  # summed slots over frames
    s_tokens = uniq * l / f + lc_valid
    return 4.0 * b * f * h * l * s_tokens * dh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--solo", action="store_true",
                    help="also sweep the phase-2 solo shape (b=1)")
    ap.add_argument("--full", action="store_true",
                    help="sweep the full split-form config list too (each "
                         "config pays ~30-60s of relay compile/upload)")
    ap.add_argument("--merged", default=None,
                    help="semicolon-separated bq,bk,nch triples for the "
                         "merged-form sweep (overrides the built-in list); "
                         "'-' skips the split-form configs entirely")
    args = ap.parse_args()
    print(f"device={jax.devices()[0]}")

    f, h, l, dh, lc = 16, 24, 4096, 64, 333
    key = jax.random.PRNGKey(0)
    batches = (2, 1) if args.solo else (2,)
    for b in batches:
        kq, kk, kv2, kc1, kc2 = jax.random.split(jax.random.fold_in(key, b), 5)
        q = jax.random.normal(kq, (b, f, h, l, dh), jnp.bfloat16)
        k = jax.random.normal(kk, (b, f, h, l, dh), jnp.bfloat16)
        v = jax.random.normal(kv2, (b, f, h, l, dh), jnp.bfloat16)
        ck = jax.random.normal(kc1, (b, f, h, lc, dh), jnp.bfloat16)
        cv = jax.random.normal(kc2, (b, f, h, lc, dh), jnp.bfloat16)
        flops = useful_flops(b, f, h, l, dh, lc, IDX)

        def bench(bq, bk, dual):
            # NOTE: k/v/ctx MUST be jit ARGUMENTS, not closure captures — a
            # capture becomes a 400 MB module constant and the relay rejects
            # the compile upload (HTTP 413). And instead of a lax.scan, chain
            # ITERS async dispatches through a data dependency (output feeds
            # the next q) and sync once; the device runs them back-to-back,
            # so the RTT amortizes the same.
            @jax.jit
            def att(qx, kx, vx, ckx, cvx):
                return video_flash_attention(
                    qx, kx, vx, IDX, sm_scale=dh**-0.5, block_q=bq, block_k=bk,
                    dual=dual, ctx_k=ckx, ctx_v=cvx, ctx_valid=lc)

            def run(qx):
                for _ in range(args.iters):
                    qx = att(qx, k, v, ck, cv)
                return qx

            np.asarray(jnp.sum(run(q)))  # compile
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(run(q)))
                best = min(best, time.perf_counter() - t0)
            per = (best - 0.028) / args.iters
            print(f"b={b} bq={bq:5d} bk={bk:5d} nch={dual}: "
                  f"{per*1e3:8.2f} ms/call  {flops/per/1e12:7.1f} useful TFLOPS",
                  flush=True)
            return per

        configs = [
            (4096, 4096, 2),  # round-3 production choice (split ctx-q form)
        ]
        if args.merged is not None:
            configs = []
        if args.full:
            configs += [
                (4096, 4096, 4),
                (4096, 2048, 2),
                (4096, 2048, 4),
                (2048, 2048, 2),
                (2048, 4096, 2),
                (4096, 1024, 2),
                (4096, 4096, 8),
            ]
        for bq, bk, dual in configs:
            try:
                bench(bq, bk, dual)
            except Exception as e:  # noqa: BLE001
                print(f"b={b} bq={bq} bk={bk} nch={dual}: "
                      f"{type(e).__name__}: {str(e)[:90]}")

        # merged [img | ctx | pad] q stream (the round-4 joint_video_attention
        # form): ctx queries ride full q blocks, no second KV sweep. The extra
        # 179 pad rows are counted as overhead, not useful flops.
        cq = jax.random.normal(jax.random.fold_in(key, 7 + b),
                               (b, f, h, lc, dh), jnp.bfloat16)
        qj_full = jnp.concatenate([q, cq], axis=3)
        flops_m = useful_flops(b, f, h, l, dh, lc, IDX) * (l + lc) / l

        def bench_merged(bq, bk, dual, lq_pad=None):
            if lq_pad is None:
                lq_pad = -(-(l + lc) // 512) * 512
            qj = jnp.pad(qj_full, ((0, 0), (0, 0), (0, 0),
                                   (0, lq_pad - (l + lc)), (0, 0)))
            if lq_pad % bq:
                print(f"b={b} MERGED lq={lq_pad} bq={bq}: does not divide")
                return
            @jax.jit
            def att(qx, kx, vx, ckx, cvx):
                return video_flash_attention(
                    qx, kx, vx, IDX, sm_scale=dh**-0.5, block_q=bq, block_k=bk,
                    dual=dual, ctx_k=ckx, ctx_v=cvx, ctx_valid=lc)

            def run(qx):
                for _ in range(args.iters):
                    qx = att(qx, k, v, ck, cv)
                return qx

            np.asarray(jnp.sum(run(qj)))
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(jnp.sum(run(qj)))
                best = min(best, time.perf_counter() - t0)
            per = (best - 0.028) / args.iters
            print(f"b={b} MERGED lq={lq_pad} bq={bq:5d} bk={bk:5d} nch={dual}: "
                  f"{per*1e3:8.2f} ms/call  {flops_m/per/1e12:7.1f} useful TFLOPS",
                  flush=True)

        # configs are bq,bk,nch[,lq_pad] — lq_pad defaults to the 512-aligned
        # merged length (4608); a tighter pad (e.g. 4448 = 32-aligned) trims
        # the dead q rows the kernel sweeps
        merged_configs = ((2304, 4096, 2), (2304, 2048, 2), (2304, 4096, 4),
                          (1536, 4096, 2), (4608, 4096, 2), (1152, 4096, 2))
        if args.merged not in (None, "-"):
            merged_configs = tuple(
                tuple(int(t) for t in c.split(","))
                for c in args.merged.split(";") if c
            )
        for cfg_m in merged_configs:
            try:
                bench_merged(*cfg_m)
            except Exception as e:  # noqa: BLE001
                print(f"b={b} MERGED cfg={cfg_m}: "
                      f"{type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
