"""MXU shape-efficiency probe for the SD3 attention floor.

Answers two questions that set the joint-attention kernel's speed-of-light
(scripts/bench_sd3_attn_tune.py sweeps the kernel itself):

  1. Does a contraction depth of 64 (the narrow-qk QK matmul) cost half a
     128-deep pass, or does the MXU pad it to 128 anyway?
  2. Does a 64-lane output (PV at the real head dim) cost less than the
     128-lane padded one?

Each case times a chained matmul at the SD3 joint-attention block shape
(rows=4608, cols=2048) so the answers translate directly into the kernel's
executed-FLOP model. Usage: python scripts/bench_mxu_probe.py [--iters 32]
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


def bench_case(name, m, k, n, iters, reps, batch=16, flops_note=""):
    """Time y[b] = x[b] @ w for ``iters`` scan steps inside ONE jit, batched
    over ``batch`` so per-step work is ms-scale. DIFFERENTIAL timing — the
    reported per-matmul time is (t(2*iters) - t(iters)) / iters — cancels
    the tunnel RTT and dispatch overhead exactly. The carry feeds forward
    through a cast so steps are data-dependent and XLA cannot elide them."""
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (batch, m, k), jnp.bfloat16)
    w = jax.random.normal(kw, (k, n), jnp.bfloat16)

    def make(length):
        @jax.jit
        def run(xc, wc):
            def step(c, _):
                y = jax.lax.dot_general(
                    c, wc, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                nxt = (
                    y[..., :k] if n >= k
                    else jnp.pad(y, ((0, 0), (0, 0), (0, k - n)))
                ).astype(jnp.bfloat16)
                return nxt, y[0, 0, 0]
            c, ys = jax.lax.scan(step, xc, None, length=length)
            return jnp.sum(ys) + jnp.sum(c[0])
        return run

    def best_of(fn):
        np.asarray(fn(x, w))  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(x, w))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(make(iters))
    t2 = best_of(make(2 * iters))
    per = (t2 - t1) / iters / batch
    fl = 2.0 * m * k * n
    print(f"{name:34s} [{m:5d}x{k:4d}]@[{k:4d}x{n:4d}]: "
          f"{per*1e6:9.1f} us  {fl/per/1e12:7.1f} TFLOPS {flops_note}",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    print(f"device={jax.devices()[0]}")
    it, rp = args.iters, args.reps

    # QK shape: [bq, dh] @ [dh, bk] at narrow (64) vs padded (128) depth
    bench_case("QK depth=64 (narrow)", 4608, 64, 2048, it, rp)
    bench_case("QK depth=128 (padded)", 4608, 128, 2048, it, rp)
    # PV shape: [bq, bk] @ [bk, n] at real (64) vs padded (128) output lanes
    bench_case("PV out=64 (real dh)", 4608, 2048, 64, it, rp)
    bench_case("PV out=72 (dh+sum lane)", 4608, 2048, 72, it, rp)
    bench_case("PV out=128 (padded)", 4608, 2048, 128, it, rp)
    # reference point: a big square-ish GEMM at the MMDiT MLP shape
    bench_case("MLP ref [rows x 1536 x 6144]", 4608, 1536, 6144, it, rp)


if __name__ == "__main__":
    main()
