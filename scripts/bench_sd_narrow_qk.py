"""A/B the narrow-qk kernel option at the SD shapes (dh=40) on the real TPU.

narrow_qk keeps q/k at the real head dim instead of the 128-lane pad (exact:
the QK contraction over zero pad lanes contributes nothing; see
pallas_attention.py). Measured a ~4.5% win at the SD3 joint shape (dh=64);
this times the production SD configs (L=4096, d=320, 8 heads, dh=40 -> q/k
blocks at 40 lanes) so video_mha can enable it per measurement, not hope.
Usage: python scripts/bench_sd_narrow_qk.py [--iters 10]
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

from univst_tpu.attention.pallas_attention import video_flash_attention

F = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(f"device={jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    heads, dh, l = 8, 40, 4096  # the 64x64 level, d=320
    for b in (16, 32):  # solo / 2-branch batches (frames included)
        for idx in ((-1, "first"), ("first", -1, 0)):
            shp = (b // F, F, heads, l, dh)
            q = jax.random.normal(jax.random.fold_in(key, b), shp, jnp.bfloat16)
            for narrow in (False, True):

                @jax.jit
                def att(qx, kx, vx, narrow=narrow, idx=idx):
                    return video_flash_attention(
                        qx, kx, vx, idx, block_q=4096, block_k=4096,
                        dual=True, narrow_qk=narrow)

                def run(qx):
                    for _ in range(args.iters):
                        qx = att(qx, q, q)
                    return qx

                np.asarray(jnp.sum(run(q)))  # compile
                best = 1e9
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    np.asarray(jnp.sum(run(q)))
                    best = min(best, time.perf_counter() - t0)
                per = (best - 0.028) / args.iters
                print(f"b={b} {len(idx)}-src narrow={int(narrow)}: "
                      f"{per*1e3:8.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
