"""Scan-amortized attention micro-tuning on the real TPU.

Each config runs ITERS sparse-causal attentions inside one jitted lax.scan so
the per-dispatch tunnel overhead (~28 ms) amortizes away. Compares the Pallas
video kernel against the XLA expanded-KV path per resolution level and block
size. Usage: python scripts/bench_attn_tune.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from univst_tpu.attention.ops import cross_frame_kv, mha
from univst_tpu.attention.pallas_attention import video_flash_attention

ITERS = 10
F = 16


def timed(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(fn().astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.028) / ITERS * 1e3  # subtract one sync RTT, per-iter ms
    print(f"{name:64s} {per:8.2f} ms/iter")
    return per


def scan_of(fn, x):
    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(c)
            # real (but negligible) feedback so iterations serialize
            return c + (o[..., :1] * 1e-20).astype(c.dtype), o[0, :1, :1]

        _, ys = jax.lax.scan(body, x, None, length=ITERS)
        return ys

    return lambda: run(x)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="64,32,16",
                    help="comma-separated hw levels to bench (64/32/16)")
    args = ap.parse_args()
    lv = {int(s) for s in args.levels.split(",")}
    print(f"device={jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    for b in (32, 16):
        for (hw, d, heads) in [(64, 320, 8), (32, 640, 8), (16, 1280, 8)]:
            if hw not in lv:
                continue
            l = hw * hw
            dh = d // heads
            bf = b  # b already counts branches*frames
            q = jax.random.normal(key, (bf, l, d), jnp.bfloat16)

            for idx in ((-1, "first"), ("first", -1, 0)):
                tag = f"b={b} L={l} d={d} {len(idx)}-src"

                def split(x):
                    return x.reshape(bf // F, F, l, heads, dh).transpose(0, 1, 3, 2, 4)

                def merge(o):
                    return o.transpose(0, 1, 3, 2, 4).reshape(bf, l, d)

                for bq, bk, dual in ((2048, 4096, False), (2048, 4096, True),
                                     (2048, 2048, True), (4096, 4096, True),
                                     (2048, 4096, 4), (4096, 4096, 4),
                                     (4096, 4096, 8), (1024, 2048, 4),
                                     (1024, 2048, True),
                                     # shapes that fit the 32x32 / 16x16
                                     # levels (production: l >= 1024 uses the
                                     # kernel with largest_divisor_block(l))
                                     (1024, 1024, True), (512, 1024, True),
                                     (256, 256, True), (128, 256, False)):
                    if bq > l or bk > l:
                        continue

                    def kfn(x, bq=bq, bk=bk, dual=dual, idx=idx):
                        xs = split(x)
                        return merge(video_flash_attention(
                            xs, xs, xs, idx, block_q=bq, block_k=bk, dual=dual))

                    timed(f"kernel {tag} bq={bq} bk={bk} dual={int(dual)}",
                          scan_of(kfn, q))

                def xfn(x, idx=idx):
                    kk = cross_frame_kv(x, F, idx)
                    return mha(x, kk, kk, heads)

                if l <= 1024:  # naive logits OOM at L=4096 (34 GB)
                    import os
                    os.environ["UNIVST_DISABLE_FLASH"] = "1"
                    try:
                        timed(f"xla    {tag} (expanded KV)", scan_of(xfn, q))
                    finally:
                        del os.environ["UNIVST_DISABLE_FLASH"]


if __name__ == "__main__":
    main()
