"""Conv3x3 shapes of the SD UNet vs matmul equivalents (v5e).

For each level: XLA conv3x3, the same FLOPs as an im2col matmul
([B*H*W, 9C] @ [9C, C]), and a 1x1-conv matmul baseline — to size the gap a
custom Pallas conv could close. Scan-amortized. Usage:
python scripts/bench_conv.py
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

ITERS = 20


def timed(name, fn, flops, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jnp.sum(fn().astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.028) / ITERS
    print(f"{name:44s} {per*1e3:8.2f} ms  {flops/per/1e12:7.1f} TFLOPS")


def scan_of(fn, x):
    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(c)
            # full-tensor feedback: a sliced feedback lets XLA compute only a
            # sliced conv (slice-mover), which voids the measurement
            return c + (o.reshape(c.shape) * 1e-20).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c

    return lambda: run(x)


def main():
    print(f"device={jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    b = 16
    for hw, c in [(64, 320), (32, 640), (16, 1280)]:
        x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
        w3 = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
        w1 = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
        wim = jax.random.normal(key, (9 * c, c), jnp.bfloat16) * 0.02
        flops3 = 2 * b * hw * hw * 9 * c * c
        flops1 = 2 * b * hw * hw * c * c

        def conv3(x):
            return jax.lax.conv_general_dilated(
                x, w3, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        timed(f"conv3x3 {hw}x{hw} c={c}", scan_of(conv3, x), flops3)

        def conv3_bf16(x):
            return jax.lax.conv_general_dilated(
                x, w3, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        timed(f"conv3x3 {hw}x{hw} c={c} (bf16 out)", scan_of(conv3_bf16, x), flops3)

        def im2col(x):
            # shifted-slice patch extraction + one matmul (halo = zero pad)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [
                xp[:, dy:dy + hw, dx:dx + hw, :]
                for dy in range(3) for dx in range(3)
            ]
            patches = jnp.concatenate(cols, axis=-1)  # [b, hw, hw, 9c]
            return patches.reshape(-1, 9 * c) @ wim

        timed(f"im2col  {hw}x{hw} c={c}", scan_of(im2col, x), flops3)

        def mm1(x):
            return x.reshape(-1, c) @ w1

        timed(f"1x1     {hw}x{hw} c={c}", scan_of(mm1, x), flops1)


if __name__ == "__main__":
    main()
