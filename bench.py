"""UniVST-TPU headline benchmark.

Metric: end-to-end stylized frames/sec/chip — SD-1.5 @512px, 16 frames,
50 denoising steps of the 3-branch localized style transfer (the reference's
main event, stable_diffusion.py:630-766) + temporal-VAE decode.

Weights are random-init (no hub access in this environment); throughput is
weight-independent. Trajectories are synthetic on-device arrays, mask enabled.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator is a documented engineering estimate of the reference pipeline on
one A100: ~50 steps x batch 48 UNet forwards at fp16 with per-step disk reads
~= 15 s for 16 frames => ~1.05 frames/sec. See BENCH_NOTES.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

REF_BASELINE_FPS = 1.05  # estimated reference A100 frames/sec (BENCH_NOTES.md)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/univst_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from univst_tpu.core.config import StyleTransferConfig
    from univst_tpu.pipelines.sd import SDVideoPipeline

    frames, size, steps = 16, 512, 50
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    variant = "sd15" if on_tpu else "tiny"
    if not on_tpu:
        frames, size, steps = 4, 64, 10  # CPU smoke fallback

    pipe = SDVideoPipeline.build(
        variant=variant, num_frames=frames, height=size, width=size, seed=0
    )
    h8 = size // 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lat_c = 4
    content_rev = jax.random.normal(k1, (steps + 1, frames, h8, h8, lat_c), jnp.float32)
    style_rev = jax.random.normal(k2, (steps + 1, frames, h8, h8, lat_c), jnp.float32)
    init = jax.random.normal(k3, (frames, h8, h8, lat_c), jnp.float32)
    mask = (jax.random.uniform(k4, (frames, size, size)) > 0.5).astype(jnp.float32)
    context = pipe.encode_text("")
    context3 = jnp.concatenate([context] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)

    def run():
        out = pipe.stylize_latents(
            content_rev, style_rev, init, context3, mask=mask, cfg=cfg
        )
        px = pipe.decode_latents(out)
        return np.asarray(px)  # force full sync through the tunnel

    t0 = time.time()
    run()
    compile_s = time.time() - t0

    times = []
    for _ in range(2):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    fps = frames / best

    result = {
        "metric": "end-to-end stylized frames/sec/chip (SD1.5 @512, 50 steps)"
        if on_tpu
        else "CPU-smoke stylized frames/sec (tiny cfg)",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REF_BASELINE_FPS, 4),
    }
    print(json.dumps(result))
    print(
        f"# device={dev} variant={variant} steps={steps} frames={frames} "
        f"size={size} compile={compile_s:.1f}s run={best:.2f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
