"""UniVST-TPU headline benchmark.

Headline metric: end-to-end stylized frames/sec/chip — SD-1.5 @512px,
16 frames, 50 denoising steps of the 3-branch localized style transfer (the
reference's main event, stable_diffusion.py:630-766) + temporal-VAE decode.
Secondary metrics (emitted in the same JSON line under "extra"):
  * inversion steps/sec — 50-step content inversion, batch 1x16 frames
    (reference workload: inversion_tools/ddim_inversion.py:101,135);
  * effective TFLOPS + MFU of the stylization loop (XLA cost-analysis FLOPs /
    measured step time / chip peak).

Weights are random-init (no hub access in this environment); throughput is
weight-independent. Trajectories are synthetic on-device arrays, mask enabled.
The style trajectory is synthesized with its real structural property —
identical frames (a repeated style image) — which the round-2 singleton fast
path exploits exactly (tests/test_style_singleton.py).

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator is a documented engineering ESTIMATE of the reference pipeline on
one A100 — an error bar, not a measurement: 0.74 f/s (exact 52.3 TFLOP/step
jaxpr count at 45% MFU + ~2 s decode) to 1.05 f/s (the deliberately
reference-favorable 40 TFLOP figure, no decode). The headline vs_baseline
divides by the favorable 1.05; extra.vs_baseline_range carries both bounds
(VERDICT r4 item 8). See BENCH_NOTES.md "FLOP accounting".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import sys
import time

REF_BASELINE_FPS = 1.05  # favorable bound of the estimated A100 range (docstring)
REF_BASELINE_FPS_LO = 0.74  # refined-estimate bound (BENCH_NOTES.md FLOP accounting)

# bf16 peak TFLOPS per chip for MFU accounting
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e
}


def _peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK_TFLOPS.items():
        if kind.startswith(k):
            return v
    return 197.0


def _measure_families(families):
    """Run the AD / SD3 smoke benchmarks as subprocesses (each builds a
    multi-GB pipeline; process isolation returns the HBM between runs) and
    collect their --json result lines. Invoked only via --families; the
    driver's plain `python bench.py` run never pays for this."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    cmds = {
        "ad": [sys.executable, os.path.join(here, "scripts/smoke_ad_tpu.py"),
               "--json", "--steps", "4"],
        "sd3": [sys.executable, os.path.join(here, "scripts/smoke_sd3_tpu.py"),
                "--json", "--steps", "2"],
    }
    out = {}
    for fam in families:
        if fam not in cmds:
            continue
        try:
            r = subprocess.run(cmds[fam], capture_output=True, text=True,
                               timeout=3600)
            line = next(l for l in reversed(r.stdout.splitlines())
                        if l.startswith("{"))
            out[fam] = json.loads(line)
        except Exception as e:  # a family failure shouldn't kill the headline
            out[fam] = {"error": repr(e)}
    return out


def main():
    import argparse
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--families", default=os.environ.get("UNIVST_BENCH_FAMILIES", ""),
        help="comma-separated extra workload families to measure and attach "
             "under extra.families (ad,sd3); each runs as a subprocess after "
             "the headline benchmark")
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (cpu for local smoke runs; the "
             "JAX_PLATFORMS env var does not override this machine's "
             "sitecustomize)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # One dispatch per phase (26 multi-branch steps, then 24 stylized-only):
    # a 26-step segment executes in ~11 s, well under the TPU tunnel's ~2 min
    # per-execution watchdog, and the phase boundary lands exactly on the SD
    # shift window (pipelines/segments.py).
    os.environ.setdefault("UNIVST_EXEC_CHUNK", "26")

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
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
    # style trajectories have identical frames by construction; synthesize the
    # canonical single-frame form the singleton fast path consumes
    style_rev = jax.random.normal(k2, (steps + 1, 1, h8, h8, lat_c), jnp.float32)
    init = jax.random.normal(k3, (frames, h8, h8, lat_c), jnp.float32)
    mask = (jax.random.uniform(k4, (frames, size, size)) > 0.5).astype(jnp.float32)
    context = pipe.encode_text("")
    context3 = jnp.concatenate([context] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)

    from univst_tpu.utils.io import fetch_array

    def run():
        out = pipe.stylize_latents(
            content_rev, style_rev, init, context3, mask=mask, cfg=cfg
        )
        # chunked decode (decode_chunk_size=8, a reference knob): all chunks
        # dispatch async, so fetching chunk i overlaps chunk i+1's decode.
        # uint8 because the consumer is PNG/mp4 writing (4x less transfer).
        chunks = pipe.decode_latents_uint8_chunks(out, chunk=8)
        return np.concatenate([fetch_array(c) for c in chunks])

    t0 = time.time()
    run()
    compile_s = time.time() - t0

    times = []
    for _ in range(3):  # best-of-3: the relay adds up to ~10% run-to-run noise
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    fps = frames / best

    # ---- secondary: inversion steps/sec (content inversion workload) -------
    inv_traj = {}

    def run_inv():
        traj, _ = pipe.invert(content_rev[0], context, num_steps=steps, is_opt=True)
        inv_traj["traj"] = traj
        return np.asarray(traj[-1])

    t0 = time.time()
    run_inv()
    inv_compile_s = time.time() - t0
    t0 = time.time()
    run_inv()
    inv_steps_per_sec = steps / (time.time() - t0)

    # ---- secondary: inversion -> reconstruction roundtrip fidelity ---------
    # The reference's own implicit oracle (inversion_tools/ddim_inversion.py:
    # 38-42: invert, sample back with the same schedule) run at the bench's
    # real scale every round — a standing regression gate for kernel or
    # precision changes (VERDICT r3 #5a). Latent-space PSNR; weights are
    # random but the roundtrip property is weight-independent.
    recon_psnr = None
    try:
        from univst_tpu.utils.metrics import psnr as _psnr

        rec = np.asarray(
            pipe.reconstruct_latents(inv_traj["traj"][-1], context,
                                     num_steps=steps),
            np.float64,
        )
        z0 = np.asarray(content_rev[0], np.float64)
        recon_psnr = _psnr(z0, rec, data_range=float(z0.max() - z0.min()))
    except Exception as e:
        print(f"# recon gate failed: {e!r}", file=sys.stderr)

    # ---- secondary: effective TFLOPS / MFU of the stylization loop ---------
    # Matmul/conv FLOPs counted from the traced jaxpr (utils/flops.py) — the
    # XLA cost-analysis surface is unreliable through the remote-TPU relay.
    # The fused Pallas attention is opaque to the jaxpr, so tracing happens
    # with UNIVST_DISABLE_FLASH=1 (the XLA formulation computes the same
    # attention FLOPs). Denominator = the full measured run incl. VAE decode
    # (slightly conservative for the loop's own MFU).
    eff_tflops = mfu = None
    try:
        import os as _os

        import jax.tree_util as jtu

        from univst_tpu.pipelines.sd import (
            _style_prepass,
            _stylize_chunk_singleton,
            _stylize_chunk_solo,
        )
        from univst_tpu.pipelines.segments import phase_segments
        from univst_tpu.utils.flops import count_matmul_flops

        scfg = pipe.style_shift_cfg
        phase1, phase2 = phase_segments(steps, scfg.window_end())
        k1 = phase2[0][0] if phase2 else steps
        c1 = phase1[0][1]
        ts_np = pipe.schedule.timesteps(steps).copy()
        kv = _style_prepass(pipe, pipe.unet_params, style_rev, ts_np[:k1],
                            context3, k1)
        _os.environ["UNIVST_DISABLE_FLASH"] = "1"
        try:
            flops_c1 = count_matmul_flops(
                lambda *a: _stylize_chunk_singleton(
                    pipe, *a, mask, cfg, scfg, c1, k1
                ),
                pipe.unet_params, content_rev, style_rev, kv, init,
                ts_np[:k1], 0, context3,
            )
            total_flops = flops_c1 * len(phase1)
            if phase2:
                c2 = phase2[0][1]
                flops_c2 = count_matmul_flops(
                    lambda *a: _stylize_chunk_solo(
                        pipe, *a, mask, cfg, c2, steps
                    ),
                    pipe.unet_params, content_rev, style_rev[:, :1], init,
                    ts_np, phase2[0][0], context3,
                )
                total_flops += flops_c2 * len(phase2)
        finally:
            del _os.environ["UNIVST_DISABLE_FLASH"]
        eff_tflops = total_flops / best / 1e12
        mfu = eff_tflops / _peak_tflops(dev)
    except Exception as e:
        print(f"# flop counting failed: {e!r}", file=sys.stderr)

    result = {
        "metric": "end-to-end stylized frames/sec/chip (SD1.5 @512, 50 steps)"
        if on_tpu
        else "CPU-smoke stylized frames/sec (tiny cfg)",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REF_BASELINE_FPS, 4),
        "extra": {
            # the baseline denominator is an estimate with an error bar, not
            # a measurement (no GPU exists here): read the headline as
            # "vs_baseline_range x one A100, >=5x projected on 8 chips"
            "baseline_fps_range": [REF_BASELINE_FPS_LO, REF_BASELINE_FPS],
            "vs_baseline_range": [
                round(fps / REF_BASELINE_FPS, 4),
                round(fps / REF_BASELINE_FPS_LO, 4),
            ],
            "inversion_steps_per_sec": round(inv_steps_per_sec, 3),
            "recon_latent_psnr_db": None if recon_psnr is None
            else round(recon_psnr, 2),
            "stylize_run_s": round(best, 2),
            "effective_tflops": None if eff_tflops is None else round(eff_tflops, 1),
            "mfu": None if mfu is None else round(mfu, 3),
        },
    }
    fams = [f for f in args.families.split(",") if f]
    if fams and on_tpu:
        result["extra"]["families"] = _measure_families(fams)
    print(json.dumps(result))
    print(
        f"# device={dev} variant={variant} steps={steps} frames={frames} "
        f"size={size} compile={compile_s:.1f}s run={best:.2f}s "
        f"inv_compile={inv_compile_s:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
