"""Cold-start graph census (VERDICT r3 #7).

Counts every distinct XLA executable one full stylization workflow compiles
(inversion + stylize + decode), with per-graph compile seconds — through the
remote-TPU relay each extra executable costs upload/backend-init time even on
a warm persistent cache, so the number of distinct graphs is a controllable
cold-start multiplier.

Captures jax's own compile log (jax_log_compiles -> 'Finished XLA compilation
of jit(NAME) in S sec') and aggregates by executable name.

Usage:
  python scripts/graph_census.py [--variant tiny --size 64 --frames 4
                                  --steps 10] [--platform cpu] [--json]
Real-scale TPU census: --variant sd15 --size 512 --frames 16 --steps 50.
"""

import argparse
import json
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="tiny")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--fresh-cache", action="store_true",
                    help="use a throwaway compile cache (true cold start)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.fresh_cache:
        import tempfile

        jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/univst_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_log_compiles", True)

    events = []

    class Capture(logging.Handler):
        def emit(self, record):
            m = re.match(
                r"Finished XLA compilation of (\S+) in ([0-9.]+) sec",
                record.getMessage(),
            )
            if m:
                events.append((m.group(1), float(m.group(2))))

    h = Capture()
    logging.getLogger("jax._src.dispatch").addHandler(h)
    logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)

    import jax.numpy as jnp
    import numpy as np

    from univst_tpu.core.config import StyleTransferConfig
    from univst_tpu.pipelines.sd import SDVideoPipeline
    from univst_tpu.utils.io import fetch_array

    frames, size, steps = args.frames, args.size, args.steps
    t_start = time.time()
    pipe = SDVideoPipeline.build(variant=args.variant, num_frames=frames,
                                 height=size, width=size, seed=0)
    h8 = size // 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    content_rev = jax.random.normal(k1, (steps + 1, frames, h8, h8, 4), jnp.float32)
    style_rev = jax.random.normal(k2, (steps + 1, 1, h8, h8, 4), jnp.float32)
    init = jax.random.normal(k3, (frames, h8, h8, 4), jnp.float32)
    mask = (jax.random.uniform(k4, (frames, size, size)) > 0.5).astype(jnp.float32)
    context = pipe.encode_text("")
    context3 = jnp.concatenate([context] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)

    # the bench workload: invert + stylize + chunked decode
    traj, _ = pipe.invert(content_rev[0], context, num_steps=steps, is_opt=True)
    np.asarray(traj[-1])
    out = pipe.stylize_latents(content_rev, style_rev, init, context3,
                               mask=mask, cfg=cfg)
    for c in pipe.decode_latents_uint8_chunks(out, chunk=8):
        fetch_array(c)
    wall = time.time() - t_start

    by_name = {}
    for name, secs in events:
        cnt, tot = by_name.get(name, (0, 0.0))
        by_name[name] = (cnt + 1, tot + secs)
    # trivial dispatch helpers (convert/broadcast/slice...) vs real graphs
    big = {k: v for k, v in by_name.items() if v[1] >= 0.5}
    small = {k: v for k, v in by_name.items() if v[1] < 0.5}

    if args.json:
        print(json.dumps({
            "graphs_total": len(by_name),
            "graphs_major": len(big),
            "compile_s_total": round(sum(t for _, t in by_name.values()), 1),
            "wall_s": round(wall, 1),
            "major": {k: {"count": c, "secs": round(t, 2)}
                      for k, (c, t) in sorted(big.items(),
                                              key=lambda kv: -kv[1][1])},
        }))
    else:
        print(f"{'executable':46s} {'n':>3s} {'compile s':>10s}")
        for k, (c, t) in sorted(by_name.items(), key=lambda kv: -kv[1][1]):
            print(f"{k:46s} {c:3d} {t:10.2f}")
        print(f"-- major graphs (>=0.5 s): {len(big)}   trivial: {len(small)}")
        print(f"-- total compile {sum(t for _, t in by_name.values()):.1f}s "
              f"of {wall:.1f}s wall")


if __name__ == "__main__":
    main()
