"""Per-step collective-byte census at REAL model scale (VERDICT r3 #3).

Compiles one denoiser forward per backbone family on an 8-device virtual CPU
mesh (frame-sharded; SD3 additionally dp x tp), extracts every collective from
the SPMD-partitioned HLO, and prints a per-family byte table plus a projected
8-chip scaling efficiency from measured single-chip step times and v5e ICI
bandwidth. Compile-only: nothing executes, no params are materialized
(jax.eval_shape + AOT lowering on ShapeDtypeStructs).

Usage:  python scripts/comm_census.py [--families sd,ad,sd3]
Output: a markdown table for BENCH_NOTES.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")

from jax.sharding import NamedSharding, PartitionSpec as P

from univst_tpu.core.config import (
    AD_STYLE_SHIFT,
    SD3_FRAME_INDICES,
    SD3_STYLE_SHIFT,
    SD_PNP_FRAME_INDICES,
    SD_STYLE_SHIFT,
)
from univst_tpu.distributed.hlo_census import collect_collectives
from univst_tpu.distributed.mesh import make_mesh
from univst_tpu.distributed.tp import mmdit_param_shardings
from univst_tpu.models.layers import StyleCtx, VideoCtx

# v5e ICI: 2D torus, ~45 GB/s per link per direction; ring collectives on one
# torus axis drive 2 links concurrently -> ~90 GB/s effective per-chip
# collective bandwidth (jax-ml.github.io/scaling-book numbers).
ICI_BYTES_PER_S = 90e9

# Measured single-chip step times on v5e (BENCH_NOTES round 3):
#   sd: phase-1 2-branch 354 ms / solo 169 ms -> use the 3-branch-equivalent
#       denoise mix; for projection use the stylize-dominant 354 ms.
MEASURED_STEP_S = {"sd": 0.354, "ad": 0.514, "sd3": 7.481}


def collect(hlo_text):
    # shared parser (also used by tests/test_comm_pattern.py); drop the
    # hlo-line element — the census only tallies (op, bytes)
    return [(op, sz) for op, sz, _ in collect_collectives(hlo_text)]


def census_sd(legacy: bool = False):
    """SD1.5 phase-1 stylize step at 512px/16f, as the pipeline runs it:
    the 2-branch [content | stylized] batch with the style-singleton K/V
    injected (pipelines/sd.py _stylize_chunk_singleton). ``legacy=True``
    censuses the in-batch 3-branch forward instead — whose 48-row axis
    cannot be branch-aligned on 8 shards, forcing full-activation
    all-gathers (kept to document the contrast)."""
    from univst_tpu.models.unet_sd import (
        UNetPseudo3D, UNetSDConfig, extract_pnp_kv,
    )

    f = 16
    cfg = UNetSDConfig.sd15(temporal_identity=True)
    unet = UNetPseudo3D(cfg, dtype=jnp.bfloat16)
    vctx = VideoCtx(num_frames=f, frame_indices=SD_PNP_FRAME_INDICES)
    mesh = make_mesh(n_data=8, n_tensor=1)
    repl = NamedSharding(mesh, P())
    sh_x = NamedSharding(mesh, P("data", None, None, None))
    nb = 3 if legacy else 2
    pshapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((nb * f, 64, 64, 4), jnp.bfloat16),
                            jnp.asarray(0), jnp.zeros((nb, 77, cfg.cross_attention_dim),
                                                      jnp.bfloat16), vctx),
        jax.random.PRNGKey(0),
    )["params"]
    xs = jax.ShapeDtypeStruct((nb * f, 64, 64, 4), jnp.bfloat16, sharding=sh_x)
    cs = jax.ShapeDtypeStruct((nb, 77, cfg.cross_attention_dim), jnp.bfloat16,
                              sharding=repl)
    ps = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), pshapes
    )

    if legacy:
        def fn(p, xx, cc):
            sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=SD_STYLE_SHIFT)
            return unet.apply({"params": p}, xx, jnp.asarray(501), cc, vctx, sctx)[0]

        compiled = jax.jit(fn, out_shardings=sh_x).lower(ps, xs, cs).compile()
        return collect(compiled.as_text())

    # replicated singleton style K/V (one frame, produced by the pre-pass)
    vctx1 = VideoCtx(num_frames=1, frame_indices=())
    kv_shapes = jax.eval_shape(
        lambda k: extract_pnp_kv(
            unet.init(k, jnp.zeros((1, 64, 64, 4), jnp.bfloat16),
                      jnp.asarray(0),
                      jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16),
                      vctx1,
                      StyleCtx(step_idx=jnp.asarray(0), cfg=SD_STYLE_SHIFT,
                               capture=True))["pnp_kv"]
        ),
        jax.random.PRNGKey(0),
    )
    kvs = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), kv_shapes
    )

    def fn(p, xx, cc, kv):
        sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=SD_STYLE_SHIFT, style_kv=kv)
        return unet.apply({"params": p}, xx, jnp.asarray(501), cc, vctx, sctx)[0]

    compiled = jax.jit(fn, out_shardings=sh_x).lower(ps, xs, cs, kvs).compile()
    return collect(compiled.as_text())


def census_ad(legacy: bool = False):
    """AnimateDiff frame-sharded stylize step at 512px/16f.

    Default: the pipeline's capture-and-inject decomposition (style-only
    F-row capture forward + 2-branch injected forward, both branch-aligned
    under the mesh). ``legacy=True``: the in-batch 3-branch forward, whose
    48-row axis cannot be branch-aligned on 8 shards — GSPMD all-gathers at
    every branch-chunking reshape (kept to document the contrast)."""
    from univst_tpu.models.unet_ad import UNetAnimateDiff, UNetADConfig
    from univst_tpu.models.unet_sd import extract_pnp_kv

    f = 16
    cfg = UNetADConfig.ad_v2()
    unet = UNetAnimateDiff(cfg, dtype=jnp.bfloat16)
    mesh = make_mesh(n_data=8, n_tensor=1)
    # mesh in the ctx -> motion modules reshard to token-sharded around
    # their temporal attention (all-to-all) instead of gathering full KV
    vctx = VideoCtx(num_frames=f, frame_indices=(), mesh=mesh)
    repl = NamedSharding(mesh, P())
    sh_x = NamedSharding(mesh, P("data", None, None, None))
    pshapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((3 * f, 64, 64, 4), jnp.bfloat16),
                            jnp.asarray(0),
                            jnp.zeros((3, 77, cfg.cross_attention_dim), jnp.bfloat16),
                            vctx),
        jax.random.PRNGKey(0),
    )["params"]
    cs = jax.ShapeDtypeStruct((3, 77, cfg.cross_attention_dim), jnp.bfloat16,
                              sharding=repl)
    ps = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), pshapes
    )

    if legacy:
        xs = jax.ShapeDtypeStruct((3 * f, 64, 64, 4), jnp.bfloat16, sharding=sh_x)

        def fn(p, xx, cc):
            sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=AD_STYLE_SHIFT)
            return unet.apply({"params": p}, xx, jnp.asarray(501), cc, vctx, sctx)[0]

        compiled = jax.jit(fn, out_shardings=sh_x).lower(ps, xs, cs).compile()
        return collect(compiled.as_text())

    xs = jax.ShapeDtypeStruct((2 * f, 64, 64, 4), jnp.bfloat16, sharding=sh_x)
    ss = jax.ShapeDtypeStruct((f, 64, 64, 4), jnp.bfloat16, sharding=sh_x)

    def fn(p, x2, sty, cc):
        sctx_cap = StyleCtx(step_idx=jnp.asarray(10), cfg=AD_STYLE_SHIFT,
                            capture=True)
        _, state = unet.apply({"params": p}, sty, jnp.asarray(501), cc[1:2],
                              vctx, sctx_cap, mutable=["pnp_kv"])
        kv = extract_pnp_kv(state["pnp_kv"])
        sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=AD_STYLE_SHIFT, style_kv=kv)
        cc2 = jnp.concatenate([cc[:1], cc[2:3]], axis=0)
        return unet.apply({"params": p}, x2, jnp.asarray(501), cc2, vctx, sctx)[0]

    compiled = jax.jit(fn, out_shardings=sh_x).lower(ps, xs, ss, cs).compile()
    return collect(compiled.as_text())


def census_sd3(legacy: bool = False):
    """SD3 stylize step at 1024px/16f on a (data=4, tensor=2) mesh, as the
    pipeline runs it: single-frame style capture forward + 2-branch
    [content | stylized] injected batch (pipelines/sd3.py _stylize2_segment).
    ``legacy=True`` censuses the in-batch 3-branch forward — whose 48-row
    axis misaligns with 4 dp shards (12 rows/shard vs branch boundaries at
    16/32), forcing full-activation regathers at every branch-chunking
    reshape (kept to document the contrast)."""
    from univst_tpu.models.mmdit import MMDiT, MMDiTConfig, extract_mmdit_style_kv

    f = 16
    cfg = MMDiTConfig.sd3_medium()
    model = MMDiT(cfg, dtype=jnp.bfloat16)
    vctx = VideoCtx(num_frames=f, frame_indices=SD3_FRAME_INDICES)
    mesh = make_mesh(n_data=4, n_tensor=2)
    repl = NamedSharding(mesh, P())
    sh_x = NamedSharding(mesh, P("data", None, None, None))
    nb = 3 if legacy else 2
    pshapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((nb * f, 128, 128, 16), jnp.bfloat16),
                             jnp.asarray(500.0),
                             jnp.zeros((nb, 333, cfg.joint_attention_dim), jnp.bfloat16),
                             jnp.zeros((nb, cfg.pooled_projection_dim), jnp.bfloat16),
                             vctx),
        jax.random.PRNGKey(0),
    )["params"]
    shardings = mmdit_param_shardings(pshapes, mesh)
    ps = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        pshapes, shardings,
    )
    xs = jax.ShapeDtypeStruct((nb * f, 128, 128, 16), jnp.bfloat16, sharding=sh_x)
    cs = jax.ShapeDtypeStruct((nb, 333, cfg.joint_attention_dim), jnp.bfloat16,
                              sharding=repl)
    pls = jax.ShapeDtypeStruct((nb, cfg.pooled_projection_dim), jnp.bfloat16,
                               sharding=repl)

    if legacy:
        def fn(p, xx, cc, pl):
            sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=SD3_STYLE_SHIFT)
            return model.apply({"params": p}, xx, jnp.asarray(500.0), cc, pl,
                               vctx, sctx)[0]

        compiled = jax.jit(fn, out_shardings=sh_x).lower(ps, xs, cs, pls).compile()
        return collect(compiled.as_text())

    ss = jax.ShapeDtypeStruct((1, 128, 128, 16), jnp.bfloat16, sharding=repl)
    vctx1 = VideoCtx(num_frames=1, frame_indices=())

    def fn(p, xx, sty, cc, pl):
        sctx_cap = StyleCtx(step_idx=jnp.asarray(10), cfg=SD3_STYLE_SHIFT,
                            capture=True)
        _, state = model.apply({"params": p}, sty, jnp.asarray(500.0),
                               cc[1:2], pl[1:2], vctx1, sctx_cap,
                               mutable=["pnp_kv"])
        kv = extract_mmdit_style_kv(state["pnp_kv"])
        sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=SD3_STYLE_SHIFT,
                        style_kv=kv)
        return model.apply({"params": p}, xx, jnp.asarray(500.0), cc, pl,
                           vctx, sctx)[0]

    compiled = jax.jit(fn, out_shardings=sh_x).lower(ps, xs, ss, cs, pls).compile()
    return collect(compiled.as_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="sd,ad,sd3")
    ap.add_argument("--legacy", action="store_true",
                    help="census the legacy in-batch 3-branch forwards "
                         "(shard-misaligned; not what the pipelines run)")
    args = ap.parse_args()
    fams = args.families.split(",")
    fns = {"sd": (lambda: census_sd(legacy=args.legacy)),
           "ad": (lambda: census_ad(legacy=args.legacy)),
           "sd3": (lambda: census_sd3(legacy=args.legacy))}

    print("| family | collective | count | total MB/step |")
    print("|---|---|---:|---:|")
    rows = {}
    for fam in fams:
        colls = fns[fam]()
        by_op = {}
        for op, sz in colls:
            c, s = by_op.get(op, (0, 0))
            by_op[op] = (c + 1, s + sz)
        total = sum(s for _, s in by_op.values())
        rows[fam] = total
        for op, (c, s) in sorted(by_op.items()):
            print(f"| {fam} | {op} | {c} | {s/1e6:.2f} |")
        print(f"| {fam} | **total** |  | **{total/1e6:.2f}** |")

    print()
    print("Projected 8-chip scaling (v5e-8, ICI ring bw ~90 GB/s/chip):")
    print("| family | step 1-chip (s) | comm (ms) | step 8-chip (s) | eff |")
    print("|---|---:|---:|---:|---:|")
    for fam, total in rows.items():
        t1 = MEASURED_STEP_S[fam]
        tc = total / ICI_BYTES_PER_S  # per-step collective time, no overlap
        t8 = t1 / 8 + tc
        print(f"| {fam} | {t1:.3f} | {tc*1e3:.1f} | {t8:.3f} | "
              f"{t1/8/t8*100:.0f}% |")


if __name__ == "__main__":
    main()
