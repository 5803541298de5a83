"""Communication-pattern assertions for frame-sharded execution (SURVEY §5).

Sparse-causal attention needs only frame 0 ('first') and +/-1 neighbor frames,
so under a frame-sharded mesh its cross-frame KV must lower to O(1-frame)
collectives — a frame-0 broadcast plus halo exchanges (collective-permute) —
NOT a full-tensor all-gather. cross_frame_kv is written as slice/shift/
broadcast ops (attention/ops.py:_select_frames) precisely so GSPMD produces
that lowering; this test compiles the sharded 2-branch stylization denoise
step and inspects the HLO to keep it true.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from univst_tpu.core.config import SD_PNP_FRAME_INDICES, SD_STYLE_SHIFT
from univst_tpu.distributed.mesh import make_mesh, replicate
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig, extract_pnp_kv

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'

_COLL = ("all-gather", "collective-permute", "all-reduce", "all-to-all",
         "reduce-scatter")


def _collect_collectives(hlo_text):
    """[(op, output_bytes, line)] for every collective in the compiled HLO."""
    out = []
    for line in hlo_text.splitlines():
        m = re.search(r"= \S* ?(" + "|".join(_COLL) + r")", line)
        if not m:
            continue
        head = line.split("=", 1)[1].split("(")[0]
        sz = 0
        for dt, dims in re.findall(r"(bf16|f32|f16|s32|u32|pred)\[([0-9,]+)\]", head):
            n = 1
            for d in dims.split(","):
                n *= int(d)
            sz += n * (2 if dt in ("bf16", "f16") else 4)
        out.append((m.group(1), sz, line.strip()))
    return out


def test_frame_sharded_cross_frame_kv_has_no_allgather():
    n = 8
    f = 2 * n
    cfg = UNetSDConfig.tiny(temporal_identity=True)
    unet = UNetPseudo3D(cfg, dtype=jnp.bfloat16)
    h8 = 8
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (2 * f, h8, h8, 4), jnp.float32)
    ctx = jax.random.normal(key, (2, 77, cfg.cross_attention_dim), jnp.bfloat16)
    vctx = VideoCtx(num_frames=f, frame_indices=SD_PNP_FRAME_INDICES)
    vctx1 = VideoCtx(num_frames=1, frame_indices=())
    params = jax.jit(unet.init, static_argnums=(4,))(
        key, x2.astype(jnp.bfloat16), jnp.asarray(0), ctx, vctx
    )["params"]
    sctx_cap = StyleCtx(step_idx=jnp.asarray(0), cfg=SD_STYLE_SHIFT, capture=True)
    _, st = unet.apply(
        {"params": params}, x2[:1].astype(jnp.bfloat16), jnp.asarray(501),
        ctx[:1], vctx1, sctx_cap, mutable=["pnp_kv"],
    )
    style_kv = extract_pnp_kv(st["pnp_kv"])

    mesh = make_mesh(n_data=n, n_tensor=1)
    params_r = replicate(params, mesh)
    xs = jax.device_put(x2, NamedSharding(mesh, P("data", None, None, None)))
    ctxs = jax.device_put(ctx, NamedSharding(mesh, P()))
    kvs = jax.device_put(style_kv, NamedSharding(mesh, P()))

    def fn(p, x, c, kv):
        sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=SD_STYLE_SHIFT, style_kv=kv)
        eps, _ = unet.apply(
            {"params": p}, x.astype(jnp.bfloat16), jnp.asarray(501), c, vctx, sctx
        )
        return eps

    compiled = jax.jit(
        fn, out_shardings=NamedSharding(mesh, P("data", None, None, None))
    ).lower(params_r, xs, ctxs, kvs).compile()
    colls = _collect_collectives(compiled.as_text())
    assert colls, "expected collectives under a frame-sharded mesh"

    # 1) cross-frame KV must NOT lower to all-gathers / all-to-alls
    bad = [c for c in colls if c[0] in ("all-gather", "all-to-all")]
    assert not bad, f"full-tensor gathers in sharded attention: {bad[:3]}"

    # 2) halo exchange present (the -1 neighbor / frame-0 broadcast)
    assert any(op == "collective-permute" for op, _, _ in colls)

    # 3) per-collective payloads stay O(frames-per-shard), never the full
    #    16-frame tensor: bound = one shard's rows of the largest activation
    #    (2 branches x 2 frames x 64 tokens x 32ch, fp32) with headroom for
    #    fusion; the full-tensor all-gather this guards against is 8x bigger.
    per_shard_rows = 2 * (f // n)
    bound = per_shard_rows * h8 * h8 * 32 * 4 * 2
    big = [(op, sz) for op, sz, _ in colls if sz > bound]
    assert not big, f"collective payloads exceed per-shard scale: {big[:5]}"

    # 4) numeric parity with the unsharded computation (bf16 compute —
    #    partitioning changes reduction order, so tolerate ~2% of the output
    #    scale; measured max deviation is ~0.047 on outputs of scale ~2.9)
    out_sharded = np.asarray(jax.jit(fn)(params_r, xs, ctxs, kvs))
    out_single = np.asarray(jax.jit(fn)(params, x2, ctx, style_kv))
    scale = np.abs(out_single).max()
    np.testing.assert_allclose(
        out_sharded / scale, out_single / scale, atol=0.03
    )
