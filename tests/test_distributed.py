"""Mesh sharding tests on the 8-device virtual CPU mesh (SURVEY.md §5):
frame-parallel inference must be numerically identical to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from univst_tpu.core.config import SD_PNP_FRAME_INDICES, SD_STYLE_SHIFT
from univst_tpu.distributed.mesh import batch_sharding, make_mesh, replicate, shard_batch
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_frame_sharded_unet_matches_single_device():
    cfg = UNetSDConfig.tiny()
    model = UNetPseudo3D(cfg)
    f = 8  # 3F = 24 rows over 8 devices
    vctx = VideoCtx(num_frames=f, frame_indices=SD_PNP_FRAME_INDICES)
    x3 = jax.random.normal(jax.random.PRNGKey(0), (3 * f, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 32), jnp.float32)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(2), x3, jnp.asarray(301), ctx, vctx
    )
    sctx = StyleCtx(step_idx=jnp.asarray(10), cfg=SD_STYLE_SHIFT)

    def fwd(p, xx, cc):
        return model.apply(p, xx, jnp.asarray(301), cc, vctx, sctx)[0]

    ref = np.asarray(jax.jit(fwd)(params, x3, ctx))

    mesh = make_mesh(n_data=8, n_tensor=1)
    p_sh = replicate(params, mesh)
    x_sh = shard_batch(x3, mesh)
    ctx_sh = jax.device_put(ctx, NamedSharding(mesh, P()))
    out = jax.jit(fwd, out_shardings=batch_sharding(mesh, 4))(p_sh, x_sh, ctx_sh)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mmdit_tensor_parallel_matches_single_device():
    """(data=2, tensor=4) mesh: column/row-parallel MMDiT matches the
    single-device forward; params actually sharded on the tensor axis."""
    from univst_tpu.core.config import SD3_FRAME_INDICES
    from univst_tpu.distributed.tp import shard_mmdit_params
    from univst_tpu.models.mmdit import MMDiT, MMDiTConfig

    cfg = MMDiTConfig.tiny(num_heads=4, head_dim=16)  # 4 heads / tensor=4
    model = MMDiT(cfg)
    f = 4
    vctx = VideoCtx(num_frames=f, frame_indices=SD3_FRAME_INDICES)
    x = jax.random.normal(jax.random.PRNGKey(0), (f, 8, 8, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_projection_dim))
    params = jax.jit(model.init, static_argnums=(5,))(
        jax.random.PRNGKey(3), x, jnp.asarray(500.0), ctx, pooled, vctx
    )["params"]

    def fwd(p, xx, cc, pp):
        return model.apply({"params": p}, xx, jnp.asarray(500.0), cc, pp, vctx)[0]

    ref = np.asarray(jax.jit(fwd)(params, x, ctx, pooled))

    mesh = make_mesh(n_data=2, n_tensor=4)
    p_sh = shard_mmdit_params(params, mesh)
    # a column-parallel kernel must live on 4 tensor shards
    qk = p_sh["block_0"]["attn"]["to_q"]["kernel"]
    assert len(qk.sharding.device_set) >= 4
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    ctx_sh = jax.device_put(ctx, NamedSharding(mesh, P()))
    pooled_sh = jax.device_put(pooled, NamedSharding(mesh, P()))
    out = jax.jit(fwd)(p_sh, x_sh, ctx_sh, pooled_sh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)
