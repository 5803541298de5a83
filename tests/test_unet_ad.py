"""AnimateDiff UNet tests: shapes, motion-module zero-init identity, PnP
branch isolation, and the motion converter roundtrip."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.core.config import AD_STYLE_SHIFT
from univst_tpu.models.convert import convert_motion_module, merge_into_params
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.unet_ad import UNetAnimateDiff, UNetADConfig

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'

F = 4


@pytest.fixture(scope="module")
def setup():
    cfg = UNetADConfig.tiny(capture_up_block=2)
    model = UNetAnimateDiff(cfg)
    vctx = VideoCtx(num_frames=F, frame_indices=())
    x = jax.random.normal(jax.random.PRNGKey(0), (F, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32), jnp.float32)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(2), x, jnp.asarray(501), ctx, vctx
    )

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd(xx, cc, t, vc, sc=None):
        return model.apply(params, xx, t, cc, vc, sc)

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_styled(xx, cc, step, vc):
        return model.apply(
            params, xx, jnp.asarray(301), cc, vc,
            StyleCtx(step_idx=step, cfg=AD_STYLE_SHIFT),
        )

    return cfg, model, params, x, ctx, vctx, fwd, fwd_styled


def test_shapes_and_capture(setup):
    cfg, model, params, x, ctx, vctx, fwd, fwd_styled = setup
    out, feat = fwd(x, ctx, jnp.asarray(501), vctx)
    assert out.shape == x.shape
    assert feat is not None and feat.shape[0] == F


def test_motion_zero_init_gives_per_frame_model(setup):
    """proj_out is zero-init (motion_module.py:78-79), so before the motion
    ckpt loads the video model must act per-frame: a static video yields
    identical frames equal to the single-frame output."""
    cfg, model, params, x, ctx, vctx, fwd, fwd_styled = setup
    frame = x[0]
    static = jnp.broadcast_to(frame, x.shape)
    out, _ = fwd(static, ctx, jnp.asarray(301), vctx)
    out = np.asarray(out)
    np.testing.assert_allclose(out, np.broadcast_to(out[0], out.shape), atol=1e-4)
    img_out, _ = model.apply(
        params, frame[None], jnp.asarray(301), ctx, VideoCtx(num_frames=1)
    )
    np.testing.assert_allclose(out[0], np.asarray(img_out)[0], atol=1e-4)


def test_pnp_branch_isolation(setup):
    cfg, model, params, x, ctx, vctx, fwd, fwd_styled = setup
    x3 = jnp.concatenate([x, x * 0.5, -x * 0.2], axis=0)
    ctx3 = jnp.broadcast_to(ctx, (3,) + ctx.shape[1:])
    out_plain, _ = fwd(x3, ctx3, jnp.asarray(301), vctx)
    out_style, _ = fwd_styled(x3, ctx3, jnp.asarray(10), vctx)
    out_plain, out_style = map(np.asarray, (out_plain, out_style))
    np.testing.assert_allclose(out_style[: 2 * F], out_plain[: 2 * F], atol=0)
    assert np.abs(out_style[2 * F :] - out_plain[2 * F :]).max() > 1e-4


def test_motion_module_converter(setup):
    cfg, model, params, *_ = setup
    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[name + ".weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.standard_normal((dout,)).astype(np.float32)

    def one(prefix, c):
        tt = prefix + ".temporal_transformer"
        sd[tt + ".norm.weight"] = rng.standard_normal((c,)).astype(np.float32)
        sd[tt + ".norm.bias"] = rng.standard_normal((c,)).astype(np.float32)
        lin(tt + ".proj_in", c, c)
        lin(tt + ".proj_out", c, c)
        tb = tt + ".transformer_blocks.0"
        for a in range(2):
            ab = f"{tb}.attention_blocks.{a}"
            lin(ab + ".to_q", c, c, bias=False)
            lin(ab + ".to_k", c, c, bias=False)
            lin(ab + ".to_v", c, c, bias=False)
            lin(ab + ".to_out.0", c, c)
            sd[f"{tb}.norms.{a}.weight"] = rng.standard_normal((c,)).astype(np.float32)
            sd[f"{tb}.norms.{a}.bias"] = rng.standard_normal((c,)).astype(np.float32)
            # non-persistent pe buffers sometimes appear in ckpts; must be tolerated
            sd[f"{ab}.pos_encoder.pe"] = rng.standard_normal((1, 24, c)).astype(np.float32)
        lin(tb + ".ff.net.0.proj", c, c * 8)
        lin(tb + ".ff.net.2", c * 4, c)
        sd[tb + ".ff_norm.weight"] = rng.standard_normal((c,)).astype(np.float32)
        sd[tb + ".ff_norm.bias"] = rng.standard_normal((c,)).astype(np.float32)

    chans = cfg.block_out_channels
    for i in range(4):
        for j in range(2):
            one(f"down_blocks.{i}.motion_modules.{j}", chans[i])
        for j in range(3):
            one(f"up_blocks.{i}.motion_modules.{j}", list(reversed(chans))[i])
    one("mid_block.motion_modules.0", chans[-1])

    converted = convert_motion_module(sd, cfg)
    merged = merge_into_params(params["params"], converted)
    np.testing.assert_allclose(
        np.asarray(merged["down_0_motion_0"]["block_0_attn_0"]["to_q"]["kernel"]),
        sd["down_blocks.0.motion_modules.0.temporal_transformer."
           "transformer_blocks.0.attention_blocks.0.to_q.weight"].T,
    )
    # motion module no longer identity after load
    assert np.abs(np.asarray(merged["mid_motion"]["proj_out"]["kernel"])).max() > 0


def test_sparse_controlnet_residuals(setup):
    """Zero-init ControlNet is an exact no-op on the UNet; scaling its
    projections changes the output (C20 wiring)."""
    from univst_tpu.models.sparse_controlnet import (
        SparseControlNet, SparseControlNetConfig,
    )

    cfg, model, params, x, ctx, vctx, fwd, fwd_styled = setup
    ccfg = SparseControlNetConfig.tiny()
    cnet = SparseControlNet(ccfg)
    cond = jax.random.normal(jax.random.PRNGKey(5), (F, 32, 32, 3), jnp.float32)
    cmask = jnp.ones((F, 16, 16, 1), jnp.float32)
    cparams = cnet.init(jax.random.PRNGKey(6), x, jnp.asarray(301), ctx, cond,
                        cmask, vctx)
    down, mid = cnet.apply(cparams, x, jnp.asarray(301), ctx, cond, cmask, vctx)
    assert len(down) == 12 and mid.shape[-1] == cfg.block_out_channels[-1]
    out_ctrl, _ = model.apply(
        params, x, jnp.asarray(301), ctx, vctx, None, (down, mid)
    )
    out_plain, _ = model.apply(params, x, jnp.asarray(301), ctx, vctx, None)
    # zero-init projections -> exact no-op
    np.testing.assert_allclose(np.asarray(out_ctrl), np.asarray(out_plain), atol=0)
    # nonzero residuals propagate
    down2 = tuple(d + 0.1 for d in down)
    out2, _ = model.apply(
        params, x, jnp.asarray(301), ctx, vctx, None, (down2, mid + 0.1)
    )
    assert np.abs(np.asarray(out2) - np.asarray(out_plain)).max() > 1e-4
