"""Pseudo-3D UNet tests: shapes, feature capture, and the 2D-equivalence
invariant (temporal parts are identity at init, so a static video must produce
the single-image result on every frame — the property the reference's
dirac/zero inits guarantee, resnet.py:54-55, attention.py:233).

All forwards are jitted and batched into as few compiled graphs as possible:
the 1-core CPU test runner pays ~seconds per compile, so each test reuses the
module-scoped compiled functions below.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig
from univst_tpu.core.config import SD_STYLE_SHIFT, SD_PNP_FRAME_INDICES

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'

F = 4


@pytest.fixture(scope="module")
def setup():
    cfg = UNetSDConfig.tiny(capture_up_block=2)
    model = UNetPseudo3D(cfg)
    vctx = VideoCtx(num_frames=F, frame_indices=(-1, 0, "first"))
    vctx_pnp = VideoCtx(num_frames=F, frame_indices=SD_PNP_FRAME_INDICES)
    x = jax.random.normal(jax.random.PRNGKey(0), (F, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32), jnp.float32)
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(2), x, jnp.asarray(501), ctx, vctx
    )

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd(xx, cc, t, vc):
        return model.apply(params, xx, t, cc, vc)

    @functools.partial(jax.jit, static_argnums=(3,))
    def fwd_styled(xx, cc, step, vc):
        return model.apply(
            params, xx, jnp.asarray(301), cc, vc,
            StyleCtx(step_idx=step, cfg=SD_STYLE_SHIFT),
        )

    return model, params, x, ctx, vctx, vctx_pnp, fwd, fwd_styled


def test_forward_shapes_and_capture(setup):
    _, _, x, ctx, vctx, _, fwd, _ = setup
    out, feat = fwd(x, ctx, jnp.asarray(501), vctx)
    assert out.shape == x.shape
    assert feat is not None and feat.shape[0] == F


def test_static_video_equals_image_model(setup):
    model, params, x, ctx, vctx, _, fwd, _ = setup
    frame = x[0]
    static_video = jnp.broadcast_to(frame, x.shape)
    out, _ = fwd(static_video, ctx, jnp.asarray(301), vctx)
    out = np.asarray(out)
    np.testing.assert_allclose(out, np.broadcast_to(out[0], out.shape), atol=1e-4)
    img_out, _ = model.apply(
        params, frame[None], jnp.asarray(301), ctx,
        VideoCtx(num_frames=1, frame_indices=()),
    )
    np.testing.assert_allclose(out[0], np.asarray(img_out)[0], atol=1e-4)


def test_style_ctx_branch_isolation_and_window(setup):
    _, _, x, ctx, _, vctx_pnp, fwd, fwd_styled = setup
    x3 = jnp.concatenate([x, x * 0.5, x * -0.25], axis=0)
    ctx3 = jnp.broadcast_to(ctx, (3,) + ctx.shape[1:])
    out_plain, _ = fwd(x3, ctx3, jnp.asarray(301), vctx_pnp)
    out_in, _ = fwd_styled(x3, ctx3, jnp.asarray(10), vctx_pnp)  # inside window
    out_out, _ = fwd_styled(x3, ctx3, jnp.asarray(40), vctx_pnp)  # outside window
    out_plain, out_in, out_out = map(np.asarray, (out_plain, out_in, out_out))
    # inside window: content & style branches untouched, stylized branch shifted
    np.testing.assert_allclose(out_in[: 2 * F], out_plain[: 2 * F], atol=0)
    assert np.abs(out_in[2 * F :] - out_plain[2 * F :]).max() > 1e-4
    # outside window: exact no-op
    np.testing.assert_allclose(out_out, out_plain, atol=0)


def test_linear_projection_variant_builds():
    """SD-2.1 differs by use_linear_projection + per-block head counts; the
    tiny analogue must build and run (converter handles both projections)."""
    import dataclasses

    cfg = dataclasses.replace(
        UNetSDConfig.tiny(), use_linear_projection=True, num_heads=(1, 2, 2, 2)
    )
    model = UNetPseudo3D(cfg)
    vctx = VideoCtx(num_frames=2, frame_indices=(-1, "first"))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(2), x, jnp.asarray(1), ctx, vctx)
    out, _ = model.apply(params, x, jnp.asarray(1), ctx, vctx)
    assert out.shape == x.shape
