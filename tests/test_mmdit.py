"""MMDiT tests: shapes, feature capture, style-shift branch isolation,
cross-frame sensitivity, converter structure."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.core.config import SD3_FRAME_INDICES, SD3_STYLE_SHIFT
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.mmdit import MMDiT, MMDiTConfig

pytestmark = pytest.mark.slow  # model-level; run fast set with -m 'not slow'

F = 4


@pytest.fixture(scope="module")
def setup():
    cfg = MMDiTConfig.tiny(capture_block=1)
    model = MMDiT(cfg)
    vctx = VideoCtx(num_frames=F, frame_indices=SD3_FRAME_INDICES)
    x = jax.random.normal(jax.random.PRNGKey(0), (F, 8, 8, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, cfg.joint_attention_dim), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.pooled_projection_dim), jnp.float32)
    params = jax.jit(model.init, static_argnums=(5,))(
        jax.random.PRNGKey(3), x, jnp.asarray(500.0), ctx, pooled, vctx
    )

    @functools.partial(jax.jit, static_argnums=(4,))
    def fwd(xx, cc, pp, t, vc, sc=None):
        return model.apply(params, xx, t, cc, pp, vc, sc)

    @functools.partial(jax.jit, static_argnums=(4,))
    def fwd_styled(xx, cc, pp, step, vc):
        return model.apply(
            params, xx, jnp.asarray(500.0), cc, pp, vc,
            StyleCtx(step_idx=step, cfg=SD3_STYLE_SHIFT),
        )

    return cfg, model, params, x, ctx, pooled, vctx, fwd, fwd_styled


def test_shapes_and_capture(setup):
    cfg, model, params, x, ctx, pooled, vctx, fwd, _ = setup
    out, feat = fwd(x, ctx, pooled, jnp.asarray(500.0), vctx)
    assert out.shape == x.shape
    # capture: [F, h/p, w/p, hidden]
    assert feat.shape == (F, 4, 4, cfg.hidden)


def test_cross_frame_attention_is_active(setup):
    """Unlike SD at init, MMDiT's video attention mixes frames immediately:
    changing frame 3 must change frame 2's output (index -1 gather)."""
    cfg, model, params, x, ctx, pooled, vctx, fwd, _ = setup
    out1, _ = fwd(x, ctx, pooled, jnp.asarray(500.0), vctx)
    x2 = x.at[3].set(x[3] * 2.0 + 1.0)
    out2, _ = fwd(x2, ctx, pooled, jnp.asarray(500.0), vctx)
    # frame 2 attends to frame 3?? no: indices ('first', -1, 0) -> frame 3's
    # KV includes frame 2; frame 2's KV includes frame 1; changing frame 3
    # changes only frame 3's output. Check frame-0 gather instead: changing
    # frame 0 changes ALL frames ('first').
    x3 = x.at[0].set(x[0] * 2.0 + 1.0)
    out3, _ = fwd(x3, ctx, pooled, jnp.asarray(500.0), vctx)
    assert np.abs(np.asarray(out3[2]) - np.asarray(out1[2])).max() > 1e-5
    # and changing frame 3 does NOT change frame 1 (not in its index set)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(out1[1]), atol=1e-5)


def test_style_branch_isolation(setup):
    cfg, model, params, x, ctx, pooled, vctx, fwd, fwd_styled = setup
    x3 = jnp.concatenate([x, x * 0.5, -x * 0.2], axis=0)
    ctx3 = jnp.broadcast_to(ctx, (3,) + ctx.shape[1:])
    p3 = jnp.broadcast_to(pooled, (3,) + pooled.shape[1:])
    out_plain, _ = fwd(x3, ctx3, p3, jnp.asarray(500.0), vctx)
    out_in, _ = fwd_styled(x3, ctx3, p3, jnp.asarray(10), vctx)  # in [0, 30]
    out_out, _ = fwd_styled(x3, ctx3, p3, jnp.asarray(45), vctx)  # 45 > 30
    out_plain, out_in, out_out = map(np.asarray, (out_plain, out_in, out_out))
    np.testing.assert_allclose(out_in[: 2 * F], out_plain[: 2 * F], atol=0)
    assert np.abs(out_in[2 * F :] - out_plain[2 * F :]).max() > 1e-5
    np.testing.assert_allclose(out_out, out_plain, atol=0)


def test_sd3_pipeline_tiny_roundtrip():
    """Tiny SD3 pipeline: encode -> rf invert -> controlled reconstruct ->
    decode, plus the stylize path (CPU shapes)."""
    from univst_tpu.core.config import StyleTransferConfig
    from univst_tpu.pipelines.sd3 import SD3VideoPipeline

    pipe = SD3VideoPipeline.build(variant="tiny", num_frames=F, height=32, width=32,
                              capture_block=1)
    frames = np.random.default_rng(0).uniform(-1, 1, (F, 32, 32, 3)).astype(np.float32)
    lat = pipe.encode_frames(frames, jax.random.PRNGKey(0))
    assert lat.shape == (F, 16, 16, 16)
    context, pooled = pipe.encode_prompt("")
    assert context.shape[-1] == pipe.mmdit.cfg.joint_attention_dim
    assert pooled.shape == (1, pipe.mmdit.cfg.pooled_projection_dim)

    traj, feat = pipe.invert(lat, context, pooled, num_steps=4, capture_step=1)
    assert traj.shape == (5,) + lat.shape
    assert feat is not None

    traj_s, _ = pipe.invert(lat, context, pooled, num_steps=4, is_rf_solver=True)
    assert traj_s.shape == (5,) + lat.shape

    back = pipe.reconstruct_latents(
        traj[-1], lat, context, pooled, num_steps=4, start_step=1, end_step=3
    )
    px = np.asarray(pipe.decode_latents(back))
    assert px.shape == (F, 32, 32, 3)
    assert not np.isnan(px).any()

    ctx3 = jnp.concatenate([context] * 3, axis=0)
    p3 = jnp.concatenate([pooled] * 3, axis=0)
    out = pipe.stylize_latents(
        traj[::-1], traj[::-1], traj[-1], lat, ctx3, p3,
        mask=jnp.ones((F, 32, 32), jnp.float32),
        cfg=StyleTransferConfig(num_steps=4, eta_start_step=1, eta_end_step=3),
    )
    assert not np.isnan(np.asarray(out)).any()


def test_dual_attention_variant():
    """SD3.5-medium dual blocks: extra image-stream self-attention with its
    own 3 modulation chunks; must build, run, and stay branch-isolated."""
    cfg = MMDiTConfig.tiny(qk_norm="rms", dual_attention_layers=(0,))
    model = MMDiT(cfg)
    vctx = VideoCtx(num_frames=F, frame_indices=SD3_FRAME_INDICES)
    x = jax.random.normal(jax.random.PRNGKey(0), (3 * F, 8, 8, 16), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (3, 10, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.pooled_projection_dim))
    params = model.init(jax.random.PRNGKey(3), x, jnp.asarray(500.0), ctx, pooled, vctx)
    # dual block params exist
    assert "attn2" in params["params"]["block_0"]
    assert "attn2" not in params["params"]["block_1"]
    fwd = jax.jit(lambda xx, sc: model.apply(params, xx, jnp.asarray(500.0), ctx,
                                             pooled, vctx, sc), static_argnums=())
    out_plain, _ = model.apply(params, x, jnp.asarray(500.0), ctx, pooled, vctx)
    style = StyleCtx(step_idx=jnp.asarray(10), cfg=SD3_STYLE_SHIFT)
    out_style, _ = model.apply(params, x, jnp.asarray(500.0), ctx, pooled, vctx, style)
    np.testing.assert_allclose(np.asarray(out_style[: 2 * F]),
                               np.asarray(out_plain[: 2 * F]), atol=2e-5)
    assert np.abs(np.asarray(out_style[2 * F:]) - np.asarray(out_plain[2 * F:])).max() > 1e-5


def test_sd3_style_singleton_matches_3branch():
    """SD3 2-branch + in-scan single-frame style capture == legacy 3-branch
    (identical style frames; MMDiT has no per-frame positional state)."""
    import dataclasses

    from univst_tpu.core.config import StyleTransferConfig
    from univst_tpu.pipelines.sd3 import SD3VideoPipeline

    F, size, steps = 4, 64, 4
    pipe = SD3VideoPipeline.build(
        variant="tiny", num_frames=F, height=size, width=size, dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    h8 = size // 8
    content = jnp.asarray(rng.standard_normal((steps + 1, F, h8, h8, 16)), jnp.float32)
    sty1 = rng.standard_normal((steps + 1, 1, h8, h8, 16)).astype(np.float32)
    style = jnp.asarray(np.tile(sty1, (1, F, 1, 1, 1)))
    init = jnp.asarray(rng.standard_normal((F, h8, h8, 16)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((F, h8, h8, 16)), jnp.float32)
    mask = jnp.asarray((rng.random((F, size, size)) > 0.5).astype(np.float32))
    ctx, pooled = pipe.encode_prompt("")
    ctx3 = jnp.concatenate([ctx] * 3, 0)
    pooled3 = jnp.concatenate([pooled] * 3, 0)
    cfg = StyleTransferConfig(num_steps=steps)
    out_new = pipe.stylize_latents(
        content, style, init, img, ctx3, pooled3, mask=mask, cfg=cfg
    )
    legacy = dataclasses.replace(pipe, style_singleton=False)
    out_old = legacy.stylize_latents(
        content, style, init, img, ctx3, pooled3, mask=mask, cfg=cfg
    )
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_old), rtol=1e-4, atol=2e-4
    )


def test_sd3_phase_split_matches_full_loop(monkeypatch):
    """Stylized-only late steps (past the SD3 shift window) == the full
    multi-branch loop: the shift gate is False there and the content/style
    velocity chunks are discarded (custom_pipeline.py:317-320)."""
    import dataclasses

    from univst_tpu.core.config import SD3_STYLE_SHIFT, StyleTransferConfig
    from univst_tpu.pipelines.sd3 import SD3VideoPipeline

    F, size, steps = 4, 64, 6
    pipe = SD3VideoPipeline.build(
        variant="tiny", num_frames=F, height=size, width=size, dtype=jnp.float32
    )
    rng = np.random.default_rng(1)
    h8 = size // 8
    content = jnp.asarray(rng.standard_normal((steps + 1, F, h8, h8, 16)), jnp.float32)
    sty1 = rng.standard_normal((steps + 1, 1, h8, h8, 16)).astype(np.float32)
    style = jnp.asarray(np.tile(sty1, (1, F, 1, 1, 1)))
    init = jnp.asarray(rng.standard_normal((F, h8, h8, 16)), jnp.float32)
    img = jnp.asarray(rng.standard_normal((F, h8, h8, 16)), jnp.float32)
    mask = jnp.asarray((rng.random((F, size, size)) > 0.5).astype(np.float32))
    ctx, pooled = pipe.encode_prompt("")
    ctx3 = jnp.concatenate([ctx] * 3, 0)
    pooled3 = jnp.concatenate([pooled] * 3, 0)
    cfg = StyleTransferConfig(num_steps=steps)
    # window over the test's n: gate fires for i <= 0.6*6 = 3.6 -> window_end 4
    scfg = dataclasses.replace(SD3_STYLE_SHIFT, num_steps=steps)
    assert scfg.window_end() == 4
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "2")  # force segmentation on CPU
    out_split = pipe.stylize_latents(
        content, style, init, img, ctx3, pooled3, mask=mask, cfg=cfg,
        style_cfg=scfg,
    )
    monkeypatch.setenv("UNIVST_DISABLE_PHASE_SPLIT", "1")
    out_full = pipe.stylize_latents(
        content, style, init, img, ctx3, pooled3, mask=mask, cfg=cfg,
        style_cfg=scfg,
    )
    np.testing.assert_allclose(
        np.asarray(out_split), np.asarray(out_full), rtol=1e-5, atol=1e-6
    )


def test_pos_embed_matches_diffusers_formula():
    """Formula-verbatim oracle for the fixed 2D sin-cos positional embedding
    (diffusers get_2d_sincos_pos_embed, itself from MAE). Naming quirk
    pinned here: the upstream concatenates the embedding of grid[0] FIRST
    and calls it 'emb_h' — but grid = meshgrid(grid_w, grid_h) puts the W
    coordinate in grid[0], so pretrained SD3 weights expect
    [w-embedding | h-embedding] (regression: the original implementation
    concatenated the h-embedding first)."""
    from univst_tpu.models.mmdit import sincos_pos_embed_2d

    def upstream(embed_dim, grid_size):
        # diffusers get_2d_sincos_pos_embed, transcribed
        grid_h = np.arange(grid_size, dtype=np.float64)
        grid_w = np.arange(grid_size, dtype=np.float64)
        grid = np.meshgrid(grid_w, grid_h)  # here w goes first
        grid = np.stack(grid, axis=0)
        grid = grid.reshape([2, 1, grid_size, grid_size])

        def emb_1d(dim, pos):
            omega = np.arange(dim // 2, dtype=np.float64)
            omega /= dim / 2.0
            omega = 1.0 / 10000**omega
            out = np.einsum("m,d->md", pos.reshape(-1), omega)
            return np.concatenate([np.sin(out), np.cos(out)], axis=1)

        emb_h = emb_1d(embed_dim // 2, grid[0])  # upstream's (mis)naming
        emb_w = emb_1d(embed_dim // 2, grid[1])
        return np.concatenate([emb_h, emb_w], axis=1)

    got = sincos_pos_embed_2d(32, 8, 8)
    want = upstream(32, 8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # the two halves genuinely differ off the h==w diagonal (guards against
    # a swapped concat silently passing on symmetric inputs)
    assert not np.allclose(got[:, :16], got[:, 16:])
