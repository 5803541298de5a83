"""Round-2 perf restructuring: exactness tests.

Two exact algorithmic optimizations over the reference's 3x16-frame batch
(stable_diffusion.py:704-710):

  1. temporal-identity elision — temporal convs stay at their dirac init and
     temporal attention at its zero-init output projection (2D checkpoints
     carry no temporal weights, reference unet_3d_condition.py:493-509;
     nothing trains them), so both are exact no-ops.
  2. style-branch singleton — the style trajectory comes from inverting a
     single image repeated over frames (ddim_inversion.py:51), so all its
     frames are identical and the style branch runs as one frame whose PnP
     K/V are precomputed for all steps in one batched pre-pass.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.core.config import SD_BASE_FRAME_INDICES, StyleTransferConfig
from univst_tpu.models.layers import VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig
from univst_tpu.pipelines.sd import SDVideoPipeline


def _tiny_unet_io(f=4, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((f, hw, hw, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 77, 32)), jnp.float32)
    return x, ctx


def test_temporal_identity_elision_is_exact():
    """UNet with temporal layers elided == full UNet at init (dirac temporal
    convs, zero-init temporal attention out-proj)."""
    f = 4
    x, ctx = _tiny_unet_io(f)
    vctx = VideoCtx(num_frames=f, frame_indices=SD_BASE_FRAME_INDICES)
    outs = {}
    for ident in (False, True):
        cfg = UNetSDConfig.tiny(temporal_identity=ident)
        unet = UNetPseudo3D(cfg, dtype=jnp.float32)
        params = unet.init(jax.random.PRNGKey(0), x, jnp.asarray(0), ctx, vctx)["params"]
        outs[ident], _ = unet.apply({"params": params}, x, jnp.asarray(301), ctx, vctx)
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), rtol=1e-5, atol=1e-6
    )


def test_unpatched_layers_keep_default_indices():
    """Reference patches ONLY the 8 decoder attn1 layers with [-1,'first'];
    unpatched layers keep the model default [-1,0,'first'] during stylization
    (pnp_utils.py:104-111 vs models/attention.py:356). The pnp_frame_indices
    field must affect only PnP layers, and only while a StyleCtx is active."""
    from univst_tpu.core.config import SD_PNP_FRAME_INDICES, SD_STYLE_SHIFT
    from univst_tpu.models.layers import StyleCtx

    f = 4
    x, ctx = _tiny_unet_io(f)
    x2 = jnp.concatenate([x, x * 0.5, x * 0.2], axis=0)  # [3F] legacy batch
    ctx2 = jnp.concatenate([ctx, ctx, ctx], axis=0)
    cfg = UNetSDConfig.tiny(temporal_identity=True)
    unet = UNetPseudo3D(cfg, dtype=jnp.float32)
    mixed = VideoCtx(num_frames=f, frame_indices=SD_BASE_FRAME_INDICES,
                     pnp_frame_indices=SD_PNP_FRAME_INDICES)
    all_pnp = VideoCtx(num_frames=f, frame_indices=SD_PNP_FRAME_INDICES,
                       pnp_frame_indices=SD_PNP_FRAME_INDICES)
    params = unet.init(jax.random.PRNGKey(0), x2, jnp.asarray(0), ctx2, mixed)[
        "params"
    ]
    sctx = StyleCtx(step_idx=jnp.asarray(1), cfg=SD_STYLE_SHIFT)

    def run(vctx, sc):
        out, _ = unet.apply({"params": params}, x2, jnp.asarray(301), ctx2, vctx, sc)
        return np.asarray(out)

    # active StyleCtx: unpatched layers see 3 sources under `mixed` but only
    # 2 under `all_pnp` -> outputs differ
    assert np.abs(run(mixed, sctx) - run(all_pnp, sctx)).max() > 1e-6
    # no StyleCtx (inversion): pnp_frame_indices must be inert
    base_only = VideoCtx(num_frames=f, frame_indices=SD_BASE_FRAME_INDICES)
    np.testing.assert_array_equal(run(mixed, None), run(base_only, None))


def _stylize_setup(steps=6, f=4, size=64, dtype=jnp.float32):
    pipe = SDVideoPipeline.build(
        variant="tiny", num_frames=f, height=size, width=size, dtype=dtype
    )
    rng = np.random.default_rng(0)
    h8 = size // 8
    content = jnp.asarray(rng.standard_normal((steps + 1, f, h8, h8, 4)), jnp.float32)
    sty1 = rng.standard_normal((steps + 1, 1, h8, h8, 4)).astype(np.float32)
    style = jnp.asarray(np.tile(sty1, (1, f, 1, 1, 1)))  # identical frames
    init = jnp.asarray(rng.standard_normal((f, h8, h8, 4)), jnp.float32)
    mask = jnp.asarray((rng.random((f, size, size)) > 0.5).astype(np.float32))
    ctx3 = jnp.concatenate([pipe.encode_text("")] * 3, axis=0)
    return pipe, content, style, init, mask, ctx3


@pytest.mark.slow
def test_style_singleton_matches_3branch():
    """2-branch + injected style K/V == legacy 3-branch batch, given the
    (always true by construction) identical style frames."""
    pipe, content, style, init, mask, ctx3 = _stylize_setup()
    cfg = StyleTransferConfig(num_steps=6)
    out_new = pipe.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    legacy = dataclasses.replace(pipe, style_singleton=False)
    out_old = legacy.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_old), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_style_singleton_accepts_single_frame_trajectory():
    """The canonical on-device style trajectory is [N+1, 1, h, w, C]."""
    pipe, content, style, init, mask, ctx3 = _stylize_setup()
    cfg = StyleTransferConfig(num_steps=6)
    out_full = pipe.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    out_one = pipe.stylize_latents(
        content, style[:, :1], init, ctx3, mask=mask, cfg=cfg
    )
    np.testing.assert_allclose(np.asarray(out_one), np.asarray(out_full), atol=1e-6)


@pytest.mark.slow
def test_single_frame_style_inversion_matches_repeated():
    """Inverting 1 style frame == inverting the same frame repeated x F
    (per-frame slice of the trajectory): the basis for the 16x faster style
    inversion CLI. Cross-frame KV over identical frames reduces to plain
    attention by softmax duplicate-key invariance."""
    steps, f, size = 4, 4, 64
    pipe_f = SDVideoPipeline.build(
        variant="tiny", num_frames=f, height=size, width=size, dtype=jnp.float32
    )
    pipe_1 = SDVideoPipeline.build(
        variant="tiny", num_frames=1, height=size, width=size, dtype=jnp.float32
    )
    # same seed => identical weights (param init keys are path-derived)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.all(a == b)), pipe_f.unet_params, pipe_1.unet_params
        )
    )
    assert chex_equal, "param trees differ between frame counts"
    rng = np.random.default_rng(3)
    frame = rng.standard_normal((1, size // 8, size // 8, 4)).astype(np.float32)
    lat_f = jnp.asarray(np.tile(frame, (f, 1, 1, 1)))
    lat_1 = jnp.asarray(frame)
    ctx = pipe_f.encode_text("")
    traj_f, _ = pipe_f.invert(lat_f, ctx, num_steps=steps, is_opt=False)
    traj_1, _ = pipe_1.invert(lat_1, ctx, num_steps=steps, is_opt=False)
    np.testing.assert_allclose(
        np.asarray(traj_f[:, :1]), np.asarray(traj_1), rtol=2e-4, atol=2e-5
    )
    # and all frames of the repeated inversion are identical
    np.testing.assert_allclose(
        np.asarray(traj_f), np.asarray(jnp.broadcast_to(traj_1, traj_f.shape)),
        rtol=2e-4, atol=2e-5,
    )


@pytest.mark.slow
def test_cfg_reconstruction():
    """guidance_scale > 1 with uncond == cond is the identity (the reference's
    CFG at its drivers' guidance_scale=1.0 setting, ddim_inversion.py:40);
    a different uncond context changes the result."""
    pipe, content, style, init, mask, ctx3 = _stylize_setup()
    ctx = ctx3[:1]
    lat_T = content[-1]
    base = pipe.reconstruct_latents(lat_T, ctx, num_steps=4)
    same = pipe.reconstruct_latents(
        lat_T, ctx, num_steps=4, guidance_scale=7.5, uncond_context=ctx
    )
    np.testing.assert_allclose(np.asarray(same), np.asarray(base), rtol=1e-4, atol=1e-5)
    other = pipe.reconstruct_latents(
        lat_T, ctx, num_steps=4, guidance_scale=7.5, uncond_context=ctx * 0.5
    )
    assert np.abs(np.asarray(other) - np.asarray(base)).max() > 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("singleton", [True, False])
def test_phase_split_matches_full_loop(monkeypatch, singleton):
    """Dropping the content/style branches past the shift window
    (StyleShiftConfig.window_end) is exact: the gate is False there, so the
    patched attention falls back to the stylized branch's own q/k/v and the
    other epsilon chunks are discarded (stable_diffusion.py:712)."""
    from univst_tpu.core.config import SD_STYLE_SHIFT

    pipe, content, style, init, mask, ctx3 = _stylize_setup()
    pipe = dataclasses.replace(pipe, style_singleton=singleton)
    n = 6
    cfg = StyleTransferConfig(num_steps=n)
    # window over the test's n: gate fires for i <= 0.5*6 = 3 -> window_end 4
    scfg = dataclasses.replace(SD_STYLE_SHIFT, num_steps=n)
    assert scfg.window_end() == 4
    monkeypatch.setenv("UNIVST_EXEC_CHUNK", "2")  # force segmentation on CPU
    out_split = pipe.stylize_latents(
        content, style, init, ctx3, mask=mask, cfg=cfg, style_cfg=scfg
    )
    monkeypatch.setenv("UNIVST_DISABLE_PHASE_SPLIT", "1")
    out_full = pipe.stylize_latents(
        content, style, init, ctx3, mask=mask, cfg=cfg, style_cfg=scfg
    )
    np.testing.assert_allclose(
        np.asarray(out_split), np.asarray(out_full), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_style_singleton_bf16_close():
    """bf16 run of both paths stays within bf16 reduction noise."""
    pipe, content, style, init, mask, ctx3 = _stylize_setup(dtype=jnp.bfloat16)
    cfg = StyleTransferConfig(num_steps=6)
    out_new = pipe.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    legacy = dataclasses.replace(pipe, style_singleton=False)
    out_old = legacy.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    np.testing.assert_allclose(
        np.asarray(out_new), np.asarray(out_old), rtol=0.15, atol=0.05
    )


@pytest.mark.slow
def test_cli_singleton_guard_falls_back(tmp_path):
    """--style_inv_path pointing at a NON-style trajectory (distinct frames —
    here the content inversion itself) must not be silently sliced to frame 0:
    the CLI warns and runs the exact legacy 3-branch batch (VERDICT r2 #6)."""
    import os

    from univst_tpu.cli import run_video_style_transfer_sd as st
    from univst_tpu.core.trajectory import save_trajectory

    steps, f, size = 3, 2, 64
    rng = np.random.default_rng(0)
    content = rng.standard_normal((steps + 1, f, size // 8, size // 8, 4))
    inv = tmp_path / "ci" / "vid" / "inversion"
    save_trajectory(content.astype(np.float32), str(inv))
    argv = [
        "--variant", "tiny", "--num_frames", str(f), "--height", str(size),
        "--width", str(size), "--time_steps", str(steps), "--platform", "cpu",
        "--content_inv_path", str(inv), "--style_inv_path", str(inv),
        "--output_path", str(tmp_path / "st"),
    ]
    with pytest.warns(UserWarning, match="non-identical"):
        st.main(st.build_parser().parse_args(argv))
    frames = sorted(os.listdir(tmp_path / "st" / "sd" / "vid_vid"))
    assert len(frames) == f


@pytest.mark.slow
def test_ad_capture_inject_matches_3branch():
    """The AnimateDiff default path (per-step style K/V capture + 2-branch
    injection, _stylize_chunk_capture) == the reference's in-batch 3-branch
    form. Unlike the singleton this holds WITHOUT identical style frames —
    the branches couple only through the attention shift."""
    from univst_tpu.pipelines import sd as sdp
    from univst_tpu.pipelines.animatediff import build_animatediff
    from univst_tpu.pipelines.segments import phase_segments

    f, size, steps = 4, 64, 4
    pipe = build_animatediff(
        variant="tiny", num_frames=f, height=size, width=size, dtype=jnp.float32
    )
    rng = np.random.default_rng(7)
    h8 = size // 8
    content = jnp.asarray(rng.standard_normal((steps + 1, f, h8, h8, 4)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((steps + 1, f, h8, h8, 4)), jnp.float32)
    init = jnp.asarray(rng.standard_normal((f, h8, h8, 4)), jnp.float32)
    mask = jnp.asarray((rng.random((f, size, size)) > 0.5).astype(np.float32))
    ctx3 = jnp.concatenate([pipe.encode_text("")] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)

    out_new = np.asarray(
        pipe.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    )

    scfg = pipe.style_shift_cfg
    ts_np = pipe.schedule.timesteps(steps).copy()
    phase1, phase2 = phase_segments(steps, scfg.window_end(), pipe.exec_chunk_default)
    lat = init.astype(jnp.float32)
    steps_np = np.arange(steps)
    for s0, c in phase1:
        lat = sdp._stylize_chunk(
            pipe, pipe.unet_params, content[s0 : s0 + c], style[s0 : s0 + c],
            lat, steps_np[s0 : s0 + c], ts_np[s0 : s0 + c], ctx3, mask, cfg, scfg,
        )
    for s0, c in phase2:
        lat = sdp._stylize_chunk_solo(
            pipe, pipe.unet_params, content, style, lat, ts_np, s0, ctx3,
            mask, cfg, c, steps,
        )
    np.testing.assert_allclose(out_new, np.asarray(lat), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ad_prepass_matches_per_step_capture():
    """The batched style pre-pass (_stylize_chunk_prepass: one [chunk*F]-row
    capture forward per segment) == the per-step capture path
    (_stylize_chunk_capture). Motion-module PEs vary per frame, not per step,
    and every per-video op sees num_frames-row groups, so steps batch as
    extra videos exactly."""
    from univst_tpu.pipelines.animatediff import build_animatediff

    f, size, steps = 4, 64, 4
    pipe = build_animatediff(
        variant="tiny", num_frames=f, height=size, width=size, dtype=jnp.float32
    )
    rng = np.random.default_rng(11)
    h8 = size // 8
    content = jnp.asarray(rng.standard_normal((steps + 1, f, h8, h8, 4)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((steps + 1, f, h8, h8, 4)), jnp.float32)
    init = jnp.asarray(rng.standard_normal((f, h8, h8, 4)), jnp.float32)
    mask = jnp.asarray((rng.random((f, size, size)) > 0.5).astype(np.float32))
    ctx3 = jnp.concatenate([pipe.encode_text("")] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps)

    out_capture = np.asarray(
        pipe.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    )
    # chunk 3 over a 4-step window exercises both the full and the tail chunk
    pipe_pre = dataclasses.replace(pipe, style_prepass_chunk=3)
    out_prepass = np.asarray(
        pipe_pre.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    )
    np.testing.assert_allclose(out_prepass, out_capture, rtol=1e-5, atol=1e-5)
