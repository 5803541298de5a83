"""Style-transfer scan tests: parity with a step-by-step python loop that
encodes the reference pipeline semantics (stable_diffusion.py:681-761)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.adain import latent_adain
from univst_tpu.core.config import StyleTransferConfig
from univst_tpu.core.scheduler import DDIMSchedule
from univst_tpu.methods.style_transfer import _resize_mask, style_transfer_ddim

N = 10
F, H, W, C = 2, 4, 4, 2


def _denoise3(x3, t, i):
    # deterministic pseudo-denoiser mixing the three branches
    f = F
    cnt, sty, stz = x3[:f], x3[f : 2 * f], x3[2 * f :]
    eps = 0.05 * stz + 0.01 * cnt - 0.01 * sty
    return jnp.concatenate([cnt * 0, sty * 0, eps], axis=0)


def _python_reference(content_rev, style_rev, init, sched, cfg, mask):
    lat = init
    m = None
    if mask is not None:
        m = np.asarray(_resize_mask(jnp.asarray(mask), H, W))
    ts = sched.timesteps(cfg.num_steps)
    for i in range(cfg.num_steps):
        cnt_t, sty_t = content_rev[i], style_rev[i]
        if m is not None and i <= cfg.blend_hi * cfg.num_steps:
            lat = (1 - m) * lat + m * cnt_t
        if cfg.adain_lo * cfg.num_steps < i <= cfg.adain_hi * cfg.num_steps:
            anchored = np.asarray(latent_adain(jnp.asarray(lat), jnp.asarray(sty_t)))
            mm = m if m is not None else 0.0
            lat = (1 - mm) * anchored + mm * cnt_t
        x3 = jnp.concatenate(
            [jnp.asarray(cnt_t), jnp.asarray(sty_t), jnp.asarray(lat)], axis=0
        )
        eps = np.asarray(_denoise3(x3, ts[i], i))[2 * F :]
        lat = np.asarray(
            sched.step(jnp.asarray(eps), int(ts[i]), jnp.asarray(lat), cfg.num_steps)
        )
    return lat


def test_scan_matches_python_loop_no_mask():
    rng = np.random.default_rng(0)
    sched = DDIMSchedule()
    cfg = StyleTransferConfig(num_steps=N)
    content = rng.standard_normal((N + 1, F, H, W, C)).astype(np.float32)
    style = rng.standard_normal((N + 1, F, H, W, C)).astype(np.float32)
    init = rng.standard_normal((F, H, W, C)).astype(np.float32)
    got = style_transfer_ddim(
        _denoise3, jnp.asarray(content), jnp.asarray(style), jnp.asarray(init),
        sched, cfg,
    )
    want = _python_reference(content, style, init, sched, cfg, None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_scan_matches_python_loop_with_mask():
    rng = np.random.default_rng(1)
    sched = DDIMSchedule()
    cfg = StyleTransferConfig(num_steps=N)
    content = rng.standard_normal((N + 1, F, H, W, C)).astype(np.float32)
    style = rng.standard_normal((N + 1, F, H, W, C)).astype(np.float32)
    init = rng.standard_normal((F, H, W, C)).astype(np.float32)
    mask = (rng.random((F, 8, 8)) > 0.5).astype(np.float32)
    got = style_transfer_ddim(
        _denoise3, jnp.asarray(content), jnp.asarray(style), jnp.asarray(init),
        sched, cfg, mask=jnp.asarray(mask),
    )
    want = _python_reference(content, style, init, sched, cfg, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_masked_region_tracks_content_trajectory():
    """Inside the object mask the latents follow the content trajectory during
    blending — the 'localized' in localized style transfer."""
    rng = np.random.default_rng(2)
    sched = DDIMSchedule()
    cfg = StyleTransferConfig(num_steps=N)
    content = rng.standard_normal((N + 1, F, H, W, C)).astype(np.float32)
    style = rng.standard_normal((N + 1, F, H, W, C)).astype(np.float32)
    init = rng.standard_normal((F, H, W, C)).astype(np.float32)
    full_mask = np.ones((F, H, W), np.float32)

    got = style_transfer_ddim(
        _denoise3, jnp.asarray(content), jnp.asarray(style), jnp.asarray(init),
        sched, cfg, mask=jnp.asarray(full_mask),
    )
    # with a full mask, every blend step resets latents to the content
    # trajectory; the final output = one DDIM step from the last blend
    want = _python_reference(content, style, init, sched, cfg, full_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_smoother_path_runs():
    """cfg.smoother='pixel' exercises the decode -> flow smooth -> re-encode
    path (reference ships it disabled; we make it functional)."""
    import jax
    from univst_tpu.pipelines.sd import SDVideoPipeline

    pipe = SDVideoPipeline.build(variant="tiny", num_frames=4, height=64, width=64)
    rng = np.random.default_rng(0)
    steps = 4
    content = jnp.asarray(rng.standard_normal((steps + 1, 4, 32, 32, 4)), jnp.float32)
    style = jnp.asarray(rng.standard_normal((steps + 1, 4, 32, 32, 4)), jnp.float32)
    init = content[0]
    ctx = pipe.encode_text("")
    ctx3 = jnp.concatenate([ctx] * 3, axis=0)
    cfg = StyleTransferConfig(num_steps=steps, smoother="pixel", smoother_steps=(1, 3),
                              smoother_radius=1)
    mask = jnp.asarray((rng.random((4, 64, 64)) > 0.5).astype(np.float32))
    out = pipe.stylize_latents(content, style, init, ctx3, mask=mask, cfg=cfg)
    assert out.shape == (4, 32, 32, 4)
    assert not np.isnan(np.asarray(out)).any()
    # and differs from the unsmoothed run
    out_plain = pipe.stylize_latents(
        content, style, init, ctx3, mask=mask, cfg=StyleTransferConfig(num_steps=steps)
    )
    assert np.abs(np.asarray(out) - np.asarray(out_plain)).max() > 1e-6
