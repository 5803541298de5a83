"""Flow / warp / smoothing tests on synthetic translations."""

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.methods.flow import (
    compute_occlusion_mask,
    get_warp,
    lucas_kanade_flow,
    sliding_window_smooth,
    warp_image_with_flow,
)


def _smooth_image(h=64, w=64, seed=0):
    """Band-limited random image so LK gradients are informative."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((h // 8, w // 8, 3)).astype(np.float32)
    img = np.asarray(jax.image.resize(jnp.asarray(img), (h, w, 3), "bicubic"))
    return (img - img.min()) / (img.max() - img.min())


def test_warp_translation():
    img = jnp.asarray(_smooth_image())
    # constant flow (+3, 0): out(x,y) = img(x+3, y)
    flow = jnp.zeros((64, 64, 2)).at[..., 0].set(3.0)
    warped = np.asarray(warp_image_with_flow(img, flow))
    np.testing.assert_allclose(warped[:, :-3], np.asarray(img)[:, 3:], atol=1e-5)


def test_occlusion_mask_consistency():
    fwd = jnp.zeros((16, 16, 2)).at[..., 0].set(2.0)
    bwd = -fwd
    occ = np.asarray(compute_occlusion_mask(fwd, bwd))
    assert occ.sum() == 0  # perfectly consistent
    occ2 = np.asarray(compute_occlusion_mask(fwd, bwd * 0.0))
    assert occ2.mean() == 1.0  # inconsistent everywhere (|err| = 2 > 1.5)


def test_lucas_kanade_recovers_translation():
    img = _smooth_image()
    shift = 2
    img2 = np.roll(img, -shift, axis=1)  # img2(x) = img(x + shift)
    flow = np.asarray(lucas_kanade_flow(jnp.asarray(img), jnp.asarray(img2)))
    # interior flow should be ~(+shift, 0): img1(x) matches img2 at x - shift,
    # i.e. sampling img2 at x + dx reproduces img1 when dx = -shift... the
    # convention: warp(img2, flow) == img1 => img2(x + dx) = img1(x) =>
    # dx = -shift? img2(x - shift) = img(x) so dx = -shift.
    interior = flow[16:-16, 16:-16, 0]
    assert abs(interior.mean() - (-shift)) < 0.5, interior.mean()
    # and the warp closes the loop
    warped = np.asarray(warp_image_with_flow(jnp.asarray(img2), jnp.asarray(flow)))
    err = np.abs(warped[8:-8, 8:-8] - img[8:-8, 8:-8]).mean()
    assert err < 0.03, err


def test_get_warp_and_smoothing():
    img = _smooth_image()
    frames = np.stack([np.roll(img, -2 * i, axis=1) for i in range(4)])
    out = get_warp(lucas_kanade_flow, jnp.asarray(frames[0]), jnp.asarray(frames[1]))
    assert out.shape == frames[0].shape
    smoothed = np.asarray(sliding_window_smooth(jnp.asarray(frames), radius=1))
    assert smoothed.shape == frames.shape
    # smoothing a static video is (nearly) identity
    static = np.broadcast_to(img, frames.shape).copy()
    sm_static = np.asarray(sliding_window_smooth(jnp.asarray(static), radius=1))
    assert np.abs(sm_static - static).max() < 1e-3
    # mask keeps the original in the masked region
    mask = np.zeros((4, 64, 64), np.float32)
    mask[:, :32] = 1.0
    sm_masked = np.asarray(
        sliding_window_smooth(jnp.asarray(frames), radius=1, mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(sm_masked[:, :32], frames[:, :32], atol=1e-6)
