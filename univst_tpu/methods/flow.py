"""Optical flow, warping, occlusion masking, sliding-window smoothing.

Rebuild of src/cal_optica_flow.py:15-99 and the (reference-disabled)
sliding-window pixel smoother inside the stylization loop
(stable_diffusion.py:713-758). TPU-native substitutions:

  * ``cv2.remap`` bilinear warping -> ``jax.scipy.ndimage.map_coordinates``;
  * torchvision RAFT -> a pluggable ``flow_fn(img1, img2) -> flow``; the
    built-in estimator is a coarse-to-fine iterative Lucas-Kanade pyramid in
    pure jnp (no pretrained weights needed in this environment). A converted
    RAFT can be dropped in behind the same interface.
  * the per-frame numpy loops of the smoother (stable_diffusion.py:727-747)
    become vmapped window gathers.

All images are ``[H, W, C]`` fp32 in [0, 1] unless noted; flow is ``[H, W, 2]``
with (dx, dy) pixel offsets, matching the reference's convention
(cal_optica_flow.py:31-41: sampling position = grid + flow).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def warp_image_with_flow(image, flow):
    """Backward-warp: out(x, y) = image(x + dx, y + dy), bilinear, zeros
    outside (reference warp_image_with_flow, cal_optica_flow.py:31-41)."""
    h, w = image.shape[:2]
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = gx + flow[..., 0]
    sy = gy + flow[..., 1]
    coords = jnp.stack([sy.ravel(), sx.ravel()])

    def sample(channel):
        return jax.scipy.ndimage.map_coordinates(
            channel, coords, order=1, mode="constant", cval=0.0
        ).reshape(h, w)

    if image.ndim == 2:
        return sample(image)
    return jnp.stack([sample(image[..., c]) for c in range(image.shape[-1])], axis=-1)


def compute_occlusion_mask(forward_flow, backward_flow, threshold: float = 1.5):
    """Forward-backward consistency occlusion mask: 1 = occluded
    (reference compute_occlusion_mask, cal_optica_flow.py:20-29)."""
    # reference quirk kept as-is: the backward flow is read at the ORIGINAL
    # grid (not at the forward-warped positions), so the error is simply
    # ||fwd + bwd|| (cal_optica_flow.py:24-26)
    err = jnp.linalg.norm(forward_flow + backward_flow, axis=-1)
    return (err > threshold).astype(jnp.float32)


def apply_occlusion(warped, occlusion, original):
    """Occluded pixels fall back to the reference frame
    (reference apply_mask, cal_optica_flow.py:43-46)."""
    m = occlusion[..., None]
    return warped * (1.0 - m) + original * m


def get_warp(flow_fn: Callable, image1, image2, ref_image1=None, ref_image2=None,
             threshold: float = 1.5):
    """Bidirectional flow -> warp ref2 onto frame-1 geometry with occlusion
    fallback to ref1 (reference get_warp, cal_optica_flow.py:51-99)."""
    ref_image1 = image1 if ref_image1 is None else ref_image1
    ref_image2 = image2 if ref_image2 is None else ref_image2
    fwd = flow_fn(image1, image2)
    bwd = flow_fn(image2, image1)
    occ = compute_occlusion_mask(fwd, bwd, threshold)
    warped = warp_image_with_flow(ref_image2, fwd)
    return apply_occlusion(warped, occ, ref_image1)


# ---------------------------------------------------------------------------
# Built-in flow estimator: coarse-to-fine iterative Lucas-Kanade
# ---------------------------------------------------------------------------


def _to_gray(img):
    if img.ndim == 2:
        return img
    return img @ jnp.asarray([0.299, 0.587, 0.114], img.dtype)


def _downsample2(img):
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    return img[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))


def _upsample2(flow, shape):
    return jax.image.resize(flow, shape + (2,), "bilinear") * 2.0


def _lk_refine(i1, i2, flow, window: int = 7, iters: int = 3, eps: float = 1e-3):
    """Iterative Lucas-Kanade refinement at one pyramid level."""
    h, w = i1.shape
    # spatial gradients of i1
    gx = jnp.gradient(i1, axis=1)
    gy = jnp.gradient(i1, axis=0)
    k = jnp.ones((window, window), i1.dtype) / (window * window)

    def box(x):
        return jax.scipy.signal.convolve2d(x, k, mode="same")

    a11 = box(gx * gx) + eps
    a12 = box(gx * gy)
    a22 = box(gy * gy) + eps
    det = a11 * a22 - a12 * a12

    def body(_, flow):
        warped = warp_image_with_flow(i2, flow)
        it = warped - i1
        b1 = box(gx * it)
        b2 = box(gy * it)
        du = -(a22 * b1 - a12 * b2) / det
        dv = -(-a12 * b1 + a11 * b2) / det
        return flow + jnp.stack([du, dv], axis=-1)

    return jax.lax.fori_loop(0, iters, body, flow)


def lucas_kanade_flow(image1, image2, levels: int = 4, window: int = 7,
                      iters: int = 3):
    """Pyramidal LK flow ``[H, W, 2]`` between two [H, W, C] images."""
    i1 = _to_gray(image1.astype(jnp.float32))
    i2 = _to_gray(image2.astype(jnp.float32))
    pyr1, pyr2 = [i1], [i2]
    for _ in range(levels - 1):
        if min(pyr1[-1].shape) <= 32:
            break
        pyr1.append(_downsample2(pyr1[-1]))
        pyr2.append(_downsample2(pyr2[-1]))
    flow = jnp.zeros(pyr1[-1].shape + (2,), jnp.float32)
    for l1, l2 in zip(reversed(pyr1), reversed(pyr2)):
        if flow.shape[:2] != l1.shape:
            flow = _upsample2(flow, l1.shape)
        flow = _lk_refine(l1, l2, flow, window, iters)
    return flow


# ---------------------------------------------------------------------------
# Sliding-window consistent smoothing
# ---------------------------------------------------------------------------


def sliding_window_smooth(
    frames,
    flow_fn: Callable = lucas_kanade_flow,
    radius: int = 2,
    mask=None,
):
    """Sliding-window warp-and-average over frames
    (reference smoother, stable_diffusion.py:716-751).

    For each key frame, every frame within +/-radius is warped onto it via
    flow (with occlusion fallback to the key frame) and averaged. With a mask,
    the masked (object) region keeps the original frames
    (stable_diffusion.py:751: ori * mask + smoothed * (1 - mask)).

    Args: frames [F, H, W, C] in [0, 1]; mask [F, H, W] (1 = keep original).
    """
    f = frames.shape[0]
    out = []
    for key_index in range(f):
        acc = jnp.zeros_like(frames[0])
        weight = 0
        key = frames[key_index]
        for bias in range(-radius, radius + 1):
            now = key_index + bias
            if now < 0 or now >= f:
                continue
            if bias == 0:
                acc = acc + key
            else:
                acc = acc + get_warp(flow_fn, key, frames[now], key, frames[now])
            weight += 1
        out.append(acc / weight)
    smoothed = jnp.stack(out)
    if mask is not None:
        m = mask[..., None].astype(frames.dtype)
        smoothed = frames * m + smoothed * (1.0 - m)
    return smoothed
