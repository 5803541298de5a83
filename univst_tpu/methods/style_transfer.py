"""Three-branch AdaIN-guided localized style transfer as one compiled scan.

Rebuild of ``video_style_transfer`` (SD/AnimateDiff:
backbones/video_diffusion_sd/pipelines/stable_diffusion.py:630-766; SD3:
backbones/video_diffusion_sd3/pipelines/custom_pipeline.py:126-371).

TPU-first restructuring:
  * the content & style latent trajectories are stacked device arrays indexed
    inside the scan (the reference torch.load's two files and re-reads the mask
    PNGs from disk at every step, stable_diffusion.py:683-696);
  * the per-step mask resize happens once ahead of time;
  * the 3-branch batch [content | style | stylized] is one denoiser call whose
    attention applies the AdaIN shift via StyleCtx (attention/ops.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from univst_tpu.core.adain import latent_adain, latent_adain_sd3
from univst_tpu.core.config import StyleTransferConfig
from univst_tpu.core.scheduler import DDIMSchedule, FlowMatchSchedule


def _resize_mask(mask, h: int, w: int):
    """[F, H, W] {0,1} mask -> [F, h, w, 1] bilinear, matching the reference's
    F.interpolate(..., mode='bilinear', align_corners=False)
    (stable_diffusion.py:689-691)."""
    m = jax.image.resize(mask.astype(jnp.float32), (mask.shape[0], h, w), "bilinear")
    return m[..., None]


def style_transfer_ddim_steps(
    denoise3: Callable,
    content_chunk,
    style_chunk,
    latents,
    steps,
    ts,
    schedule: DDIMSchedule,
    cfg: StyleTransferConfig,
    mask=None,
    style_kv=None,
    solo: bool = False,
    capture: bool = False,
):
    """Run a contiguous segment of the stylization loop (steps/ts arrays of
    length K, trajectory chunks [K, F, h, w, C]).

    Exists so the host can split the 50-step loop into segments: the remote
    TPU tunnel enforces a ~2 min per-execution watchdog, and the full 3-branch
    50-step scan exceeds it. One compiled graph serves every segment (same
    shapes; the step indices are data).

    Three denoiser layouts:
      * ``style_kv=None``: legacy 3-branch — ``denoise3([3F], t, i)``; the
        style branch rides the batch (``style_chunk`` is [K, F, h, w, C]).
      * ``style_kv`` given (pytree with leading axis K): 2-branch —
        ``denoise3([2F], t, i, kv_t)`` with the style branch's per-step PnP
        K/V injected; ``style_chunk`` is [K, 1, h, w, C] (style frames are
        identical, see pipelines/sd.py style pre-pass) and is still consumed
        by the latent AdaIN re-anchor below.
      * ``solo=True``: stylized-only batch — ``denoise3([F], t, i)`` — for
        segments past the shift window (StyleShiftConfig.window_end), where
        the content/style forwards are dead compute; the trajectory chunks are
        still consumed by the latent blending/anchoring below.
      * ``capture=True``: 2-branch capture-and-inject —
        ``denoise3([2F], t, i, style_latents_t)`` runs the style-branch
        forward itself (capturing its PnP K/V) and injects it into the
        [content | stylized] batch. The exact decomposition of the legacy
        3-branch batch (branches only couple through the attention shift) for
        backbones whose style frames are NOT identical (AnimateDiff — motion-
        module positional encodings); also keeps shard boundaries branch-
        aligned under a frame-parallel mesh: a [3F] batch row axis cannot be
        evenly sharded into branch-aligned pieces on 2^k devices, so GSPMD
        all-gathers at every branch-chunking reshape (measured: 11 GB/step at
        512px/16f on 8 shards), while [F] and [2F] batches shard cleanly.
    """
    n = cfg.num_steps
    f, h, w, c = latents.shape
    m = None if mask is None else _resize_mask(mask, h, w).astype(latents.dtype)

    def step(latents, inputs):
        if style_kv is None:
            i, t, cnt_t, sty_t = inputs
        else:
            i, t, cnt_t, sty_t, kv_t = inputs
        cnt_t = cnt_t.astype(latents.dtype)
        sty_t = sty_t.astype(latents.dtype)
        fi = i.astype(jnp.float32)
        # localized latent blending, i <= 0.9 N (stable_diffusion.py:687-692)
        if m is not None:
            blended = (1.0 - m) * latents + m * cnt_t
            latents = jnp.where(fi <= cfg.blend_hi * n, blended, latents)
        # AdaIN re-anchor, 0.8 N < i <= 0.9 N (stable_diffusion.py:694-702)
        anchored = latent_adain(latents, sty_t)
        if m is not None:
            anchored = (1.0 - m) * anchored + m * cnt_t
        gate = jnp.logical_and(fi > cfg.adain_lo * n, fi <= cfg.adain_hi * n)
        latents = jnp.where(gate, anchored.astype(latents.dtype), latents)

        if solo:
            eps = denoise3(latents, t, i)
        elif capture:
            x2 = jnp.concatenate([cnt_t, latents], axis=0)
            eps = denoise3(x2, t, i, sty_t)[f:]
        elif style_kv is None:
            x3 = jnp.concatenate([cnt_t, sty_t, latents], axis=0)
            eps = denoise3(x3, t, i)[2 * f :]
        else:
            x2 = jnp.concatenate([cnt_t, latents], axis=0)
            eps = denoise3(x2, t, i, kv_t)[f:]
        latents = schedule.step(eps, t, latents, n)
        return latents, None

    xs = (steps, ts, content_chunk, style_chunk)
    if style_kv is not None:
        xs = xs + (style_kv,)
    out, _ = jax.lax.scan(step, latents, xs)
    return out


def style_transfer_ddim(
    denoise3: Callable,
    content_traj_rev,
    style_traj_rev,
    init_latents,
    schedule: DDIMSchedule,
    cfg: StyleTransferConfig,
    mask=None,
):
    """SD / AnimateDiff stylization loop.

    Args:
      denoise3: ``(latents3 [3F,...], t, step_idx) -> eps3`` — the 3-branch
        UNet call with StyleCtx applied inside.
      content_traj_rev / style_traj_rev: ``[N+1, F, h, w, C]`` trajectories
        ordered so index i holds latents at inversion step ``N - i`` (what
        denoising step i consumes; reference stable_diffusion.py:683-684).
      init_latents: ``[F, h, w, C]`` — latent_adain(content_T, style_T) from
        the runner (run_video_style_transfer_sd.py:55-57).
      mask: optional ``[F, H, W]`` binary object masks (propagated).
    Returns final ``[F, h, w, C]`` latents.
    """
    n = cfg.num_steps
    ts = jnp.asarray(schedule.timesteps(n).copy())
    steps = jnp.arange(n)
    return style_transfer_ddim_steps(
        denoise3, content_traj_rev[:n], style_traj_rev[:n], init_latents,
        steps, ts, schedule, cfg, mask=mask,
    )


def style_transfer_rf_steps(
    denoise3: Callable,
    content_chunk,
    style_chunk,
    latents,
    steps,
    s_curr,
    s_next,
    etas,
    img_latents,
    schedule: FlowMatchSchedule,
    cfg: StyleTransferConfig,
    mask=None,
    singleton: bool = False,
    solo: bool = False,
):
    """Segment of the SD3 stylization loop (see style_transfer_ddim_steps for
    why segments exist).

    ``singleton=True`` runs the 2-branch [content | stylized] batch with the
    style branch as a single frame: ``style_chunk`` is [K, 1, h, w, C] and the
    denoiser signature becomes ``denoise3(x2, t, i, style_latent)`` — it runs
    the single-frame style forward (capture) and injects the resulting K/V
    itself (pipelines/sd3.py). Exact for the same reason as the SD path:
    style-trajectory frames are identical.

    ``solo=True`` runs the stylized-only batch ``denoise3(x, t, i)`` for
    segments past the shift window (content/style forwards are dead compute
    there); the controlled-velocity pull and blending still apply."""
    n = cfg.num_steps
    f, h, w, c = latents.shape
    m = None if mask is None else _resize_mask(mask, h, w).astype(latents.dtype)
    target = img_latents.astype(jnp.float32)
    scale = schedule.cfg.num_train_timesteps

    def step(latents, inputs):
        i, sc, sn, eta, cnt_t, sty_t = inputs
        cnt_t = cnt_t.astype(latents.dtype)
        sty_t = sty_t.astype(latents.dtype)
        fi = i.astype(jnp.float32)
        if m is not None:
            blended = (1.0 - m) * latents + m * cnt_t
            latents = jnp.where(fi <= cfg.blend_hi * n, blended, latents)
        anchored = latent_adain_sd3(latents, sty_t)
        if m is not None:
            anchored = (1.0 - m) * anchored + m * cnt_t
        # SD3 window is inclusive on both ends (custom_pipeline.py:295)
        gate = jnp.logical_and(fi >= cfg.adain_lo * n, fi <= cfg.adain_hi * n)
        latents = jnp.where(gate, anchored.astype(latents.dtype), latents)

        if solo:
            v = denoise3(latents, sc * scale, i).astype(jnp.float32)
        elif singleton:
            x2 = jnp.concatenate([cnt_t, latents], axis=0)
            v = denoise3(x2, sc * scale, i, sty_t)[f:].astype(jnp.float32)
        else:
            x3 = jnp.concatenate([cnt_t, sty_t, latents], axis=0)
            v = denoise3(x3, sc * scale, i)[2 * f :].astype(jnp.float32)
        x32 = latents.astype(jnp.float32)
        v_target = -(target - x32) / sc
        v = v + eta * (v_target - v)
        latents = (x32 + (sn - sc) * v).astype(latents.dtype)
        return latents, None

    out, _ = jax.lax.scan(
        step, latents, (steps, s_curr, s_next, etas, content_chunk, style_chunk)
    )
    return out


def style_transfer_rf(
    denoise3: Callable,
    content_traj_rev,
    style_traj_rev,
    init_latents,
    img_latents,
    schedule: FlowMatchSchedule,
    cfg: StyleTransferConfig,
    eta_values,
    mask=None,
    mu: Optional[float] = None,
):
    """SD3 stylization loop with the controlled-velocity pull
    (custom_pipeline.py:279-334). The reference's AdaIN re-anchor line crashes
    on an undefined variable when a mask is given (``ddim_inv_latents_at_t``,
    custom_pipeline.py:303); we implement the evidently intended content-latent
    anchor, i.e. the SD semantics.
    """
    n = cfg.num_steps
    sigmas = jnp.asarray(schedule.sigmas(n, mu=mu))
    return style_transfer_rf_steps(
        denoise3, content_traj_rev[:n], style_traj_rev[:n], init_latents,
        jnp.arange(n), sigmas[:-1], sigmas[1:],
        jnp.asarray(eta_values, jnp.float32), img_latents, schedule, cfg,
        mask=mask,
    )
