"""DDIM and rectified-flow inversion as jit-compiled ``lax.scan`` loops.

Rebuild of inversion_tools/ddim_inversion.py:71-213 and
inversion_tools/flow_inversion.py:122-264. The reference's 50 Python-loop UNet
calls with per-step ``torch.save`` become one compiled scan producing the full
stacked trajectory ``[T+1, F, H, W, C]`` on device; persistence is a single
host write at the end (core/trajectory.py keeps the reference's on-disk
format).

The denoiser is passed in as a pure function
``denoise(latents, t, step_idx) -> (eps_or_velocity, captured_feature)`` so the
same scans serve SD, AnimateDiff (epsilon models) and SD3 (velocity model).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.scheduler import DDIMSchedule, EasyInvConfig, FlowMatchSchedule


def ddim_invert(
    denoise: Callable,
    latents0,
    schedule: DDIMSchedule,
    num_steps: int,
    easyinv: Optional[EasyInvConfig] = None,
    capture_timestep: Optional[int] = None,
):
    """x0 -> xT inversion, returning the full latent trajectory.

    Matches ddim_loop / ddim_loop_plus (ddim_inversion.py:88-167): step i uses
    timestep ``timesteps[N-1-i]`` (ascending 1..981); with EasyInv enabled the
    *post-prediction* latent is blended with the previous step's latent before
    the inverse update (epsilon is computed at the unblended latent).

    Returns:
      trajectory: ``[num_steps+1, *latents0.shape]`` (index 0 = input latents)
      captured: feature captured at ``capture_timestep`` (or zeros if the
        timestep never occurs / capture is disabled by the denoiser).
    """
    ts = jnp.asarray(schedule.timesteps(num_steps)[::-1].copy())  # ascending

    def step(carry, inputs):
        latent, last_latent, captured = carry
        i, t = inputs
        eps, feat = denoise(latent, t, i)
        if easyinv is not None and easyinv.enabled:
            gate = easyinv.blend_gate(i, num_steps)
            blended = easyinv.or_latent_idx * latent + (1.0 - easyinv.or_latent_idx) * last_latent
            latent = jnp.where(gate, blended, latent)
        new_last = latent
        latent = schedule.next_step(eps, t, latent, num_steps)
        if feat is not None and capture_timestep is not None:
            captured = jnp.where(t == capture_timestep, feat, captured)
        return (latent, new_last, captured), latent

    # probe the feature shape without running: denoiser must expose it via
    # eval_shape to keep the scan single-compile.
    feat_shape = jax.eval_shape(lambda l: denoise(l, ts[0], 0)[1], latents0)
    captured0 = (
        jnp.zeros(feat_shape.shape, feat_shape.dtype) if feat_shape is not None else None
    )
    steps = jnp.arange(num_steps)
    (latent_T, _, captured), traj = jax.lax.scan(
        step, (latents0, latents0, captured0), (steps, ts)
    )
    trajectory = jnp.concatenate([latents0[None], traj], axis=0)
    return trajectory, captured


def ddim_sample(
    denoise: Callable,
    latents_T,
    schedule: DDIMSchedule,
    num_steps: int,
    guidance_scale: float = 1.0,
):
    """xT -> x0 reconstruction sampling (reference ``reconstruction``,
    stable_diffusion.py:588-614). ``denoise`` handles CFG batching internally
    when guidance_scale > 1; the reference CLIs always run at 1.0."""
    ts = jnp.asarray(schedule.timesteps(num_steps).copy())  # descending

    def step(latent, inputs):
        i, t = inputs
        eps, _ = denoise(latent, t, i)
        latent = schedule.step(eps, t, latent, num_steps)
        return latent, None

    steps = jnp.arange(num_steps)
    latent0, _ = jax.lax.scan(step, latents_T, (steps, ts))
    return latent0


def rf_invert(
    denoise: Callable,
    image_latents,
    schedule: FlowMatchSchedule,
    num_steps: int,
    gamma: float = 0.0,
    noise_key: Optional[jax.Array] = None,
    capture_step: Optional[int] = None,
    mu: Optional[float] = None,
):
    """RF-Inversion: forward Euler along the flipped sigma schedule
    (flow_inversion.py:122-188). Velocity is interpolated toward a random
    target noise with weight gamma (0.0 in all reference runs).

    Returns (trajectory [N+1, ...], captured_feature).
    """
    sigmas = schedule.sigmas(num_steps, mu=mu)
    fwd = jnp.asarray(np.flip(sigmas).copy())  # ascending 0 -> sigma_max
    t_curr, t_prev = fwd[:-1], fwd[1:]
    if gamma > 0.0:
        if noise_key is None:
            raise ValueError("gamma > 0 requires a noise_key")
        target_noise = jax.random.normal(noise_key, image_latents.shape, image_latents.dtype)
    else:
        target_noise = jnp.zeros_like(image_latents)

    def step(carry, inputs):
        latent, captured = carry
        i, tc, tp = inputs
        v, feat = denoise(latent, tc * schedule.cfg.num_train_timesteps, i)
        v = v.astype(jnp.float32)
        if gamma > 0.0:
            tnv = (target_noise.astype(jnp.float32) - latent.astype(jnp.float32)) / (1.0 - tc)
            v = gamma * tnv + (1.0 - gamma) * v
        latent = (latent.astype(jnp.float32) + (tp - tc) * v).astype(latent.dtype)
        if feat is not None and capture_step is not None:
            captured = jnp.where(i == capture_step, feat, captured)
        return (latent, captured), latent

    feat_shape = jax.eval_shape(lambda l: denoise(l, fwd[0], 0)[1], image_latents)
    captured0 = (
        jnp.zeros(feat_shape.shape, feat_shape.dtype) if feat_shape is not None else None
    )
    steps = jnp.arange(len(t_curr))
    (_, captured), traj = jax.lax.scan(
        step, (image_latents, captured0), (steps, t_curr, t_prev)
    )
    trajectory = jnp.concatenate([image_latents[None], traj], axis=0)
    return trajectory, captured


def rf_solver_invert(
    denoise: Callable,
    image_latents,
    schedule: FlowMatchSchedule,
    num_steps: int,
    capture_step: Optional[int] = None,
    mu: Optional[float] = None,
):
    """RF-Solver inversion: 2nd-order midpoint along the flipped schedule
    (flow_inversion.py:191-264). Two denoiser calls per step; the feature
    capture only fires on the first call, like the reference (ft args are not
    forwarded to the midpoint call, flow_inversion.py:242-249)."""
    sigmas = schedule.sigmas(num_steps, mu=mu)
    fwd = jnp.asarray(np.flip(sigmas).copy())
    t_curr, t_prev = fwd[:-1], fwd[1:]
    scale = schedule.cfg.num_train_timesteps

    def step(carry, inputs):
        latent, captured = carry
        i, tc, tp = inputs
        v, feat = denoise(latent, tc * scale, i)
        dt = tp - tc
        x32 = latent.astype(jnp.float32)
        img_mid = (x32 + dt / 2.0 * v.astype(jnp.float32)).astype(latent.dtype)
        v_mid, _ = denoise(img_mid, (tc + dt / 2.0) * scale, i)
        latent = FlowMatchSchedule.rf_solver_step(v, v_mid, tc, tp, latent)
        if feat is not None and capture_step is not None:
            captured = jnp.where(i == capture_step, feat, captured)
        return (latent, captured), latent

    feat_shape = jax.eval_shape(lambda l: denoise(l, fwd[0], 0)[1], image_latents)
    captured0 = (
        jnp.zeros(feat_shape.shape, feat_shape.dtype) if feat_shape is not None else None
    )
    steps = jnp.arange(len(t_curr))
    (_, captured), traj = jax.lax.scan(
        step, (image_latents, captured0), (steps, t_curr, t_prev)
    )
    trajectory = jnp.concatenate([image_latents[None], traj], axis=0)
    return trajectory, captured


def rf_sample_controlled(
    denoise: Callable,
    inversed_latents,
    img_latents,
    schedule: FlowMatchSchedule,
    num_steps: int,
    eta_values,
    mu: Optional[float] = None,
):
    """Flow-matching reconstruction with controlled velocity
    (custom_pipeline.py:46-124): v <- v + eta_i * (v_target - v) where
    v_target = -(x_img - x_t) / t pulls toward the clean image latents."""
    sigmas = jnp.asarray(schedule.sigmas(num_steps, mu=mu))
    s_curr, s_next = sigmas[:-1], sigmas[1:]
    etas = jnp.asarray(eta_values, jnp.float32)
    target = img_latents.astype(jnp.float32)
    scale = schedule.cfg.num_train_timesteps

    def step(latent, inputs):
        i, sc, sn = inputs
        v, _ = denoise(latent, sc * scale, i)
        x32 = latent.astype(jnp.float32)
        v = v.astype(jnp.float32)
        v_target = -(target - x32) / sc
        v = v + etas[i] * (v_target - v)
        latent = (x32 + (sn - sc) * v).astype(latent.dtype)
        return latent, None

    steps = jnp.arange(num_steps)
    latent0, _ = jax.lax.scan(step, inversed_latents, (steps, s_curr, s_next))
    return latent0
