"""DDIM and rectified-flow inversion as jit-compiled ``lax.scan`` loops.

Rebuild of inversion_tools/ddim_inversion.py:71-213 and
inversion_tools/flow_inversion.py:122-264. The reference's 50 Python-loop UNet
calls with per-step ``torch.save`` become compiled scans producing the full
stacked trajectory ``[T+1, F, H, W, C]`` on device; persistence is a single
host write at the end (core/trajectory.py keeps the reference's on-disk
format).

Every loop also exists in *segment* form (explicit steps/ts arrays + carry
in/out): the remote-TPU tunnel enforces a ~2 minute per-execution watchdog, so
pipelines drive long loops as a host-side sequence of identical-shape segments
sharing one compiled graph.

The denoiser is passed in as a pure function
``denoise(latents, t, step_idx) -> (eps_or_velocity, captured_feature)`` so the
same scans serve SD, AnimateDiff (epsilon models) and SD3 (velocity model).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.scheduler import DDIMSchedule, EasyInvConfig, FlowMatchSchedule


def _capture_init(denoise, latents0, t0):
    feat_shape = jax.eval_shape(lambda l: denoise(l, t0, 0)[1], latents0)
    if feat_shape is None:
        return None
    return jnp.zeros(feat_shape.shape, feat_shape.dtype)


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


def ddim_invert_segment(
    denoise: Callable,
    carry,
    steps,
    ts,
    schedule: DDIMSchedule,
    num_steps: int,
    easyinv: Optional[EasyInvConfig] = None,
    capture_timestep: Optional[int] = None,
):
    """Segment of the x0 -> xT inversion loop.

    carry = (latent, last_latent, captured|None); returns (carry, traj_chunk).
    Matches ddim_loop / ddim_loop_plus (ddim_inversion.py:88-167): epsilon is
    computed at the unblended latent; with EasyInv the latent is then blended
    with the previous step's latent before the inverse update.
    """

    def step(carry, inputs):
        latent, last_latent, captured = carry
        i, t = inputs
        eps, feat = denoise(latent, t, i)
        if easyinv is not None and easyinv.enabled:
            gate = easyinv.blend_gate(i, num_steps)
            blended = easyinv.or_latent_idx * latent + (1.0 - easyinv.or_latent_idx) * last_latent
            latent = jnp.where(gate, blended, latent)
            # fixed-point refinement of eps at the target point (statically
            # unrolled; the reference scaffold runs with num_fix_itr=0,
            # ddim_inversion.py:146-154)
            last_eps = eps
            for fix_itr in range(easyinv.num_fix_itr):
                probe_eps = eps if fix_itr == 0 else (eps + last_eps) / 2.0
                latents_tmp = schedule.next_step(probe_eps, t, latent, num_steps)
                last_eps = eps
                eps, _ = denoise(latents_tmp, t, i)
        new_last = latent
        latent = schedule.next_step(eps, t, latent, num_steps)
        if feat is not None and capture_timestep is not None:
            captured = jnp.where(t == capture_timestep, feat, captured)
        return (latent, new_last, captured), latent

    return jax.lax.scan(step, carry, (steps, ts))


def ddim_invert(
    denoise: Callable,
    latents0,
    schedule: DDIMSchedule,
    num_steps: int,
    easyinv: Optional[EasyInvConfig] = None,
    capture_timestep: Optional[int] = None,
):
    """Full inversion: returns (trajectory [N+1, ...], captured feature)."""
    ts = jnp.asarray(schedule.timesteps(num_steps)[::-1].copy())  # ascending
    captured0 = _capture_init(denoise, latents0, ts[0])
    carry = (latents0, latents0, captured0)
    steps = jnp.arange(num_steps)
    (latent_T, _, captured), traj = ddim_invert_segment(
        denoise, carry, steps, ts, schedule, num_steps, easyinv, capture_timestep
    )
    return jnp.concatenate([latents0[None], traj], axis=0), captured


def ddim_sample_segment(denoise: Callable, latent, steps, ts,
                        schedule: DDIMSchedule, num_steps: int):
    """Segment of xT -> x0 reconstruction (reference ``reconstruction``,
    stable_diffusion.py:588-614)."""

    def step(latent, inputs):
        i, t = inputs
        eps, _ = denoise(latent, t, i)
        return schedule.step(eps, t, latent, num_steps), None

    out, _ = jax.lax.scan(step, latent, (steps, ts))
    return out


def ddim_sample(denoise: Callable, latents_T, schedule: DDIMSchedule, num_steps: int):
    """xT -> x0 reconstruction. Classifier-free guidance lives in the
    pipeline's denoise closure (SDVideoPipeline.reconstruct_latents wraps the
    UNet with the uncond/cond split when guidance_scale > 1, mirroring
    reference stable_diffusion.py:560-614)."""
    ts = jnp.asarray(schedule.timesteps(num_steps).copy())  # descending
    return ddim_sample_segment(denoise, latents_T, jnp.arange(num_steps), ts,
                               schedule, num_steps)


# ---------------------------------------------------------------------------
# Rectified flow (SD3)
# ---------------------------------------------------------------------------


def rf_invert_segment(
    denoise: Callable,
    carry,
    steps,
    t_curr,
    t_prev,
    train_scale: float,
    gamma: float = 0.0,
    target_noise=None,
    capture_step: Optional[int] = None,
):
    """Segment of RF-Inversion: forward Euler along the flipped sigma schedule
    (flow_inversion.py:122-188); velocity interpolated toward a target noise
    with weight gamma (0.0 in all reference runs)."""

    def step(carry, inputs):
        latent, captured = carry
        i, tc, tp = inputs
        v, feat = denoise(latent, tc * train_scale, i)
        v = v.astype(jnp.float32)
        if gamma > 0.0:
            tnv = (target_noise.astype(jnp.float32) - latent.astype(jnp.float32)) / (1.0 - tc)
            v = gamma * tnv + (1.0 - gamma) * v
        latent = (latent.astype(jnp.float32) + (tp - tc) * v).astype(latent.dtype)
        if feat is not None and capture_step is not None:
            captured = jnp.where(i == capture_step, feat, captured)
        return (latent, captured), latent

    return jax.lax.scan(step, carry, (steps, t_curr, t_prev))


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
    sigmas = schedule.sigmas(num_steps, mu=mu)
    fwd = jnp.asarray(np.flip(sigmas).copy())  # ascending 0 -> sigma_max
    t_curr, t_prev = fwd[:-1], fwd[1:]
    if gamma > 0.0:
        if noise_key is None:
            raise ValueError("gamma > 0 requires a noise_key")
        target_noise = jax.random.normal(noise_key, image_latents.shape, image_latents.dtype)
    else:
        target_noise = None
    captured0 = _capture_init(denoise, image_latents, fwd[0])
    steps = jnp.arange(len(t_curr))
    (_, captured), traj = rf_invert_segment(
        denoise, (image_latents, captured0), steps, t_curr, t_prev,
        schedule.cfg.num_train_timesteps, gamma, target_noise, capture_step,
    )
    return jnp.concatenate([image_latents[None], traj], axis=0), captured


def rf_solver_segment(
    denoise: Callable,
    carry,
    steps,
    t_curr,
    t_prev,
    train_scale: float,
    capture_step: Optional[int] = None,
):
    """Segment of RF-Solver inversion: 2nd-order midpoint
    (flow_inversion.py:191-264). Two denoiser calls per step; feature capture
    only fires on the first call, like the reference (ft args not forwarded to
    the midpoint call, flow_inversion.py:242-249)."""

    def step(carry, inputs):
        latent, captured = carry
        i, tc, tp = inputs
        v, feat = denoise(latent, tc * train_scale, i)
        dt = tp - tc
        x32 = latent.astype(jnp.float32)
        img_mid = (x32 + dt / 2.0 * v.astype(jnp.float32)).astype(latent.dtype)
        v_mid, _ = denoise(img_mid, (tc + dt / 2.0) * train_scale, i)
        latent = FlowMatchSchedule.rf_solver_step(v, v_mid, tc, tp, latent)
        if feat is not None and capture_step is not None:
            captured = jnp.where(i == capture_step, feat, captured)
        return (latent, captured), latent

    return jax.lax.scan(step, carry, (steps, t_curr, t_prev))


def rf_solver_invert(
    denoise: Callable,
    image_latents,
    schedule: FlowMatchSchedule,
    num_steps: int,
    capture_step: Optional[int] = None,
    mu: Optional[float] = None,
):
    sigmas = schedule.sigmas(num_steps, mu=mu)
    fwd = jnp.asarray(np.flip(sigmas).copy())
    t_curr, t_prev = fwd[:-1], fwd[1:]
    captured0 = _capture_init(denoise, image_latents, fwd[0])
    steps = jnp.arange(len(t_curr))
    (_, captured), traj = rf_solver_segment(
        denoise, (image_latents, captured0), steps, t_curr, t_prev,
        schedule.cfg.num_train_timesteps, capture_step,
    )
    return jnp.concatenate([image_latents[None], traj], axis=0), captured


def rf_sample_segment(
    denoise: Callable,
    latent,
    steps,
    s_curr,
    s_next,
    etas,
    img_latents,
    train_scale: float,
):
    """Segment of flow-matching reconstruction with controlled velocity
    (custom_pipeline.py:46-124): v <- v + eta_i * (v_target - v), where
    v_target = -(x_img - x_t) / t pulls toward the clean image latents."""
    target = img_latents.astype(jnp.float32)

    def step(latent, inputs):
        i, sc, sn, eta = inputs
        v, _ = denoise(latent, sc * train_scale, i)
        x32 = latent.astype(jnp.float32)
        v = v.astype(jnp.float32)
        v_target = -(target - x32) / sc
        v = v + eta * (v_target - v)
        return (x32 + (sn - sc) * v).astype(latent.dtype), None

    out, _ = jax.lax.scan(step, latent, (steps, s_curr, s_next, etas))
    return out


def rf_sample_controlled(
    denoise: Callable,
    inversed_latents,
    img_latents,
    schedule: FlowMatchSchedule,
    num_steps: int,
    eta_values,
    mu: Optional[float] = None,
):
    sigmas = jnp.asarray(schedule.sigmas(num_steps, mu=mu))
    return rf_sample_segment(
        denoise, inversed_latents, jnp.arange(num_steps), sigmas[:-1], sigmas[1:],
        jnp.asarray(eta_values, jnp.float32), img_latents,
        schedule.cfg.num_train_timesteps,
    )
