"""Diffusion schedulers as pure fp32 functions over precomputed tables.

TPU-native rebuild of the scheduler surface UniVST uses:

  * DDIM sampling step + the *inverse* DDIM update used for inversion
    (reference: inversion_tools/ddim_inversion.py:190-204 ``next_step`` and the
    diffusers DDIMScheduler.step it samples with).
  * EasyInv latent blending constants (reference: ddim_inversion.py:129-133).
  * FlowMatchEuler sigma schedule with static / dynamic (mu) shifting and the
    controlled-velocity eta schedules (reference:
    backbones/video_diffusion_sd3/pipelines/custom_pipeline.py:18-44,374-385).

Everything here is functional and trace-safe: schedules are precomputed numpy /
jnp tables; per-step updates are pure functions of (eps_or_velocity, t, x) that
can live inside ``lax.scan``. All schedule math is fp32 regardless of model
compute dtype (the reference upcasts similarly for SD3,
custom_pipeline.py:105-107).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    """Matches the diffusers DDIMScheduler config SD-1.5 / SD-2.1 / AnimateDiff use.

    Reference config source: the HF `scheduler/scheduler_config.json` of
    stable-diffusion-v1-5 plus the AnimateDiff overrides
    (backbones/animatediff/animatediff-v2.yaml:16-20).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"


def _make_betas(cfg: DDIMConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64)
    raise ValueError(f"unsupported beta_schedule: {cfg.beta_schedule}")


class DDIMSchedule:
    """Precomputed alpha-bar table + pure step functions.

    The table lives as a jnp fp32 array so traced integer timesteps can gather
    from it inside jit/scan.
    """

    def __init__(self, cfg: DDIMConfig = DDIMConfig()):
        self.cfg = cfg
        betas = _make_betas(cfg)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)
        self.final_alpha_cumprod = jnp.float32(
            1.0 if cfg.set_alpha_to_one else alphas_cumprod[0]
        )

    # -- schedule -----------------------------------------------------------

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending integer timesteps, 'leading' spacing with steps_offset.

        e.g. 50 steps -> [981, 961, ..., 21, 1] for the SD config.
        """
        cfg = self.cfg
        if cfg.timestep_spacing != "leading":
            raise NotImplementedError(cfg.timestep_spacing)
        step_ratio = cfg.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        return ts + cfg.steps_offset

    def _alpha_at(self, t):
        """alpha_bar(t) with t possibly negative -> final_alpha_cumprod."""
        t = jnp.asarray(t)
        safe_t = jnp.clip(t, 0, self.cfg.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)

    # -- steps ---------------------------------------------------------------

    def step(self, eps, t, sample, num_inference_steps: int):
        """Deterministic DDIM sampling step x_t -> x_{t-Delta} (eta=0).

        Matches diffusers DDIMScheduler.step with epsilon prediction and
        clip_sample=False, as driven by the reference pipelines
        (e.g. backbones/video_diffusion_sd/pipelines/stable_diffusion.py:761).
        """
        step_ratio = self.cfg.num_train_timesteps // num_inference_steps
        prev_t = t - step_ratio
        alpha_t = self._alpha_at(t)
        alpha_prev = self._alpha_at(prev_t)
        x = sample.astype(jnp.float32)
        e = eps.astype(jnp.float32)
        pred_x0 = (x - jnp.sqrt(1.0 - alpha_t) * e) / jnp.sqrt(alpha_t)
        prev = jnp.sqrt(alpha_prev) * pred_x0 + jnp.sqrt(1.0 - alpha_prev) * e
        return prev.astype(sample.dtype)

    def pred_original(self, eps, t, sample):
        """x0 estimate from (x_t, eps) — the smoother's entry point
        (reference: stable_diffusion.py:718)."""
        alpha_t = self._alpha_at(t)
        x = sample.astype(jnp.float32)
        e = eps.astype(jnp.float32)
        return ((x - jnp.sqrt(1.0 - alpha_t) * e) / jnp.sqrt(alpha_t)).astype(sample.dtype)

    def return_to_timestep(self, t, sample, sample_stabilized):
        """eps that maps a stabilized x0 back onto x_t
        (reference: stable_diffusion.py:782-791)."""
        alpha_t = self._alpha_at(t)
        x = sample.astype(jnp.float32)
        x0 = sample_stabilized.astype(jnp.float32)
        return ((x - jnp.sqrt(alpha_t) * x0) / jnp.sqrt(1.0 - alpha_t)).astype(sample.dtype)

    def next_step(self, eps, t, sample, num_inference_steps: int):
        """Inverse DDIM update x_{t-Delta} -> x_t used during inversion.

        Re-derivation of the reference's ``next_step``
        (inversion_tools/ddim_inversion.py:190-204): the 'current' point sits at
        timestep t-Delta (clamped to <=999, negative -> final_alpha_cumprod) and
        is pushed *up* the noise schedule to timestep t.
        """
        step_ratio = self.cfg.num_train_timesteps // num_inference_steps
        t_cur = jnp.minimum(t - step_ratio, self.cfg.num_train_timesteps - 1)
        alpha_cur = self._alpha_at(t_cur)
        alpha_next = self._alpha_at(t)
        x = sample.astype(jnp.float32)
        e = eps.astype(jnp.float32)
        pred_x0 = (x - jnp.sqrt(1.0 - alpha_cur) * e) / jnp.sqrt(alpha_cur)
        nxt = jnp.sqrt(alpha_next) * pred_x0 + jnp.sqrt(1.0 - alpha_next) * e
        return nxt.astype(sample.dtype)


@dataclasses.dataclass(frozen=True)
class EasyInvConfig:
    """EasyInv latent-blending constants (reference: ddim_inversion.py:129-133).

    During inversion steps i with inject_steps*N < i < (inject_steps+inject_len)*N
    (and i > 0), the current latent is blended with the previous one:
    ``latent = or_latent_idx * latent + (1 - or_latent_idx) * last_latent``.
    """

    enabled: bool = True
    or_latent_idx: float = 0.5
    inject_steps: float = 0.05
    inject_len: float = 0.2
    num_fix_itr: int = 0  # fixed-point iterations; 0 in the reference runs

    def blend_gate(self, i, num_inference_steps: int):
        """Traced boolean: does step i apply the EasyInv blend?"""
        lo = self.inject_steps * num_inference_steps
        hi = (self.inject_steps + self.inject_len) * num_inference_steps
        i = jnp.asarray(i, jnp.float32)
        return jnp.logical_and(jnp.logical_and(i > lo, i < hi), i > 0)


# ---------------------------------------------------------------------------
# Flow matching (SD3 / SD3.5)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FlowMatchConfig:
    """Matches diffusers FlowMatchEulerDiscreteScheduler config for SD3/SD3.5."""

    num_train_timesteps: int = 1000
    shift: float = 3.0
    use_dynamic_shifting: bool = False
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Dynamic mu for resolution-dependent sigma shifting
    (reference: custom_pipeline.py:374-385)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


class FlowMatchSchedule:
    """Sigma schedule + Euler / midpoint step functions for rectified flow."""

    def __init__(self, cfg: FlowMatchConfig = FlowMatchConfig()):
        self.cfg = cfg

    def sigmas(self, num_inference_steps: int, mu: Optional[float] = None) -> np.ndarray:
        """Descending sigmas [s_0 ... s_{N-1}, 0], s_0 = sigma_max.

        Mirrors FlowMatchEulerDiscreteScheduler.set_timesteps: linspace over
        train timesteps -> normalize -> (dynamic|static) shift -> append 0.
        """
        cfg = self.cfg
        ts = np.linspace(1, cfg.num_train_timesteps, num_inference_steps, dtype=np.float64)[::-1]
        s = ts / cfg.num_train_timesteps
        if cfg.use_dynamic_shifting:
            if mu is None:
                raise ValueError("dynamic shifting requires mu")
            s = np.exp(mu) / (np.exp(mu) + (1.0 / s - 1.0))
        else:
            s = cfg.shift * s / (1.0 + (cfg.shift - 1.0) * s)
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def timesteps(self, num_inference_steps: int, mu: Optional[float] = None) -> np.ndarray:
        """Descending model-facing timesteps = sigma * num_train_timesteps."""
        return self.sigmas(num_inference_steps, mu)[:-1] * self.cfg.num_train_timesteps

    @staticmethod
    def euler_step(velocity, sigma, sigma_next, sample):
        """x_{next} = x + (sigma_next - sigma) * v — both directions.

        Denoising uses descending sigmas; RF inversion integrates along the
        *flipped* (ascending) schedule (reference: flow_inversion.py:144-177).
        """
        x = sample.astype(jnp.float32)
        v = velocity.astype(jnp.float32)
        out = x + (sigma_next - sigma) * v
        return out.astype(sample.dtype)

    @staticmethod
    def rf_solver_step(velocity, velocity_mid, sigma, sigma_next, sample):
        """Second-order midpoint update (reference: flow_inversion.py:239-253).

        x += dt*v + 0.5*dt^2 * (v_mid - v) / (dt/2)
        """
        dt = sigma_next - sigma
        x = sample.astype(jnp.float32)
        v = velocity.astype(jnp.float32)
        vm = velocity_mid.astype(jnp.float32)
        first_order = (vm - v) / (dt / 2.0)
        out = x + dt * v + 0.5 * dt * dt * first_order
        return out.astype(sample.dtype)


def scale_eta_window(start_step: int, end_step: int, num_steps: int,
                     base_steps: int = 50):
    """Scale the reference's 50-step eta window constants (25/39,
    flow_inversion.py:61-64) to other step counts, keeping a nonempty window."""
    if num_steps == base_steps:
        return start_step, end_step
    s = int(round(start_step * num_steps / base_steps))
    e = int(round(end_step * num_steps / base_steps))
    s = max(0, min(s, num_steps - 1))
    e = max(s + 1, min(e, num_steps))
    return s, e


def generate_eta_values(
    timesteps: Sequence[float],
    start_step: int,
    end_step: int,
    eta: float,
    eta_trend: str = "constant",
) -> np.ndarray:
    """Controlled-velocity eta schedule (reference: custom_pipeline.py:18-44).

    timesteps are monotonically decreasing; eta is nonzero on [start, end).
    """
    n = len(timesteps)
    if not (0 <= start_step < end_step <= n):
        raise ValueError(f"invalid eta window [{start_step}, {end_step}) for {n} steps")
    ts = np.asarray(timesteps, dtype=np.float64)
    etas = np.zeros(n, dtype=np.float32)
    if eta_trend == "constant":
        etas[start_step:end_step] = eta
    elif eta_trend == "linear_increase":
        total = ts[start_step] - ts[end_step - 1]
        for i in range(start_step, end_step):
            etas[i] = eta * (ts[start_step] - ts[i]) / total
    elif eta_trend == "linear_decrease":
        total = ts[start_step] - ts[end_step - 1]
        for i in range(start_step, end_step):
            etas[i] = eta * (ts[i] - ts[end_step - 1]) / total
    else:
        raise NotImplementedError(f"unsupported eta_trend: {eta_trend}")
    return etas
