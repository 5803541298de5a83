"""Typed configuration for the UniVST method surface.

The reference hardcodes its method hyper-parameters inside monkey-patched
attention forwards (video_diffusion_sd/pnp_utils.py:47-57,
animatediff/pnp_utils.py:45-55, video_diffusion_sd3/pnp_utils.py:181-194) and
pipeline bodies (stable_diffusion.py:687-716). Here they are one typed config,
threaded through the model as explicit function arguments — the TPU-native
replacement for ``register_spatial_attention_pnp`` + ``register_time``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax.numpy as jnp

# A cross-frame attention index: 'first' | 'last' | 'mid' or a relative int
# offset clipped to [0, F-1] (reference: video_diffusion_sd/models/attention.py:388-410).
FrameIndex = Union[str, int]


@dataclasses.dataclass(frozen=True)
class StyleShiftConfig:
    """AdaIN-guided attention shift constants for one backbone.

    The stylized branch (chunk 2 of 3) gets:
      q <- gamma * (alpha * q_content + (1 - alpha) * q_stylized)
      k <- beta * adain(k_stylized, k_style) + (1 - beta) * k_style   (same for v)
    inside a step-index window, with beta linear from beta_max to beta_min.

    ``window_mode`` captures per-backbone comparison quirks replicated from the
    reference:
      * 'sd'  : idx >= eta1 (UNSCALED) and idx <= eta2*N   (sd pnp_utils.py:47)
      * 'ad'  : idx >= eta1*N and idx <  eta2*N            (ad pnp_utils.py:45)
      * 'sd3' : idx >= eta1*N and idx <= eta2*N            (sd3 pnp_utils.py:183)
    The sd3 reference beta formula crashes on a nonexistent ``self.thresh2``
    (sd3 pnp_utils.py:186); we implement the evidently intended eta2 form.

    ``num_steps`` stays at the preset 50 even when the CLIs run a different
    ``--time_steps``: all three reference backbones hardcode the literal
    ``* 50`` in their window/beta formulas (sd pnp_utils.py:47-50,
    ad pnp_utils.py:45-48, sd3 pnp_utils.py:183-186) regardless of their
    user-settable step count — scaling it here would *break* parity. The
    phase-split optimization reads window_end() off the same constants, so
    at non-50 step counts it simply stays conservative (no dead-branch cut
    past a window that never closes), which is exact.
    """

    alpha: float
    gamma: float
    eta1: float = 0.0
    eta2: float = 0.5
    beta_max: float = 0.9
    beta_min: float = 0.1
    num_steps: int = 50
    window_mode: str = "sd"

    def _bounds(self):
        """(lo, hi, hi_inclusive) of the step window in float step units."""
        n = float(self.num_steps)
        if self.window_mode == "sd":
            return self.eta1, self.eta2 * n, True
        if self.window_mode == "ad":
            return self.eta1 * n, self.eta2 * n, False
        if self.window_mode == "sd3":
            return self.eta1 * n, self.eta2 * n, True
        raise ValueError(self.window_mode)

    def window_gate(self, step_idx):
        """Traced bool: does the shift apply at this denoising step index?"""
        i = jnp.asarray(step_idx, jnp.float32)
        lo, hi, inclusive = self._bounds()
        hi_ok = i <= hi if inclusive else i < hi
        return jnp.logical_and(i >= lo, hi_ok)

    def beta(self, step_idx):
        """Traced KV-blend weight: linear beta_max -> beta_min over the window
        (reference formula, e.g. sd pnp_utils.py:50)."""
        i = jnp.asarray(step_idx, jnp.float32)
        n = float(self.num_steps)
        slope = (self.beta_max - self.beta_min) / (self.eta1 * n - self.eta2 * n)
        return slope * (i - self.eta2 * n) + self.beta_min

    def window_end(self) -> int:
        """First step index from which the shift can never fire again (static).

        Past this step the content branch's UNet forward is dead compute — the
        stylized branch falls back to its own q/k/v (attention/ops.py
        ``jnp.where(gate, ..., q_sty)``) and the content/style epsilon
        predictions are discarded (reference keeps only the third chunk,
        stable_diffusion.py:712) — so the pipelines drop to a stylized-only
        batch for steps >= window_end().

        Pure host arithmetic — a previous version evaluated the traced
        ``window_gate`` per step, which eagerly dispatched ~3 device ops per
        iteration (2.3 s per stylize call through the remote-TPU tunnel).
        """
        lo, hi, inclusive = self._bounds()
        last = -1
        for i in range(self.num_steps):
            if i >= lo and (i <= hi if inclusive else i < hi):
                last = i
        return last + 1


# Per-backbone presets (constants lifted from the reference pnp modules).
SD_STYLE_SHIFT = StyleShiftConfig(alpha=0.65, gamma=3.0, eta2=0.5, window_mode="sd")
AD_STYLE_SHIFT = StyleShiftConfig(alpha=0.8, gamma=2.0, eta2=0.5, window_mode="ad")
SD3_STYLE_SHIFT = StyleShiftConfig(alpha=0.8, gamma=2.0, eta2=0.6, window_mode="sd3")

# Cross-frame (sparse-causal) KV index presets.
SD_BASE_FRAME_INDICES: Tuple[FrameIndex, ...] = (-1, 0, "first")  # sd attention.py:356
SD_PNP_FRAME_INDICES: Tuple[FrameIndex, ...] = (-1, "first")  # sd pnp_utils.py:25
AD_PNP_FRAME_INDICES: Tuple[FrameIndex, ...] = (-1, "first")  # ad pnp_utils.py:25
SD3_FRAME_INDICES: Tuple[FrameIndex, ...] = ("first", -1, 0)  # sd3 pnp_utils.py:27


@dataclasses.dataclass(frozen=True)
class StyleTransferConfig:
    """Pipeline-level stylization constants (reference stable_diffusion.py:687-716)."""

    num_steps: int = 50
    # localized latent blending active for i <= blend_hi * N
    blend_hi: float = 0.9
    # AdaIN re-anchor window (blend_lo * N, blend_hi * N]
    adain_lo: float = 0.8
    adain_hi: float = 0.9
    # sliding-window smoother (reference ships it disabled, smoother=None :715)
    smoother: Optional[str] = None
    smoother_steps: Tuple[int, int] = (20, 25)
    smoother_radius: int = 2
    # SD3 controlled-velocity pull (custom_pipeline.py:157-161, flow_inversion.py:61-64)
    eta_base: float = 0.85
    eta_trend: str = "constant"
    eta_start_step: int = 25
    eta_end_step: int = 39
