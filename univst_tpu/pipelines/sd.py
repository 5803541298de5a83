"""SD-1.5 / SD-2.1 video pipeline (rebuild of
SpatioTemporalStableDiffusionPipeline,
backbones/video_diffusion_sd/pipelines/stable_diffusion.py:45-876).

The pipeline owns parameters and exposes jitted stage functions; the denoise
loops live in univst_tpu/methods as single-compile scans. Weight sources:
  * a diffusers-layout checkpoint directory (unet/, vae/, text_encoder/,
    tokenizer/) converted via univst_tpu/models/convert.py, or
  * deterministic random init (no network access in this environment) — same
    architecture, used for throughput benches and smoke tests.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.config import (
    SD_BASE_FRAME_INDICES,
    SD_PNP_FRAME_INDICES,
    SD_STYLE_SHIFT,
    StyleShiftConfig,
    StyleTransferConfig,
)
from univst_tpu.core.scheduler import DDIMConfig, DDIMSchedule, EasyInvConfig
from univst_tpu.methods import inversion as inv
from univst_tpu.methods.style_transfer import style_transfer_ddim
from univst_tpu.models import convert as cv
from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel, Tokenizer
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig
from univst_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latent


def _find_weights(dirpath: str) -> Optional[str]:
    for pat in ("*.safetensors", "*.bin", "*.pt"):
        hits = sorted(glob.glob(os.path.join(dirpath, pat)))
        if hits:
            return hits[0]
    return None


@dataclasses.dataclass
class SDVideoPipeline:
    unet: UNetPseudo3D
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text_encoder: CLIPTextModel
    text_params: dict
    tokenizer: Tokenizer
    schedule: DDIMSchedule
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16

    # -- construction --------------------------------------------------------

    @classmethod
    def build(
        cls,
        pretrained_model_path: Optional[str] = None,
        variant: str = "sd15",
        num_frames: int = 16,
        height: int = 512,
        width: int = 512,
        dtype=jnp.bfloat16,
        capture_up_block: Optional[int] = None,
        seed: int = 0,
        unet_cfg: Optional[UNetSDConfig] = None,
        vae_cfg: Optional[VAEConfig] = None,
        clip_cfg: Optional[CLIPTextConfig] = None,
    ) -> "SDVideoPipeline":
        """Build models; convert weights when a checkpoint dir is given.

        The reference pairs the SD UNet with the SVD temporal-decoder VAE
        (run_content_inversion_sd.py:41-43); we default the same way.
        """
        if unet_cfg is None:
            mk = {"sd15": UNetSDConfig.sd15, "sd21": UNetSDConfig.sd21,
                  "tiny": UNetSDConfig.tiny}[variant]
            unet_cfg = mk(capture_up_block=capture_up_block)
        elif capture_up_block is not None:
            unet_cfg = dataclasses.replace(unet_cfg, capture_up_block=capture_up_block)
        if vae_cfg is None:
            vae_cfg = (
                VAEConfig.svd() if variant in ("sd15", "sd21") else VAEConfig.tiny(
                    temporal_decoder=True
                )
            )
        if clip_cfg is None:
            mk = {"sd15": CLIPTextConfig.sd15, "sd21": CLIPTextConfig.sd21,
                  "tiny": CLIPTextConfig.tiny}[variant]
            clip_cfg = mk()

        unet = UNetPseudo3D(unet_cfg, dtype=dtype)
        vae = AutoencoderKL(vae_cfg, dtype=dtype)
        text = CLIPTextModel(clip_cfg, dtype=dtype)

        h8, w8 = height // 8, width // 8
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        vctx = VideoCtx(num_frames=num_frames, frame_indices=SD_BASE_FRAME_INDICES)
        with jax.default_device(jax.devices()[0]):
            unet_params = jax.jit(unet.init, static_argnums=(4,))(
                k1,
                jnp.zeros((num_frames, h8, w8, unet_cfg.in_channels), dtype),
                jnp.asarray(0),
                jnp.zeros((1, 77, unet_cfg.cross_attention_dim), dtype),
                vctx,
            )["params"]
            # init with the real frame count so temporal decoder params exist
            vae_params = jax.jit(vae.init, static_argnums=(2,))(
                k2, jnp.zeros((num_frames, 64, 64, 3), dtype), num_frames
            )["params"]
            text_params = text.init(k3, jnp.zeros((1, 77), jnp.int32))["params"]

        tok_dir = None
        if pretrained_model_path and os.path.isdir(
            os.path.join(pretrained_model_path, "tokenizer")
        ):
            tok_dir = os.path.join(pretrained_model_path, "tokenizer")
        tokenizer = Tokenizer(tok_dir)

        if pretrained_model_path:
            uw = _find_weights(os.path.join(pretrained_model_path, "unet"))
            if uw:
                unet_params = cv.merge_into_params(
                    unet_params, cv.convert_sd_unet(cv.load_torch_state_dict(uw), unet_cfg)
                )
            vw = _find_weights(os.path.join(pretrained_model_path, "vae"))
            if vw:
                vae_params = cv.merge_into_params(
                    vae_params, cv.convert_vae(cv.load_torch_state_dict(vw), vae_cfg)
                )
            tw = _find_weights(os.path.join(pretrained_model_path, "text_encoder"))
            if tw:
                text_params = cv.merge_into_params(
                    text_params, cv.convert_clip_text(cv.load_torch_state_dict(tw), clip_cfg)
                )

        return cls(
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            text_encoder=text,
            text_params=text_params,
            tokenizer=tokenizer,
            schedule=DDIMSchedule(DDIMConfig()),
            num_frames=num_frames,
            dtype=dtype,
        )

    # -- stages ---------------------------------------------------------------

    def encode_text(self, prompt: str):
        ids = jnp.asarray(self.tokenizer(prompt))
        hidden, _ = self.text_encoder.apply({"params": self.text_params}, ids)
        return hidden  # [1, 77, D]

    def encode_frames(self, frames, key):
        """[F, H, W, 3] in [-1,1] -> sampled latents [F, h, w, 4] * scaling."""
        mean, logvar = self.vae.apply(
            {"params": self.vae_params},
            jnp.asarray(frames, self.dtype),
            method=AutoencoderKL.encode,
        )
        z = sample_latent(mean.astype(jnp.float32), logvar.astype(jnp.float32), key)
        return z * self.vae.cfg.scaling_factor

    def decode_latents(self, latents):
        """latents [F, h, w, 4] -> frames [F, H, W, 3] in [0, 1] (reference
        decode_latents, stable_diffusion.py:369-394)."""
        z = (latents / self.vae.cfg.scaling_factor).astype(self.dtype)
        px = self.vae.apply(
            {"params": self.vae_params}, z, self.num_frames,
            method=AutoencoderKL.decode,
        )
        return jnp.clip(px.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    # -- denoiser closures ----------------------------------------------------

    def _denoise_fn(self, context, frame_indices, style_cfg: Optional[StyleShiftConfig]):
        vctx = VideoCtx(num_frames=self.num_frames, frame_indices=frame_indices)

        def denoise(latents, t, step_idx):
            sctx = (
                StyleCtx(step_idx=step_idx, cfg=style_cfg)
                if style_cfg is not None
                else None
            )
            eps, feat = self.unet.apply(
                {"params": self.unet_params},
                latents.astype(self.dtype),
                t,
                context.astype(self.dtype),
                vctx,
                sctx,
            )
            return eps.astype(jnp.float32), feat

        return denoise

    # -- top-level jitted workflows -------------------------------------------

    @partial(jax.jit, static_argnames=("self", "num_steps", "is_opt", "capture_timestep"))
    def invert(self, latents, context, num_steps: int = 50, is_opt: bool = True,
               capture_timestep: Optional[int] = None):
        """Content/style inversion -> (trajectory [N+1,...], captured feature).
        (reference ddim_inversion, inversion_tools/ddim_inversion.py:71-84)"""
        denoise = self._denoise_fn(context, SD_BASE_FRAME_INDICES, None)
        return inv.ddim_invert(
            denoise, latents.astype(jnp.float32), self.schedule, num_steps,
            easyinv=EasyInvConfig() if is_opt else None,
            capture_timestep=capture_timestep,
        )

    @partial(jax.jit, static_argnames=("self", "num_steps"))
    def reconstruct_latents(self, latents_T, context, num_steps: int = 50):
        denoise = self._denoise_fn(context, SD_BASE_FRAME_INDICES, None)
        return inv.ddim_sample(denoise, latents_T.astype(jnp.float32), self.schedule, num_steps)

    @partial(jax.jit, static_argnames=("self", "cfg", "style_cfg"))
    def stylize_latents(
        self,
        content_traj_rev,
        style_traj_rev,
        init_latents,
        context3,
        mask=None,
        cfg: StyleTransferConfig = StyleTransferConfig(),
        style_cfg: StyleShiftConfig = SD_STYLE_SHIFT,
    ):
        """3-branch stylization (reference video_style_transfer,
        stable_diffusion.py:630-766)."""
        denoise = self._denoise_fn(context3, SD_PNP_FRAME_INDICES, style_cfg)

        def denoise3(x3, t, i):
            eps, _ = denoise(x3, t, i)
            return eps

        return style_transfer_ddim(
            denoise3, content_traj_rev, style_traj_rev,
            init_latents.astype(jnp.float32), self.schedule, cfg, mask=mask,
        )

    def __hash__(self):  # allow use as a static jit argument
        return id(self)

    def __eq__(self, other):
        return self is other
