"""AnimateDiff-v2 pipeline builder (rebuild of AnimationPipeline wiring,
backbones/animatediff/pipelines/pipeline_animation.py:50 + the runner model
build, src/animatediff/run_content_inversion_animatediff.py:43-62).

Reuses SDVideoPipeline wholesale — the stages and scans are backbone-agnostic;
only the denoiser module, the DDIM beta schedule (plain 'linear',
animatediff-v2.yaml:16-20), the shift constants, and the frame-index sets
differ. AnimateDiff's spatial attention never sees cross-frame KV (see
univst_tpu/models/unet_ad.py docstring), so both index sets are empty.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from univst_tpu.core.config import AD_STYLE_SHIFT
from univst_tpu.core.scheduler import DDIMConfig, DDIMSchedule
from univst_tpu.models import convert as cv
from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel, Tokenizer
from univst_tpu.models.layers import VideoCtx
from univst_tpu.models.unet_ad import UNetAnimateDiff, UNetADConfig
from univst_tpu.models.vae import AutoencoderKL, VAEConfig
from univst_tpu.pipelines.sd import SDVideoPipeline, _find_weights


def build_animatediff(
    pretrained_model_path: Optional[str] = None,
    motion_module_path: Optional[str] = None,
    variant: str = "ad",
    num_frames: int = 16,
    height: int = 512,
    width: int = 512,
    dtype=jnp.bfloat16,
    capture_up_block: Optional[int] = None,
    seed: int = 0,
    dreambooth_path: Optional[str] = None,
    lora_path: Optional[str] = None,
    lora_alpha: float = 0.8,
) -> SDVideoPipeline:
    """Build the AnimateDiff pipeline: SD-1.5 2D base weights + motion ckpt
    (reference load_weights, animatediff/utils/util.py:89-176).

    ``dreambooth_path`` loads a personalized LDM checkpoint as the base
    (UNet + VAE + CLIP, reference load_weights:126-150); ``lora_path`` merges
    a webui-format LoRA into the UNet/text-encoder weights at ``lora_alpha``
    (reference convert_lora, default alpha 0.8 per load_weights:101). The
    same LoRA can instead be applied live with runtime scale via
    univst_tpu.models.lora.apply_lora."""
    if variant == "ad":
        unet_cfg = UNetADConfig.ad_v2(capture_up_block=capture_up_block)
        vae_cfg = VAEConfig.svd()
        clip_cfg = CLIPTextConfig.sd15()
    else:
        unet_cfg = UNetADConfig.tiny(capture_up_block=capture_up_block)
        vae_cfg = VAEConfig.tiny(temporal_decoder=True)
        clip_cfg = CLIPTextConfig.tiny()

    unet = UNetAnimateDiff(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text = CLIPTextModel(clip_cfg, dtype=dtype)

    h8 = height // 8
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    vctx = VideoCtx(num_frames=num_frames, frame_indices=())
    unet_params = jax.jit(unet.init, static_argnums=(4,))(
        k1,
        jnp.zeros((num_frames, h8, width // 8, unet_cfg.in_channels), dtype),
        jnp.asarray(0),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim), dtype),
        vctx,
    )["params"]
    vae_params = jax.jit(vae.init, static_argnums=(2,))(
        k2, jnp.zeros((num_frames, 64, 64, 3), dtype), num_frames
    )["params"]
    text_params = jax.jit(text.init)(k3, jnp.zeros((1, 77), jnp.int32))["params"]

    tok_dir = None
    if pretrained_model_path and os.path.isdir(
        os.path.join(pretrained_model_path, "tokenizer")
    ):
        tok_dir = os.path.join(pretrained_model_path, "tokenizer")

    unet_sd = vae_sd = clip_sd = None
    if pretrained_model_path:
        uw = _find_weights(os.path.join(pretrained_model_path, "unet"))
        if uw:
            unet_sd = cv.load_torch_state_dict(uw)
        vw = _find_weights(os.path.join(pretrained_model_path, "vae"))
        if vw:
            vae_sd = cv.load_torch_state_dict(vw)
        tw = _find_weights(os.path.join(pretrained_model_path, "text_encoder"))
        if tw:
            clip_sd = cv.load_torch_state_dict(tw)
    if dreambooth_path:
        from univst_tpu.models.convert_ldm import (
            ldm_clip_to_hf,
            ldm_unet_to_diffusers,
            ldm_vae_to_diffusers,
        )

        db = cv.load_torch_state_dict(dreambooth_path)
        unet_sd = ldm_unet_to_diffusers(db)
        vae_sd = ldm_vae_to_diffusers(db)
        clip_hf = ldm_clip_to_hf(db)
        if clip_hf:
            clip_sd = clip_hf
    if lora_path:
        from univst_tpu.models.convert_ldm import merge_lora

        lora_sd = cv.load_torch_state_dict(lora_path)
        if unet_sd is not None:
            unet_lora = {k: v for k, v in lora_sd.items() if k.startswith("lora_unet_")}
            unet_sd = merge_lora(unet_sd, unet_lora, alpha=lora_alpha)
        if clip_sd is not None:
            te_lora = {k: v for k, v in lora_sd.items() if k.startswith("lora_te_")}
            clip_sd = merge_lora(clip_sd, te_lora, alpha=lora_alpha)
    if unet_sd is not None:
        unet_params = cv.merge_into_params(
            unet_params, cv.convert_ad_unet(unet_sd, unet_cfg)
        )
    if vae_sd is not None:
        vae_params = cv.merge_into_params(vae_params, cv.convert_vae(vae_sd, vae_cfg))
    if clip_sd is not None:
        text_params = cv.merge_into_params(
            text_params, cv.convert_clip_text(clip_sd, clip_cfg)
        )
    if motion_module_path:
        unet_params = cv.merge_into_params(
            unet_params,
            cv.convert_motion_module(cv.load_torch_state_dict(motion_module_path), unet_cfg),
        )

    return SDVideoPipeline(
        unet=unet,
        unet_params=unet_params,
        vae=vae,
        vae_params=vae_params,
        text_encoder=text,
        text_params=text_params,
        tokenizer=Tokenizer(tok_dir),
        schedule=DDIMSchedule(DDIMConfig(beta_schedule="linear")),
        num_frames=num_frames,
        dtype=dtype,
        style_shift_cfg=AD_STYLE_SHIFT,
        base_frame_indices=(),
        pnp_frame_indices=(),
        # motion modules add per-frame positional encodings
        # (motion_module.py:52-86) — style frames are NOT identical, so the
        # single-frame style fast path does not apply
        style_singleton=False,
    )
