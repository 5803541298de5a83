"""Sparse ControlNet for the AnimateDiff backbone (Flax).

Rebuild of backbones/animatediff/models/sparse_controlnet.py:44-587 (the
reference implements it but never instantiates it from any CLI —
pipeline_animation.py:67 defaults controlnet=None; SURVEY.md C20). Structure:

  * conditioning embedding: conv stack downsampling the RGB/scribble condition
    to latent resolution, zero-init output conv (sparse_controlnet.py:49-82);
    a per-frame conditioning *mask* channel is concatenated when
    ``concate_conditioning_mask`` (the 'sparse' part — only some frames carry
    conditioning, sparse_controlnet.py:136,176-178);
  * the AnimateDiff UNet *encoder* (down blocks + mid, with motion modules),
    each residual passed through a zero-init 1x1 projection
    (controlnet_down_blocks / controlnet_mid_block).

Outputs plug into ``UNetAnimateDiff`` skip connections as additive residuals
(the reference adds them inside AnimationPipeline when a controlnet is given).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from univst_tpu.models.layers import TimestepEmbedMLP, VideoCtx, timestep_embedding
from univst_tpu.models.unet_ad import (
    ADResnetBlock,
    ADTransformer,
    MotionModule,
    UNetADConfig,
)


@dataclasses.dataclass(frozen=True)
class SparseControlNetConfig:
    unet: UNetADConfig = UNetADConfig()
    conditioning_channels: int = 3
    concate_conditioning_mask: bool = True
    use_simplified_condition_embedding: bool = False
    cond_embed_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @staticmethod
    def tiny(**kw) -> "SparseControlNetConfig":
        return SparseControlNetConfig(
            unet=UNetADConfig.tiny(), cond_embed_channels=(4, 8), **kw
        )


class ConditioningEmbedding(nn.Module):
    """conv -> (conv, stride-2 conv)* -> zero-init conv out
    (sparse_controlnet.py:49-82)."""

    out_channels: int
    block_channels: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.block_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_channels) - 1):
            h = nn.Conv(self.block_channels[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"block_{i}_a")(h)
            h = nn.silu(h)
            h = nn.Conv(self.block_channels[i + 1], (3, 3), strides=2, padding=1,
                        dtype=self.dtype, name=f"block_{i}_b")(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="conv_out")(h)


class SparseControlNet(nn.Module):
    """Returns (down_residuals tuple, mid_residual) for UNetAnimateDiff."""

    cfg: SparseControlNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,                     # [B*F, h, w, C] noisy latents
        timestep,
        context,               # [B, L, Dt]
        cond,                  # [B*F, H, W, 3] conditioning frames (0 where absent)
        cond_mask,             # [B*F, h, w, 1] 1 for conditioned frames
        video_ctx: VideoCtx,
        conditioning_scale: float = 1.0,
    ):
        u = self.cfg.unet
        ch0 = u.block_out_channels[0]
        n_blocks = len(u.block_out_channels)
        b = x.shape[0] // video_ctx.num_frames

        t_emb = timestep_embedding(jnp.broadcast_to(jnp.asarray(timestep), (b,)), ch0)
        temb = TimestepEmbedMLP(ch0 * 4, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )

        if self.cfg.use_simplified_condition_embedding:
            cond_lat = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype,
                               kernel_init=nn.initializers.zeros,
                               name="cond_embed_simple")(cond)
        else:
            cond_lat = ConditioningEmbedding(
                ch0, self.cfg.cond_embed_channels, dtype=self.dtype,
                name="cond_embedding",
            )(cond)

        if self.cfg.concate_conditioning_mask:
            x = jnp.concatenate([x, cond_mask.astype(x.dtype)], axis=-1)
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = x + cond_lat

        def zero_proj(h, name):
            return nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name=name)(h)

        residuals = [zero_proj(x, "ctrl_down_0") * conditioning_scale]
        ri = 1
        for bi in range(n_blocks):
            ch = u.block_out_channels[bi]
            for li in range(u.layers_per_block):
                x = ADResnetBlock(ch, u.norm_num_groups, dtype=self.dtype,
                                  name=f"down_{bi}_resnet_{li}")(x, temb, video_ctx)
                if u.down_block_has_attn[bi]:
                    x = ADTransformer(u.num_heads[bi], u.norm_num_groups, False,
                                      dtype=self.dtype, name=f"down_{bi}_attn_{li}")(
                        x, context, video_ctx, None)
                x = MotionModule(u, dtype=self.dtype,
                                 name=f"down_{bi}_motion_{li}")(x, video_ctx)
                residuals.append(zero_proj(x, f"ctrl_down_{ri}") * conditioning_scale)
                ri += 1
            if bi < n_blocks - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=self.dtype,
                            name=f"down_{bi}_downsample")(x)
                residuals.append(zero_proj(x, f"ctrl_down_{ri}") * conditioning_scale)
                ri += 1

        chm = u.block_out_channels[-1]
        x = ADResnetBlock(chm, u.norm_num_groups, dtype=self.dtype,
                          name="mid_resnet_0")(x, temb, video_ctx)
        x = ADTransformer(u.num_heads[-1], u.norm_num_groups, False,
                          dtype=self.dtype, name="mid_attn_0")(x, context, video_ctx, None)
        if u.motion_mid_block:
            x = MotionModule(u, dtype=self.dtype, name="mid_motion")(x, video_ctx)
        x = ADResnetBlock(chm, u.norm_num_groups, dtype=self.dtype,
                          name="mid_resnet_1")(x, temb, video_ctx)
        mid_residual = zero_proj(x, "ctrl_mid") * conditioning_scale
        return tuple(residuals), mid_residual
