"""Pseudo-3D SD UNet (SD-1.5 / SD-2.1 backbones) in Flax.

TPU-native rebuild of UNetPseudo3DConditionModel
(/root/reference/backbones/video_diffusion_sd/models/unet_3d_condition.py:45,
unet_3d_blocks.py, attention.py, resnet.py): a 2D SD UNet inflated to video
with dirac-identity temporal convs, sparse-causal spatial attention,
text cross-attention, and zero-init temporal attention after the feedforward.

Differences from the reference by design:
  * channels-last ``[B*F, H, W, C]`` layout, frames merged into batch;
  * no module monkey-patching — the PnP style shift is a config flag per
    attention layer plus a StyleCtx argument;
  * the feature-capture hook (unet_3d_condition.py:429-436) returns the
    feature instead of writing a ``.pt`` file from inside the forward.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from univst_tpu.models.layers import (
    CrossAttention,
    FeedForwardGEGLU,
    GroupNorm,
    PseudoConv3d,
    SelfAttention,
    StyleCtx,
    TemporalSelfAttention,
    TimestepEmbedMLP,
    VideoCtx,
    timestep_embedding,
    upsample_nearest_2x,
)

# The 8 decoder attn1 layers the reference registers for the PnP shift:
# up_res_dict = {1: [1, 2], 2: [0, 1, 2], 3: [0, 1, 2]} (pnp_utils.py:104).
PNP_UP_ATTENTIONS = frozenset(
    {(1, 1), (1, 2), (2, 0), (2, 1), (2, 2), (3, 0), (3, 1), (3, 2)}
)
# Deterministic slot order for injected style K/V (execution order through the
# decoder); slot i of StyleCtx.style_kv belongs to PNP_SLOT_ORDER[i].
PNP_SLOT_ORDER = tuple(sorted(PNP_UP_ATTENTIONS))


def extract_pnp_kv(pnp_vars) -> tuple:
    """Flatten the sown 'pnp_kv' collection (apply(..., mutable=['pnp_kv']))
    into PNP_SLOT_ORDER: a tuple of (k, v) pairs, one per PnP attn1 layer."""
    found = {}

    def rec(tree):
        for key, val in tree.items():
            if key.startswith("slot_"):
                found[int(key[5:])] = val[0]  # sow wraps the value in a tuple
            else:
                rec(val)

    rec(pnp_vars)
    assert len(found) == len(PNP_SLOT_ORDER), sorted(found)
    return tuple(found[i] for i in range(len(found)))


@dataclasses.dataclass(frozen=True)
class UNetSDConfig:
    """SD-1.5 defaults; SD-2.1-base differs in num_heads/(cross|linear) fields."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # diffusers 'attention_head_dim' in old SD configs == number of heads
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    # index of the up block whose output feeds mask propagation (C13);
    # None disables capture. Reference default: 2 (run_content_inversion_sd.py:88)
    capture_up_block: Optional[int] = None
    # Elide the temporal layers entirely. In this training-free framework the
    # temporal convs stay at their dirac-identity init and temporal attention
    # at its zero-init output projection — 2D checkpoints never carry weights
    # for them (load_2d_state_dict skips ``*_temporal`` keys, reference
    # unet_3d_condition.py:493-509) and nothing trains them — so both are
    # mathematically exact no-ops. Skipping them removes ~1/3 of conv FLOPs
    # and all temporal-attention work. False keeps the full inflated
    # architecture (used by equivalence tests).
    temporal_identity: bool = False

    @staticmethod
    def sd15(**kw) -> "UNetSDConfig":
        return UNetSDConfig(**kw)

    @staticmethod
    def sd21(**kw) -> "UNetSDConfig":
        return UNetSDConfig(
            num_heads=(5, 10, 20, 20),
            cross_attention_dim=1024,
            use_linear_projection=True,
            **kw,
        )

    @staticmethod
    def tiny(**kw) -> "UNetSDConfig":
        """Small config for tests: same topology, ~1000x fewer FLOPs."""
        return UNetSDConfig(
            block_out_channels=(32, 64, 64, 64),
            num_heads=(2, 2, 2, 2),
            cross_attention_dim=32,
            norm_num_groups=8,
            **kw,
        )


class TransformerBlock(nn.Module):
    """SpatioTemporalTransformerBlock (reference attention.py:156-346):
    sparse-causal self-attn -> text cross-attn -> GEGLU FF -> temporal attn."""

    num_heads: int
    apply_pnp: bool
    temporal_attn: bool = True
    pnp_slot: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, video_ctx: VideoCtx, style_ctx: Optional[StyleCtx]):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + SelfAttention(
            self.num_heads, apply_pnp=self.apply_pnp, pnp_slot=self.pnp_slot,
            dtype=self.dtype, name="attn1",
        )(h, video_ctx, style_ctx)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn2")(h, context)

        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForwardGEGLU(x.shape[-1], dtype=self.dtype, name="ff")(h)

        if self.temporal_attn and video_ctx.is_video:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_temporal")(x)
            x = x + TemporalSelfAttention(
                self.num_heads, dtype=self.dtype, name="attn_temporal"
            )(h, video_ctx.num_frames)
        return x


class SpatioTemporalTransformer(nn.Module):
    """Transformer wrapper: per-frame GroupNorm -> proj_in -> block -> proj_out
    (+residual); reference attention.py:40-153."""

    num_heads: int
    norm_num_groups: int
    use_linear_projection: bool
    apply_pnp: bool
    temporal_attn: bool = True
    pnp_slot: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, video_ctx: VideoCtx, style_ctx: Optional[StyleCtx]):
        bf, hh, ww, c = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, eps=1e-6, dtype=self.dtype, name="norm")(x)
        # proj_in: 1x1 conv == Dense on NHWC; linear-projection variant is the
        # same matmul applied after token flattening — identical math here.
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        tokens = h.reshape(bf, hh * ww, c)
        # text context arrives [B, 77, Dt]; repeat per frame -> [B*F, 77, Dt]
        f = video_ctx.num_frames
        ctx = jnp.repeat(context, f, axis=0) if context.shape[0] != bf else context
        tokens = TransformerBlock(
            self.num_heads, self.apply_pnp, temporal_attn=self.temporal_attn,
            pnp_slot=self.pnp_slot, dtype=self.dtype, name="block",
        )(tokens, ctx, video_ctx, style_ctx)
        h = tokens.reshape(bf, hh, ww, c)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h + residual


class ResnetBlockP3D(nn.Module):
    """ResnetBlockPseudo3D (reference resnet.py:239-397). GroupNorm statistics
    span frames (torch 5D GroupNorm semantics)."""

    out_channels: int
    norm_num_groups: int
    temporal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, video_ctx: VideoCtx):
        c_in = x.shape[-1]
        h = GroupNorm(
            self.norm_num_groups,
            eps=1e-5,
            across_frames=True,
            num_frames=video_ctx.num_frames,
            dtype=self.dtype,
            name="norm1",
        )(x)
        h = nn.silu(h)
        h = PseudoConv3d(
            self.out_channels, 3, temporal=self.temporal, dtype=self.dtype, name="conv1"
        )(h, video_ctx)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        # temb is per-branch [B, C]; broadcast over frames and space
        t = jnp.repeat(t, video_ctx.num_frames, axis=0)
        h = h + t[:, None, None, :]
        h = GroupNorm(
            self.norm_num_groups,
            eps=1e-5,
            across_frames=True,
            num_frames=video_ctx.num_frames,
            dtype=self.dtype,
            name="norm2",
        )(h)
        h = nn.silu(h)
        h = PseudoConv3d(
            self.out_channels, 3, temporal=self.temporal, dtype=self.dtype, name="conv2"
        )(h, video_ctx)
        if c_in != self.out_channels:
            x = PseudoConv3d(self.out_channels, 1, dtype=self.dtype, name="conv_shortcut")(
                x, video_ctx
            )
        return x + h


class DownBlock(nn.Module):
    num_layers: int
    out_channels: int
    num_heads: int
    has_attn: bool
    add_downsample: bool
    cfg: UNetSDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, video_ctx, style_ctx):
        tmp = not self.cfg.temporal_identity
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlockP3D(
                self.out_channels, self.cfg.norm_num_groups, temporal=tmp,
                dtype=self.dtype, name=f"resnet_{i}",
            )(x, temb, video_ctx)
            if self.has_attn:
                x = SpatioTemporalTransformer(
                    self.num_heads,
                    self.cfg.norm_num_groups,
                    self.cfg.use_linear_projection,
                    apply_pnp=False,
                    temporal_attn=tmp,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(x, context, video_ctx, style_ctx)
            skips.append(x)
        if self.add_downsample:
            x = PseudoConv3d(
                self.out_channels, 3, strides=2, temporal=tmp, dtype=self.dtype,
                name="downsample",
            )(x, video_ctx)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    num_heads: int
    cfg: UNetSDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, video_ctx, style_ctx):
        c = x.shape[-1]
        tmp = not self.cfg.temporal_identity
        x = ResnetBlockP3D(
            c, self.cfg.norm_num_groups, temporal=tmp, dtype=self.dtype, name="resnet_0"
        )(x, temb, video_ctx)
        x = SpatioTemporalTransformer(
            self.num_heads,
            self.cfg.norm_num_groups,
            self.cfg.use_linear_projection,
            apply_pnp=False,
            temporal_attn=tmp,
            dtype=self.dtype,
            name="attn_0",
        )(x, context, video_ctx, style_ctx)
        x = ResnetBlockP3D(
            c, self.cfg.norm_num_groups, temporal=tmp, dtype=self.dtype, name="resnet_1"
        )(x, temb, video_ctx)
        return x


class UpBlock(nn.Module):
    block_index: int
    num_layers: int
    out_channels: int
    num_heads: int
    has_attn: bool
    add_upsample: bool
    cfg: UNetSDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, video_ctx, style_ctx):
        tmp = not self.cfg.temporal_identity
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlockP3D(
                self.out_channels, self.cfg.norm_num_groups, temporal=tmp,
                dtype=self.dtype, name=f"resnet_{i}",
            )(x, temb, video_ctx)
            if self.has_attn:
                is_pnp = (self.block_index, i) in PNP_UP_ATTENTIONS
                x = SpatioTemporalTransformer(
                    self.num_heads,
                    self.cfg.norm_num_groups,
                    self.cfg.use_linear_projection,
                    apply_pnp=is_pnp,
                    temporal_attn=tmp,
                    pnp_slot=(
                        PNP_SLOT_ORDER.index((self.block_index, i)) if is_pnp else None
                    ),
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(x, context, video_ctx, style_ctx)
        if self.add_upsample:
            x = upsample_nearest_2x(x)
            x = PseudoConv3d(
                self.out_channels, 3, temporal=tmp, dtype=self.dtype, name="upsample"
            )(x, video_ctx)
        return x


class UNetPseudo3D(nn.Module):
    """The full video UNet. __call__ returns (eps_prediction, captured_feature).

    Args:
      x: ``[B*F, H, W, C]`` latents, B = branch count.
      timestep: scalar (shared across the batch, like the reference).
      context: ``[B, 77, Dt]`` text embeddings.
    """

    cfg: UNetSDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        timestep,
        context,
        video_ctx: VideoCtx,
        style_ctx: Optional[StyleCtx] = None,
    ):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4
        n_blocks = len(cfg.block_out_channels)

        b = x.shape[0] // video_ctx.num_frames
        t_emb = timestep_embedding(jnp.broadcast_to(jnp.asarray(timestep), (b,)), ch0)
        temb = TimestepEmbedMLP(time_embed_dim, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )

        tmp = not cfg.temporal_identity
        x = PseudoConv3d(ch0, 3, temporal=tmp, dtype=self.dtype, name="conv_in")(
            x, video_ctx
        )

        skips = [x]
        for bi in range(n_blocks):
            x, block_skips = DownBlock(
                num_layers=cfg.layers_per_block,
                out_channels=cfg.block_out_channels[bi],
                num_heads=cfg.num_heads[bi],
                has_attn=cfg.down_block_has_attn[bi],
                add_downsample=bi < n_blocks - 1,
                cfg=cfg,
                dtype=self.dtype,
                name=f"down_{bi}",
            )(x, temb, context, video_ctx, style_ctx)
            skips.extend(block_skips)

        x = MidBlock(cfg.num_heads[-1], cfg, dtype=self.dtype, name="mid")(
            x, temb, context, video_ctx, style_ctx
        )

        captured = None
        rev_ch = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_heads))
        for bi in range(n_blocks):
            n_layers = cfg.layers_per_block + 1
            block_skips = skips[-n_layers:]
            del skips[-n_layers:]
            x = UpBlock(
                block_index=bi,
                num_layers=n_layers,
                out_channels=rev_ch[bi],
                num_heads=rev_heads[bi],
                has_attn=cfg.up_block_has_attn[bi],
                add_upsample=bi < n_blocks - 1,
                cfg=cfg,
                dtype=self.dtype,
                name=f"up_{bi}",
            )(x, block_skips, temb, context, video_ctx, style_ctx)
            if cfg.capture_up_block is not None and bi == cfg.capture_up_block:
                # reference saves sample[0] as [F, H, W, C]
                # (unet_3d_condition.py:429-436); batch element 0 == branch 0
                f = video_ctx.num_frames
                captured = x.reshape((b, f) + x.shape[1:])[0]

        x = GroupNorm(
            cfg.norm_num_groups,
            eps=1e-5,
            across_frames=True,
            num_frames=video_ctx.num_frames,
            dtype=self.dtype,
            name="conv_norm_out",
        )(x)
        x = nn.silu(x)
        x = PseudoConv3d(
            cfg.out_channels, 3, temporal=tmp, dtype=self.dtype, name="conv_out"
        )(x, video_ctx)
        return x, captured
