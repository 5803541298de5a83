"""AnimateDiff-v2 UNet (Flax): per-frame 2D SD UNet + temporal motion modules.

Rebuild of backbones/animatediff/models/{unet.py,unet_blocks.py,
motion_module.py,attention.py,resnet.py}. Structural facts replicated:

  * all convs/norms are per-frame 2D (InflatedConv3d / InflatedGroupNorm,
    resnet.py:10-29) — no pseudo-3D temporal taps;
  * spatial attn1 is plain per-frame self-attention
    (unet_use_cross_frame_attention=False in animatediff-v2.yaml; and the PnP
    patch receives clip_length=None from BasicTransformerBlock so cross-frame
    KV expansion NEVER activates for this backbone, attention.py:344 +
    pnp_utils.py:59) — temporal consistency comes from the motion modules;
  * a VanillaTemporalModule follows each (resnet, attn) pair in down/up blocks
    at every resolution and sits between attn and resnet1 in the mid block
    (unet_blocks.py:271-277,385-390; animatediff-v2.yaml motion_module_*);
  * each motion module: per-frame GroupNorm -> proj_in -> 1 transformer block
    with two Temporal_Self attentions (sinusoidal positional encoding over the
    frame axis, max_len 24) + GEGLU FF -> zero-init proj_out + residual
    (motion_module.py:52-247).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.attention.ops import (
    apply_style_shift,
    apply_style_shift_injected,
    mha,
)
from univst_tpu.models.layers import (
    CrossAttention,
    FeedForwardGEGLU,
    GroupNorm,
    StyleCtx,
    TimestepEmbedMLP,
    VideoCtx,
    timestep_embedding,
    upsample_nearest_2x,
)
from univst_tpu.models.unet_sd import PNP_SLOT_ORDER, PNP_UP_ATTENTIONS


@dataclasses.dataclass(frozen=True)
class UNetADConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    # motion module config (animatediff-v2.yaml:7-14)
    motion_num_heads: int = 8
    motion_num_blocks: int = 1
    motion_attention_layers: int = 2  # ("Temporal_Self", "Temporal_Self")
    motion_pe_max_len: int = 24
    motion_mid_block: bool = True
    capture_up_block: Optional[int] = None

    @staticmethod
    def ad_v2(**kw) -> "UNetADConfig":
        return UNetADConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "UNetADConfig":
        return UNetADConfig(
            block_out_channels=(32, 64, 64, 64),
            num_heads=(2, 2, 2, 2),
            motion_num_heads=2,
            cross_attention_dim=32,
            norm_num_groups=8,
            **kw,
        )


def _sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal positions (motion_module.py PositionalEncoding:229-247)."""
    position = np.arange(max_len)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class _DenseKernel(nn.Module):
    """Parameter holder matching ``nn.Dense``'s tree ({kernel[, bias]}) so a
    module can apply the projection inside a ``shard_map`` while keeping
    checkpoint/converter compatibility byte-for-byte."""

    features_in: int
    features_out: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features_out,))
            if self.use_bias else None
        )
        return kern, bias


class TemporalSelfAttentionPE(nn.Module):
    """VersatileAttention 'Temporal_Self' (motion_module.py:250-337):
    per-spatial-location attention over frames with additive sinusoidal PE."""

    num_heads: int
    pe_max_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, mesh=None):
        bf, l, d = x.shape
        b = bf // num_frames
        f = num_frames
        dh = d // self.num_heads
        pe = jnp.asarray(_sinusoidal_pe(self.pe_max_len, d))[:f]
        # PE over the frame axis, added in the flat [bf, l, d] layout: tiling
        # the (tiny, replicated) PE table avoids reshaping the activation to
        # (b, f, ...) — that merge is unrepresentable under a dim0 sharding
        # whose shard size doesn't align with branch boundaries, and GSPMD
        # lowers it as a full-activation all-gather per q/k/v at every motion
        # module (measured: the entire gather budget of the frame-sharded AD
        # step came from this line, not from the attention itself).
        pe_rows = jnp.tile(pe, (b, 1))[:, None, :].astype(x.dtype)
        wq, _ = _DenseKernel(d, d, name="to_q")()
        wk, _ = _DenseKernel(d, d, name="to_k")()
        wv, _ = _DenseKernel(d, d, name="to_v")()
        wo, bo = _DenseKernel(d, d, use_bias=True, name="to_out")()

        def body(xt, pe_r, wq, wk, wv, wo, bo):
            """PE add + q/k/v proj + frame attention + out proj, on a token
            slice. [bf, lx, d] -> [bf, lx, d] (lx may be a shard-local
            slice; the frame axis is always full here)."""
            xt = xt + pe_r
            dt = self.dtype

            def proj(t, w):
                return t.astype(dt) @ w.astype(dt)

            qx, kx, vx = proj(xt, wq), proj(xt, wk), proj(xt, wv)
            lx = qx.shape[1]

            # Frame attention as CANONICAL batched matmuls on [B', f, dh]
            # with B' = b*lx*heads. The earlier "transpose-free" form — a
            # (b, l, h)-batched einsum on the native [b, f, lx, h, dh]
            # layout — lowered on TPU as `convolution-base-dilated` ops
            # (window size=2x4096x8, lhs_dilate=...): XLA's batch-dims-as-
            # spatial-dims path, measured at 19 effective TFLOPS for the
            # 64x64 module (25.9 ms/call, ~130 ms/step across the five
            # c=320 modules). The four explicit transposes below cost
            # ~0.7 GB of HBM traffic and buy clean batched dots.
            def bfh(t):
                return t.reshape(b, f, lx, self.num_heads, dh).transpose(
                    0, 2, 3, 1, 4).reshape(b * lx * self.num_heads, f, dh)

            qt, kt, vt = bfh(qx), bfh(kx), bfh(vx)
            logits = jax.lax.dot_general(
                qt, kt, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (dh**-0.5)  # [B', f, f]
            probs = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
            out = jax.lax.dot_general(
                probs, vt, (((2,), (1,)), ((0,), (0,))),
            )  # [B', f, dh]
            out = out.reshape(b, lx, self.num_heads, f, dh).transpose(
                0, 3, 1, 2, 4).reshape(bf, lx, d)
            return proj(out, wo) + bo.astype(dt)

        # Ulysses-style reshard under a frame-parallel mesh: the attention
        # axis is the (sharded) frame axis, so without help GSPMD all-gathers
        # the full K/V at every motion module — 5.8 GB/step at 512px/16f
        # (BENCH_NOTES r3 comm census), the worst comm pattern in the repo.
        # An explicit shard_map swaps the sharded axis to the spatial-token
        # dim and back (one all-to-all each way, moving 1/N of the activation
        # per chip); the projections run inside on replicated kernels, so the
        # attention block's total comm is TWO a2a — ~4N x less than the K/V
        # gathers. GSPMD cannot be trusted to find this itself: a
        # with_sharding_constraint reshard here lowers to "involuntary full
        # rematerialization" (replicate + repartition). Token counts at every
        # UNet level divide the mesh (4096/1024/256/64 @512px); skip when
        # they don't.
        n_data = dict(mesh.shape).get("data", 1) if mesh is not None else 1
        if n_data > 1 and l % n_data == 0 and bf % n_data == 0:
            from jax.sharding import PartitionSpec as P

            def local_fn(xt, pe_r, *ws):
                # [bf/n, l, d] -> [bf, l/n, d]: full frames, 1/n tokens
                xt = jax.lax.all_to_all(
                    xt, axis_name="data", split_axis=1, concat_axis=0,
                    tiled=True,
                )
                out = body(xt, pe_r, *ws)
                return jax.lax.all_to_all(
                    out, axis_name="data", split_axis=0, concat_axis=1,
                    tiled=True,
                )

            spec = P("data", None, None)
            repl = P()
            return jax.shard_map(
                local_fn, mesh=mesh,
                in_specs=(spec, repl, repl, repl, repl, repl, repl),
                out_specs=spec,
            )(x, pe_rows, wq, wk, wv, wo, bo)
        return body(x, pe_rows, wq, wk, wv, wo, bo)


class MotionModule(nn.Module):
    """VanillaTemporalModule -> TemporalTransformer3DModel
    (motion_module.py:52-162)."""

    cfg: UNetADConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, video_ctx: VideoCtx):
        if not video_ctx.is_video:
            return x
        bf, hh, ww, c = x.shape
        residual = x
        h = GroupNorm(32, eps=1e-6, dtype=self.dtype, name="norm")(x)
        tokens = h.reshape(bf, hh * ww, c)
        tokens = nn.Dense(c, dtype=self.dtype, name="proj_in")(tokens)
        for bi in range(self.cfg.motion_num_blocks):
            for ai in range(self.cfg.motion_attention_layers):
                hn = nn.LayerNorm(dtype=self.dtype, name=f"block_{bi}_norm_{ai}")(tokens)
                tokens = tokens + TemporalSelfAttentionPE(
                    self.cfg.motion_num_heads,
                    self.cfg.motion_pe_max_len,
                    dtype=self.dtype,
                    name=f"block_{bi}_attn_{ai}",
                )(hn, video_ctx.num_frames, mesh=video_ctx.mesh)
            hn = nn.LayerNorm(dtype=self.dtype, name=f"block_{bi}_ff_norm")(tokens)
            tokens = tokens + FeedForwardGEGLU(
                c, dtype=self.dtype, name=f"block_{bi}_ff"
            )(hn)
        # zero-init so the motion module is identity before its ckpt loads
        tokens = nn.Dense(
            c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out"
        )(tokens)
        return tokens.reshape(bf, hh, ww, c) + residual


class ADSelfAttention(nn.Module):
    """Per-frame spatial self-attention with the (frame-local) PnP shift.

    Unlike the SD backbone there is NO cross-frame KV expansion (see module
    docstring); only the 3-branch AdaIN shift applies inside the window.
    Like the SD attention it supports capture (sow the projected K/V of a
    style-branch-only pass) and injection (2-branch [content | stylized]
    batch with the style K/V passed in StyleCtx.style_kv) — the exact
    decomposition of the legacy 3-branch batch used by the capture-and-
    inject stylization path (pipelines/sd.py), which keeps shard boundaries
    branch-aligned under frame-parallel meshes."""

    num_heads: int
    apply_pnp: bool
    pnp_slot: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, video_ctx: VideoCtx, style_ctx: Optional[StyleCtx]):
        d = x.shape[-1]
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(x)
        if self.apply_pnp and style_ctx is not None:
            if style_ctx.capture:
                self.sow("pnp_kv", f"slot_{self.pnp_slot}", (k, v))
            elif style_ctx.style_kv is not None:
                sk, sv = style_ctx.style_kv[self.pnp_slot]
                q, k, v = apply_style_shift_injected(
                    q, k, v, sk, sv, style_ctx.step_idx, style_ctx.cfg,
                    video_ctx.num_frames,
                )
            elif style_ctx.cfg is not None:
                q, k, v = apply_style_shift(
                    q, k, v, style_ctx.step_idx, style_ctx.cfg,
                    video_ctx.num_frames,
                )
        out = mha(q, k, v, self.num_heads)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(out)


class ADTransformerBlock(nn.Module):
    num_heads: int
    apply_pnp: bool
    pnp_slot: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, video_ctx, style_ctx):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + ADSelfAttention(
            self.num_heads, self.apply_pnp, pnp_slot=self.pnp_slot,
            dtype=self.dtype, name="attn1"
        )(h, video_ctx, style_ctx)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForwardGEGLU(x.shape[-1], dtype=self.dtype, name="ff")(h)
        return x


class ADTransformer(nn.Module):
    num_heads: int
    norm_num_groups: int
    apply_pnp: bool
    pnp_slot: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, video_ctx, style_ctx):
        bf, hh, ww, c = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, eps=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        tokens = h.reshape(bf, hh * ww, c)
        f = video_ctx.num_frames
        ctx = jnp.repeat(context, f, axis=0) if context.shape[0] != bf else context
        tokens = ADTransformerBlock(
            self.num_heads, self.apply_pnp, pnp_slot=self.pnp_slot,
            dtype=self.dtype, name="block"
        )(tokens, ctx, video_ctx, style_ctx)
        h = tokens.reshape(bf, hh, ww, c)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h + residual


class ADResnetBlock(nn.Module):
    """Per-frame 2D resnet (InflatedConv3d + InflatedGroupNorm semantics)."""

    out_channels: int
    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, video_ctx: VideoCtx):
        c_in = x.shape[-1]
        h = GroupNorm(self.norm_num_groups, eps=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        t = jnp.repeat(t, video_ctx.num_frames, axis=0)
        h = h + t[:, None, None, :]
        h = GroupNorm(self.norm_num_groups, eps=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class UNetAnimateDiff(nn.Module):
    """Full AnimateDiff UNet. Same call signature as UNetPseudo3D so the
    method layer (inversion / stylization scans) is shared unchanged."""

    cfg: UNetADConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep, context, video_ctx: VideoCtx,
                 style_ctx: Optional[StyleCtx] = None,
                 controlnet_residuals=None):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        n_blocks = len(cfg.block_out_channels)
        b = x.shape[0] // video_ctx.num_frames

        t_emb = timestep_embedding(jnp.broadcast_to(jnp.asarray(timestep), (b,)), ch0)
        temb = TimestepEmbedMLP(ch0 * 4, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        skips = [x]
        for bi in range(n_blocks):
            ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block):
                x = ADResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"down_{bi}_resnet_{li}")(x, temb, video_ctx)
                if cfg.down_block_has_attn[bi]:
                    x = ADTransformer(cfg.num_heads[bi], cfg.norm_num_groups, False,
                                      dtype=self.dtype, name=f"down_{bi}_attn_{li}")(
                        x, context, video_ctx, style_ctx)
                x = MotionModule(cfg, dtype=self.dtype,
                                 name=f"down_{bi}_motion_{li}")(x, video_ctx)
                skips.append(x)
            if bi < n_blocks - 1:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1, dtype=self.dtype,
                            name=f"down_{bi}_downsample")(x)
                skips.append(x)

        chm = cfg.block_out_channels[-1]
        x = ADResnetBlock(chm, cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_resnet_0")(x, temb, video_ctx)
        x = ADTransformer(cfg.num_heads[-1], cfg.norm_num_groups, False,
                          dtype=self.dtype, name="mid_attn_0")(
            x, context, video_ctx, style_ctx)
        if cfg.motion_mid_block:
            x = MotionModule(cfg, dtype=self.dtype, name="mid_motion")(x, video_ctx)
        x = ADResnetBlock(chm, cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_resnet_1")(x, temb, video_ctx)

        # SparseControlNet residuals: additive on every skip + the mid state
        # (reference AnimationPipeline controlnet path / diffusers ControlNet)
        if controlnet_residuals is not None:
            down_res, mid_res = controlnet_residuals
            assert len(down_res) == len(skips), (len(down_res), len(skips))
            skips = [s_ + r for s_, r in zip(skips, down_res)]
            x = x + mid_res

        captured = None
        rev_ch = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_heads))
        for bi in range(n_blocks):
            for li in range(cfg.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ADResnetBlock(rev_ch[bi], cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"up_{bi}_resnet_{li}")(x, temb, video_ctx)
                if cfg.up_block_has_attn[bi]:
                    is_pnp = (bi, li) in PNP_UP_ATTENTIONS
                    x = ADTransformer(
                        rev_heads[bi], cfg.norm_num_groups, is_pnp,
                        pnp_slot=(
                            PNP_SLOT_ORDER.index((bi, li)) if is_pnp else None
                        ),
                        dtype=self.dtype, name=f"up_{bi}_attn_{li}",
                    )(x, context, video_ctx, style_ctx)
                x = MotionModule(cfg, dtype=self.dtype,
                                 name=f"up_{bi}_motion_{li}")(x, video_ctx)
            if bi < n_blocks - 1:
                x = upsample_nearest_2x(x)
                x = nn.Conv(rev_ch[bi], (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{bi}_upsample")(x)
            if cfg.capture_up_block is not None and bi == cfg.capture_up_block:
                f = video_ctx.num_frames
                captured = x.reshape((b, f) + x.shape[1:])[0]

        x = GroupNorm(cfg.norm_num_groups, eps=1e-5, dtype=self.dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x, captured
