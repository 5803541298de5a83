"""SD3 / SD3.5 MMDiT in Flax with native video (cross-frame) attention.

Rebuild of the model the reference drives through diffusers
(CustomSD3Transformer2DModel, backbones/video_diffusion_sd3/models/
transformer_3D_model.py:12-113) plus the video attention processors
(backbones/video_diffusion_sd3/pnp_utils.py:9-271). Key structural facts:

  * patchify (p=2) + fixed 2D sin-cos positional embedding (center-cropped
    from a pos_embed_max_size grid);
  * joint transformer blocks: AdaLayerNormZero on both streams, joint
    attention over [image tokens || context tokens] (image first), gated
    residuals, gelu-tanh MLPs; the last block is context_pre_only;
  * video support lives entirely in attention: image-token K/V are expanded
    with sparse-causal frame gathers ('first', -1, 0; clip_length=16 hardcoded
    in the reference, sd3 pnp_utils.py:26-27) after the q/k norms, and the
    3-branch AdaIN shift applies per-head before the expansion — both are
    explicit function arguments here instead of swapped attention processors;
  * feature capture: hidden tokens after block ``capture_block`` reshaped to
    [F, h/p, w/p, D] (transformer_3D_model.py:76-83).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.attention.ops import (
    apply_style_shift_sd3_injected,
    apply_style_shift_sd3,
    heads_attention,
    joint_video_attention_tokens,
)
from univst_tpu.models.layers import StyleCtx, TimestepEmbedMLP, VideoCtx, timestep_embedding


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    num_heads: int = 24
    head_dim: int = 64
    joint_attention_dim: int = 4096  # context input width (T5 / padded CLIP)
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # None (SD3.0) | 'rms' (SD3.5)
    # blocks with an extra image-stream self-attention (SD3.5-medium)
    dual_attention_layers: Tuple[int, ...] = ()
    capture_block: Optional[int] = None

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim

    @staticmethod
    def sd3_medium(**kw) -> "MMDiTConfig":
        return MMDiTConfig(**kw)

    @staticmethod
    def sd35_large(**kw) -> "MMDiTConfig":
        return MMDiTConfig(num_layers=38, num_heads=38, qk_norm="rms", **kw)

    @staticmethod
    def sd35_medium(**kw) -> "MMDiTConfig":
        # the reference CLIs default to stabilityai/stable-diffusion-3.5-medium
        # (src/sd3/run_content_inversion_sd3.py:103): 24 layers, qk RMS norm,
        # dual attention in blocks 0..12
        return MMDiTConfig(qk_norm="rms",
                           dual_attention_layers=tuple(range(13)), **kw)

    @staticmethod
    def tiny(**kw) -> "MMDiTConfig":
        base = dict(num_layers=2, num_heads=2, head_dim=16, joint_attention_dim=64,
                    pooled_projection_dim=32, pos_embed_max_size=16)
        base.update(kw)
        return MMDiTConfig(**base)


def extract_mmdit_style_kv(pnp_vars) -> dict:
    """Flatten the sown 'pnp_kv' collection of a capture-mode MMDiT forward
    into {"joint": tuple over blocks of (k, v), "dual": tuple over
    dual-attention blocks of (k, v)} — the StyleCtx.style_kv layout the
    injected SD3 shift consumes."""
    joint, dual = {}, {}

    def rec(tree):
        for key, val in tree.items():
            if key.startswith("slot_"):
                joint[int(key[5:])] = val[0]
            elif key.startswith("dual_"):
                dual[int(key[5:])] = val[0]
            else:
                rec(val)

    rec(pnp_vars)
    return {
        "joint": tuple(joint[i] for i in range(len(joint))),
        "dual": tuple(dual[i] for i in range(len(dual))),
    }


def sincos_pos_embed_2d(dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding (diffusers get_2d_sincos_pos_embed)."""
    def one_axis(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    grid = np.meshgrid(gw, gh)  # w first, matching diffusers
    # Channel-half order quirk: diffusers/MAE get_2d_sincos_pos_embed_from_grid
    # names its first half "emb_h" but feeds it grid[0] — which after
    # meshgrid(grid_w, grid_h) is the W coordinate. Pretrained SD3 weights
    # therefore expect [w-embedding | h-embedding], and the converter discards
    # the checkpoint's own pos_embed buffer (convert.py) — so this order is
    # load-bearing for checkpoint parity (pinned by a formula-verbatim oracle
    # in tests/test_mmdit.py).
    emb_w = one_axis(dim // 2, grid[0])
    emb_h = one_axis(dim // 2, grid[1])
    return np.concatenate([emb_w, emb_h], axis=1).astype(np.float32)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf * scale).astype(x.dtype)


class AdaLNZero(nn.Module):
    """silu(temb) -> Linear -> n_chunks modulation vectors.

    diffusers zero-inits this linear (gates = 0 => inert blocks); real
    checkpoints overwrite it, so we use a small random init instead to keep
    random-weight tests/benches structurally live (same FLOPs either way)."""

    n_chunks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb, dim):
        mod = nn.Dense(
            self.n_chunks * dim, kernel_init=nn.initializers.normal(0.02),
            dtype=self.dtype, name="linear",
        )(nn.silu(temb))
        return jnp.split(mod[:, None, :], self.n_chunks, axis=-1)


def _ln(x):
    """LayerNorm without affine params, eps 1e-6 (diffusers block norms)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


class GeluMLP(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class JointAttention(nn.Module):
    """Joint attention over image+context tokens with video semantics."""

    cfg: MMDiTConfig
    context_pre_only: bool
    slot: Optional[int] = None  # block index, for StyleCtx capture/injection
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, video_ctx: VideoCtx, style_ctx: Optional[StyleCtx]):
        c = self.cfg
        d = c.hidden
        bf, n, _ = x.shape
        nctx = ctx.shape[1]

        # TOKEN-MAJOR per-head layout [bf, L, H, dh] — a free reshape of the
        # projection output. The folded attention kernel addresses the head
        # axis via its BlockSpec index map, so no [L, H] transpose ever
        # materializes on the q/k/v/out path (joint_video_attention_tokens).
        def split(y):
            return y.reshape(bf, -1, c.num_heads, c.head_dim)

        q = split(nn.Dense(d, dtype=self.dtype, name="to_q")(x))
        k = split(nn.Dense(d, dtype=self.dtype, name="to_k")(x))
        v = split(nn.Dense(d, dtype=self.dtype, name="to_v")(x))
        if c.qk_norm == "rms":
            q = RMSNorm(dtype=self.dtype, name="norm_q")(q)
            k = RMSNorm(dtype=self.dtype, name="norm_k")(k)

        # 3-branch AdaIN shift on the image-token q/k/v (sd3 pnp_utils.py:181-194);
        # capture / injected forms serve the single-frame style fast path
        # (identical style frames — see pipelines/sd.py style pre-pass notes)
        if style_ctx is not None and style_ctx.capture:
            self.sow("pnp_kv", f"slot_{self.slot}", (k, v))
        elif style_ctx is not None and style_ctx.style_kv is not None:
            sk, sv = style_ctx.style_kv["joint"][self.slot]
            q, k, v = apply_style_shift_sd3_injected(
                q, k, v, sk, sv, style_ctx.step_idx, style_ctx.cfg,
                video_ctx.num_frames, token_major=True,
            )
        elif style_ctx is not None and style_ctx.cfg is not None:
            q, k, v = apply_style_shift_sd3(
                q, k, v, style_ctx.step_idx, style_ctx.cfg,
                video_ctx.num_frames, token_major=True,
            )
        cq = split(nn.Dense(d, dtype=self.dtype, name="add_q_proj")(ctx))
        ck = split(nn.Dense(d, dtype=self.dtype, name="add_k_proj")(ctx))
        cv = split(nn.Dense(d, dtype=self.dtype, name="add_v_proj")(ctx))
        if c.qk_norm == "rms":
            cq = RMSNorm(dtype=self.dtype, name="norm_added_q")(cq)
            ck = RMSNorm(dtype=self.dtype, name="norm_added_k")(ck)

        # joint attention over [img*slots | ctx] with the sparse-causal
        # cross-frame expansion (sd3 pnp_utils.py:53-84); on TPU the fused
        # video kernel streams the unexpanded per-frame KV + masked ctx block
        idx = (tuple(video_ctx.frame_indices)
               if video_ctx.is_video and video_ctx.frame_indices else ())
        out = joint_video_attention_tokens(
            q, k, v, video_ctx.num_frames if idx else 1, idx,
            cq=cq, ck=ck, cv=cv,
        )
        out = out.reshape(bf, -1, d)
        x_out, ctx_out = out[:, :n], out[:, n:]
        x_out = nn.Dense(d, dtype=self.dtype, name="to_out")(x_out)
        if self.context_pre_only:
            return x_out, None
        ctx_out = nn.Dense(d, dtype=self.dtype, name="to_add_out")(ctx_out)
        return x_out, ctx_out


class DualSelfAttention(nn.Module):
    """The extra image-stream self-attention of SD3.5-medium dual blocks
    (diffusers attn2 in JointTransformerBlock with use_dual_attention). The
    reference's video processors register on every '*attn*' processor
    (sd3 pnp_utils.py:276-286), so cross-frame KV + the style shift apply
    here too."""

    cfg: MMDiTConfig
    slot: Optional[int] = None  # position among dual-attention blocks
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, video_ctx: VideoCtx, style_ctx: Optional[StyleCtx]):
        c = self.cfg
        d = c.hidden
        bf = x.shape[0]

        # token-major layout — see JointAttention
        def split(y):
            return y.reshape(bf, -1, c.num_heads, c.head_dim)

        q = split(nn.Dense(d, dtype=self.dtype, name="to_q")(x))
        k = split(nn.Dense(d, dtype=self.dtype, name="to_k")(x))
        v = split(nn.Dense(d, dtype=self.dtype, name="to_v")(x))
        if c.qk_norm == "rms":
            q = RMSNorm(dtype=self.dtype, name="norm_q")(q)
            k = RMSNorm(dtype=self.dtype, name="norm_k")(k)
        if style_ctx is not None and style_ctx.capture:
            self.sow("pnp_kv", f"dual_{self.slot}", (k, v))
        elif style_ctx is not None and style_ctx.style_kv is not None:
            sk, sv = style_ctx.style_kv["dual"][self.slot]
            q, k, v = apply_style_shift_sd3_injected(
                q, k, v, sk, sv, style_ctx.step_idx, style_ctx.cfg,
                video_ctx.num_frames, token_major=True,
            )
        elif style_ctx is not None and style_ctx.cfg is not None:
            q, k, v = apply_style_shift_sd3(
                q, k, v, style_ctx.step_idx, style_ctx.cfg,
                video_ctx.num_frames, token_major=True,
            )
        idx = (tuple(video_ctx.frame_indices)
               if video_ctx.is_video and video_ctx.frame_indices else ())
        out = joint_video_attention_tokens(
            q, k, v, video_ctx.num_frames if idx else 1, idx
        )
        out = out.reshape(bf, -1, d)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(out)


class JointBlock(nn.Module):
    cfg: MMDiTConfig
    context_pre_only: bool
    dual_attention: bool = False
    slot: Optional[int] = None       # block index (style K/V capture/injection)
    dual_slot: Optional[int] = None  # position among dual-attention blocks
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, temb, video_ctx, style_ctx):
        d = self.cfg.hidden
        if self.dual_attention:
            # SD35AdaLayerNormZeroX: 9 modulation chunks
            (sm, scm, gm, smlp, sclp, gmlp, sm2, scm2, gm2) = AdaLNZero(
                9, self.dtype, name="norm1"
            )(temb, d)
        else:
            sm, scm, gm, smlp, sclp, gmlp = AdaLNZero(6, self.dtype, name="norm1")(
                temb, d
            )
        xh = _ln(x) * (1 + scm) + sm
        if self.context_pre_only:
            # AdaLayerNormContinuous chunk order is (scale, shift)
            css, cs = AdaLNZero(2, self.dtype, name="norm1_context")(temb, d)
            ch = _ln(ctx) * (1 + css) + cs
            cgm = cglp = csmlp = csclp = None
        else:
            cs, css, cgm, csmlp, csclp, cglp = AdaLNZero(6, self.dtype, name="norm1_context")(
                temb, d
            )
            ch = _ln(ctx) * (1 + css) + cs
        if self.dual_attention:
            # both attentions read the PRE-block hidden state, each with its
            # own modulation (diffusers SD35AdaLayerNormZeroX semantics)
            xh2 = _ln(x) * (1 + scm2) + sm2
        attn_x, attn_c = JointAttention(
            self.cfg, self.context_pre_only, slot=self.slot, dtype=self.dtype,
            name="attn",
        )(xh, ch, video_ctx, style_ctx)
        x = x + gm * attn_x
        if self.dual_attention:
            x = x + gm2 * DualSelfAttention(
                self.cfg, slot=self.dual_slot, dtype=self.dtype, name="attn2"
            )(xh2, video_ctx, style_ctx)
        h = _ln(x) * (1 + sclp) + smlp
        x = x + gmlp * GeluMLP(d, dtype=self.dtype, name="ff")(h)
        if self.context_pre_only:
            return x, None
        ctx = ctx + cgm * attn_c
        h = _ln(ctx) * (1 + csclp) + csmlp
        ctx = ctx + cglp * GeluMLP(d, dtype=self.dtype, name="ff_context")(h)
        return x, ctx


class MMDiT(nn.Module):
    """Full model. __call__:
      x: [B*F, h, w, C] latents; timestep: scalar or [B*F];
      context: [B, L, joint_attention_dim]; pooled: [B, pooled_dim].
    Returns (velocity prediction [B*F, h, w, C], captured feature or None).
    """

    cfg: MMDiTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep, context, pooled, video_ctx: VideoCtx,
                 style_ctx: Optional[StyleCtx] = None):
        c = self.cfg
        d = c.hidden
        p = c.patch_size
        bf, hh, ww, ch_in = x.shape
        gh, gw = hh // p, ww // p

        # patchify: [B*F, gh, gw, p*p*C] -> Dense == Conv(p, stride p)
        patches = x.reshape(bf, gh, p, gw, p, ch_in).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(bf, gh * gw, p * p * ch_in)
        tokens = nn.Dense(d, dtype=self.dtype, name="patch_proj")(patches)
        # center-cropped fixed sin-cos positional embedding
        full = sincos_pos_embed_2d(d, c.pos_embed_max_size, c.pos_embed_max_size)
        full = full.reshape(c.pos_embed_max_size, c.pos_embed_max_size, d)
        top = (c.pos_embed_max_size - gh) // 2
        left = (c.pos_embed_max_size - gw) // 2
        pos = jnp.asarray(full[top : top + gh, left : left + gw].reshape(1, gh * gw, d))
        tokens = tokens + pos.astype(tokens.dtype)

        # combined timestep + pooled-text embedding
        t = jnp.broadcast_to(jnp.asarray(timestep), (bf,))
        t_emb = timestep_embedding(t, 256).astype(self.dtype)
        temb = TimestepEmbedMLP(d, dtype=self.dtype, name="timestep_embedder")(t_emb)
        f = video_ctx.num_frames
        pooled_r = jnp.repeat(pooled, f, axis=0) if pooled.shape[0] != bf else pooled
        temb = temb + TimestepEmbedMLP(d, dtype=self.dtype, name="text_embedder")(
            pooled_r.astype(self.dtype)
        )

        ctx = nn.Dense(d, dtype=self.dtype, name="context_embedder")(
            (jnp.repeat(context, f, axis=0) if context.shape[0] != bf else context
             ).astype(self.dtype)
        )

        captured = None
        for i in range(c.num_layers):
            pre_only = i == c.num_layers - 1
            dual = i in c.dual_attention_layers
            tokens, ctx = JointBlock(
                c, pre_only, dual_attention=dual, slot=i,
                dual_slot=(sorted(c.dual_attention_layers).index(i) if dual else None),
                dtype=self.dtype, name=f"block_{i}",
            )(tokens, ctx, temb, video_ctx, style_ctx)
            if c.capture_block is not None and i == c.capture_block:
                # reference saves hidden.view(B, h/2, w/2, -1)
                # (transformer_3D_model.py:82) — frames are the batch here
                captured = tokens.reshape(bf, gh, gw, d)

        # AdaLayerNormContinuous output head (chunk order: scale, shift)
        mod = nn.Dense(
            2 * d, kernel_init=nn.initializers.normal(0.02), dtype=self.dtype,
            name="norm_out_linear",
        )(nn.silu(temb))
        scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
        tokens = _ln(tokens) * (1 + scale) + shift
        out = nn.Dense(p * p * c.out_channels, dtype=self.dtype, name="proj_out")(tokens)
        # unpatchify
        out = out.reshape(bf, gh, gw, p, p, c.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(bf, gh * p, gw * p, c.out_channels)
        return out, captured
