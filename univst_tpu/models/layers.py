"""Shared Flax building blocks for the video diffusion backbones.

Layout conventions (TPU-first, channels-last):
  * spatial feature maps: ``[B*F, H, W, C]`` with static ``num_frames`` carried
    in a :class:`VideoCtx`; B is the branch count (3 during stylization).
  * token sequences: ``[B*F, L, D]``.

The reference's runtime monkey-patching / ``setattr(module, 'idx', t)`` state
(video_diffusion_sd/pnp_utils.py:7-15,104-111) is replaced by two explicit
pytree arguments threaded through every ``__call__``:
  * :class:`VideoCtx` — static video shape + sparse-causal index set.
  * :class:`StyleCtx` — traced step index + static shift constants; ``None``
    outside stylization.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from univst_tpu.attention.ops import (
    apply_style_shift,
    apply_style_shift_injected,
    mha,
    video_mha,
)
from univst_tpu.core.config import FrameIndex, StyleShiftConfig


@flax.struct.dataclass
class VideoCtx:
    """Static video context.

    ``frame_indices`` mirrors the model-default SparseCausalAttention_index
    (video_diffusion_sd/models/attention.py:356) used by every attn1 layer.
    ``pnp_frame_indices`` is the index set of the 8 PATCHED decoder layers
    during stylization (pnp_utils.py:25, ``[-1, 'first']``) — the reference
    patches only those, so unpatched layers keep the 3-source default even
    inside video_style_transfer. ``None`` falls back to ``frame_indices``.

    ``mesh`` (a hashable ``jax.sharding.Mesh``, static) lets layers whose
    attention axis crosses shard boundaries place sharding constraints —
    the AnimateDiff motion modules reshard frame-sharded activations to
    token-sharded around their temporal attention (an all-to-all, Ulysses
    style) instead of letting GSPMD all-gather the full KV per module.
    """

    num_frames: int = flax.struct.field(pytree_node=False, default=1)
    frame_indices: Tuple[FrameIndex, ...] = flax.struct.field(
        pytree_node=False, default=(-1, 0, "first")
    )
    pnp_frame_indices: Optional[Tuple[FrameIndex, ...]] = flax.struct.field(
        pytree_node=False, default=None
    )
    mesh: Optional[Any] = flax.struct.field(pytree_node=False, default=None)

    @property
    def is_video(self) -> bool:
        return self.num_frames > 1

    @property
    def pnp_indices(self) -> Tuple[FrameIndex, ...]:
        return (
            self.frame_indices
            if self.pnp_frame_indices is None
            else self.pnp_frame_indices
        )


@flax.struct.dataclass
class StyleCtx:
    """Per-step stylization context (replaces register_time + patched attn).

    Three modes for the PnP attn1 layers:
      * plain shift (``cfg`` set): the legacy 3-branch batch
        [content | style | stylized]; the shift reads the style chunk in-batch.
      * inject (``style_kv`` set): 2-branch batch [content | stylized]; the
        style branch's projected K/V arrive precomputed per PnP slot — valid
        because style-trajectory frames are identical (a repeated style image),
        so the style branch runs once as a single frame (pipelines/sd.py
        style pre-pass).
      * capture (``capture=True``): sow the projected K/V of each PnP attn1
        into the 'pnp_kv' collection; no shift applied (the style branch
        itself is never shifted — reference pnp_utils.py:58-66 only replaces
        the third chunk).
    """

    step_idx: jnp.ndarray  # traced scalar int
    cfg: StyleShiftConfig = flax.struct.field(pytree_node=False, default=None)
    # tuple over PNP_SLOT_ORDER of (k, v), each [1, L_slot, D_slot]
    style_kv: Optional[Tuple] = None
    capture: bool = flax.struct.field(pytree_node=False, default=False)


def timestep_embedding(
    timesteps, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0
):
    """Sinusoidal timestep embedding, bit-matching diffusers get_timestep_embedding
    (used via Timesteps in unet_3d_condition.py:100)."""
    timesteps = jnp.atleast_1d(jnp.asarray(timesteps, jnp.float32))
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedMLP(nn.Module):
    """linear -> silu -> linear (diffusers TimestepEmbedding)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)


class GroupNorm(nn.Module):
    """GroupNorm over ``[B*F, H, W, C]`` with optional cross-frame statistics.

    torch GroupNorm on the reference's 5D ``[B, C, F, H, W]`` tensors computes
    stats over (C/g, F, H, W) — i.e. *spanning frames* (ResnetBlockPseudo3D
    norms, resnet.py:274-296). With ``across_frames=True`` and a video ctx we
    reproduce that; ``across_frames=False`` is the per-frame variant used
    inside transformer blocks (attention.py:69-71) and by AnimateDiff's
    InflatedGroupNorm.
    """

    num_groups: int = 32
    eps: float = 1e-5
    across_frames: bool = False
    num_frames: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        orig_dtype = x.dtype
        bf = x.shape[0]
        spatial = x.shape[1:-1]
        if self.across_frames and self.num_frames > 1:
            f = self.num_frames
            xg = x.reshape((bf // f, f) + spatial + (g, c // g))
        else:
            xg = x.reshape((bf,) + spatial + (g, c // g))
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        # One fused stats pass: sibling mean/mean-of-squares reductions with
        # fp32 accumulation over the original-dtype input (no materialized
        # fp32 copy), then one normalize pass. var = E[x^2] - E[x]^2 in fp32
        # is within bf16 input quantization for GN-scale statistics; the
        # two-pass formulation measured 23 ms/step of the SD1.5 solo step.
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        sq = jnp.mean(jax.lax.square(xf), axis=axes, keepdims=True)
        var = jnp.maximum(sq - jax.lax.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        # fold the per-channel affine into the per-group scalars where shapes
        # allow XLA to fuse everything into a single elementwise pass
        xn = (xf - mean) * inv
        out = xn.reshape(x.shape) * scale + bias
        return out.astype(orig_dtype)


class FeedForwardGEGLU(nn.Module):
    """GEGLU MLP (diffusers FeedForward with activation_fn='geglu').

    NOTE (round-5 negative result): reformulating the exact-erf gelu with a
    single fp32 round trip (cast once, erf, cast back) did NOT remove the
    fp32 convert materializations XLA splits around its erf expansion
    (~670 MB at the AD motion-module 64x64 shape) — same HLO pattern, no
    measured win — while the changed bf16 rounding order MOVED the committed
    full-pipeline goldens. jax.nn.gelu stays."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class SelfAttention(nn.Module):
    """Sparse-causal spatial self-attention with optional 3-branch AdaIN shift.

    Rebuild of SparseCausalAttention (video_diffusion_sd/models/attention.py:349)
    + the PnP-patched forward (pnp_utils.py:18-100): the cross-frame KV gather
    and the style shift are applied to the projected q/k/v as pure functions.
    Shift order matches the reference: shift first, then KV expansion.
    """

    num_heads: int
    apply_pnp: bool = False  # is this one of the 8 registered decoder attn1s?
    pnp_slot: Optional[int] = None  # index into PNP_SLOT_ORDER / StyleCtx.style_kv
    zero_out_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, video_ctx: VideoCtx, style_ctx: Optional[StyleCtx] = None):
        d = x.shape[-1]
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(x)

        # The reference patches ONLY the 8 decoder attn1 layers: those use the
        # PnP index set ([-1,'first'], pnp_utils.py:25) during stylization,
        # every other layer keeps the model default [-1,0,'first']
        # (models/attention.py:356). Outside stylization everything uses the
        # default.
        indices = video_ctx.frame_indices
        if self.apply_pnp and style_ctx is not None:
            indices = video_ctx.pnp_indices
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
                    q, k, v, style_ctx.step_idx, style_ctx.cfg, video_ctx.num_frames
                )
        if video_ctx.is_video and indices:
            out = video_mha(
                q, k, v, self.num_heads, video_ctx.num_frames, indices,
            )
        else:
            out = mha(q, k, v, self.num_heads)
        kernel_init = (
            nn.initializers.zeros if self.zero_out_init else nn.initializers.lecun_normal()
        )
        return nn.Dense(d, dtype=self.dtype, kernel_init=kernel_init, name="to_out")(out)


class CrossAttention(nn.Module):
    """Text cross-attention (diffusers CrossAttention / attn2)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        d = x.shape[-1]
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(context)
        out = mha(q, k, v, self.num_heads)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(out)


class TemporalSelfAttention(nn.Module):
    """Temporal attention over the frame axis per spatial location.

    Zero-initialized output projection so the video model equals the 2D model
    at init (reference attention.py:225-233).
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        bf, l, d = x.shape
        b = bf // num_frames
        f = num_frames
        dh = d // self.num_heads
        # projections on the [B*F, L, D] layout, then CANONICAL batched
        # matmuls on [b*l*h, f, dh]: the earlier (b, l, h)-batched einsum on
        # the native layout lowered on TPU as `convolution-base-dilated`
        # ops — XLA's batch-dims-as-spatial path, measured at 19 effective
        # TFLOPS on the AnimateDiff motion module's identical pattern
        # (models/unet_ad.py TemporalSelfAttentionPE, BENCH_NOTES round 5).
        # This path is inert for random-weight benches (identity-elision),
        # but runs with real temporal weights — same fix applied here.
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(x)

        def bfh(t):
            return t.reshape(b, f, l, self.num_heads, dh).transpose(
                0, 2, 3, 1, 4).reshape(b * l * self.num_heads, f, dh)

        qt, kt, vt = bfh(q), bfh(k), bfh(v)
        logits = jax.lax.dot_general(
            qt, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (dh**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
        out = jax.lax.dot_general(probs, vt, (((2,), (1,)), ((0,), (0,))))
        out = out.reshape(b, l, self.num_heads, f, dh).transpose(
            0, 3, 1, 2, 4).reshape(bf, l, d)
        return nn.Dense(
            d, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="to_out"
        )(out)


class PseudoConv3d(nn.Module):
    """2D spatial conv + temporal 1D conv, the pseudo-3D inflation
    (reference resnet.py:12-80).

    The temporal conv is dirac-initialized (identity over the frame axis,
    resnet.py:54-55) so loading 2D weights preserves the 2D function exactly.
    Skipped when kernel_size == 1 or for non-video input, matching reference.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    temporal: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, video_ctx: VideoCtx):
        ks = self.kernel_size
        x = nn.Conv(
            self.features,
            (ks, ks),
            strides=(self.strides, self.strides),
            padding=[(ks // 2, ks // 2)] * 2,
            dtype=self.dtype,
            name="spatial",
        )(x)
        if not self.temporal or ks <= 1 or not video_ctx.is_video:
            return x
        f = video_ctx.num_frames
        bf, h, w, c = x.shape
        b = bf // f
        # Conv1d over frames as a (ks, 1) conv on [B, F, H*W, C]: the reshape
        # of contiguous axes is free, unlike the (b h w) f c transpose which
        # physically relayouts the tensor twice per conv.
        xt = x.reshape(b, f, h * w, c)

        def dirac_init(key, shape, dtype=jnp.float32):
            # shape = (ks, 1, in, out); identity tap at the center
            kernel = jnp.zeros(shape, dtype)
            return kernel.at[shape[0] // 2, 0].set(
                jnp.eye(shape[2], shape[3], dtype=dtype)
            )

        xt = nn.Conv(
            c,
            (ks, 1),
            padding=[(ks // 2, ks // 2), (0, 0)],
            kernel_init=dirac_init,
            dtype=self.dtype,
            name="temporal",
        )(xt)
        return xt.reshape(bf, h, w, c)


def upsample_nearest_2x(x):
    """[N, H, W, C] -> [N, 2H, 2W, C] nearest (reference resnet.py:145)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
