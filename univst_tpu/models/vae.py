"""Flax VAEs: the standard SD KL autoencoder and the SVD temporal-decoder
variant.

The SD / AnimateDiff runners deliberately pair the SD UNet with the
*stable-video-diffusion* VAE ("use 3d vae for more stable results",
src/sd/run_content_inversion_sd.py:41-42 — diffusers
``AutoencoderKLTemporalDecoder``): a standard KL encoder plus a decoder whose
resnet blocks mix in a temporal (frame-axis) resnet via a learned alpha
blender. SD3 uses the plain ``AutoencoderKL`` with 16 latent channels.

Layout: pixels and latents are ``[F, H, W, C]`` (frames as batch).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from univst_tpu.models.layers import GroupNorm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    temporal_decoder: bool = False  # SVD-style decoder (frame mixing)

    @staticmethod
    def svd(**kw) -> "VAEConfig":
        """stabilityai/stable-video-diffusion-img2vid `vae` subfolder config."""
        return VAEConfig(temporal_decoder=True, **kw)

    @staticmethod
    def sd3(**kw) -> "VAEConfig":
        return VAEConfig(
            latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609, **kw
        )

    @staticmethod
    def tiny(**kw) -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4, **kw
        )


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = GroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """Frame-axis resnet with (3,1,1) convs (diffusers TemporalResnetBlock)."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        # frame-axis convs as (3, 1) convs on the free [B, F, H*W, C] view
        # (contiguous reshape, no physical transposes)
        f = num_frames
        bf, hh, ww, c = x.shape
        b = bf // f

        def to_t(y):
            return y.reshape(b, f, hh * ww, y.shape[-1])

        def from_t(y):
            return y.reshape(b * f, hh, ww, y.shape[-1])

        h = GroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype, name="conv1")(to_t(h))
        h = from_t(h)
        h = GroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype, name="conv2")(to_t(h))
        h = from_t(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mix (diffusers AlphaBlender, 'learned' strategy)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,), jnp.float32)
        alpha = jax.nn.sigmoid(mix).astype(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet + temporal resnet + alpha blend (SVD temporal decoder)."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int):
        h = VAEResnetBlock(self.out_channels, self.groups, self.dtype, name="spatial")(x)
        # Applied at EVERY frame count, matching diffusers
        # SpatioTemporalResBlock: a zero-padded temporal conv over one frame
        # is w[center]*x + b, NOT identity, so skipping it at F=1 would
        # diverge from the reference decoder under real weights (and change
        # the param tree between F=1 and F>1 builds).
        ht = TemporalResnetBlock(
            self.out_channels, self.groups, self.dtype, name="temporal"
        )(h, num_frames)
        return AlphaBlender(self.dtype, name="time_mixer")(h, ht)


class VAEAttention(nn.Module):
    """Single-head self-attention at the bottleneck (diffusers Attention in VAE)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, hh, ww, c = x.shape
        h = GroupNorm(self.groups, eps=1e-6, dtype=self.dtype, name="norm")(x)
        tokens = h.reshape(n, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(tokens)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(tokens)
        logits = jnp.einsum("btd,bsd->bts", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bts,bsd->btd", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(n, hh, ww, c)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = cfg.norm_num_groups
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, g, self.dtype, name=f"down_{bi}_res_{li}")(x)
            if bi < len(cfg.block_out_channels) - 1:
                # torch uses asymmetric pad (0,1,0,1) for stride-2 VAE downsample
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    ch, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
                    name=f"down_{bi}_conv",
                )(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnetBlock(ch, g, self.dtype, name="mid_res_0")(x)
        x = VAEAttention(g, self.dtype, name="mid_attn")(x)
        x = VAEResnetBlock(ch, g, self.dtype, name="mid_res_1")(x)
        x = GroupNorm(g, eps=1e-6, dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        # quant_conv (1x1) maps moments -> moments
        x = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(x)
        return x  # [F, h, w, 2*latent]: mean || logvar


class Decoder(nn.Module):
    """Standard KL decoder; with cfg.temporal_decoder=True every resnet becomes
    a SpatioTemporalResBlock and a (3,1,1) time conv finishes the stack
    (diffusers TemporalDecoder)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, num_frames: int = 1):
        cfg = self.cfg
        g = cfg.norm_num_groups
        temporal = cfg.temporal_decoder

        def res(ch, name):
            if temporal:
                blk = SpatioTemporalResBlock(ch, g, self.dtype, name=name)
                return lambda y: blk(y, num_frames)
            blk = VAEResnetBlock(ch, g, self.dtype, name=name)
            return blk

        if not temporal:
            z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = res(ch, "mid_res_0")(x)
        x = VAEAttention(g, self.dtype, name="mid_attn")(x)
        x = res(ch, "mid_res_1")(x)
        rev = list(reversed(cfg.block_out_channels))
        n_up_layers = cfg.layers_per_block + 1
        for bi, ch in enumerate(rev):
            for li in range(n_up_layers):
                x = res(ch, f"up_{bi}_res_{li}")(x)
            if bi < len(rev) - 1:
                n, hh, ww, c = x.shape
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :], (n, hh, 2, ww, 2, c)
                ).reshape(n, hh * 2, ww * 2, c)
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{bi}_conv")(x)
        x = GroupNorm(g, eps=1e-6, dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        if temporal:
            # time_conv_out: frame-axis conv on the free [B, F, H*W, C] view;
            # applied at every frame count (diffusers TemporalDecoder applies
            # it unconditionally — see TemporalResBlock note above)
            f = num_frames
            n, hh, ww, c = x.shape
            b = n // f
            xt = x.reshape(b, f, hh * ww, c)
            xt = nn.Conv(c, (3, 1), padding=[(1, 1), (0, 0)], dtype=self.dtype,
                         name="time_conv_out")(xt)
            x = xt.reshape(n, hh, ww, c)
        return x


class AutoencoderKL(nn.Module):
    """encode() -> (mean, logvar); decode(z) -> pixels. Scaling/shift factors
    are applied by the caller (pipelines), matching the reference."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)

    def encode(self, x):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z, num_frames: int = 1):
        return self.decoder(z, num_frames=num_frames)

    def __call__(self, x, num_frames: int = 1):
        mean, logvar = self.encode(x)
        return self.decode(mean, num_frames=num_frames), (mean, logvar)


def sample_latent(mean, logvar, key):
    """Reparameterized sample from the posterior (DiagonalGaussian.sample)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
