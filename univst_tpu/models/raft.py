"""RAFT-large optical flow in Flax (the reference's smoother uses torchvision
RAFT, src/cal_optica_flow.py:4,51-54).

Architecture per the RAFT paper / princeton-vl reference implementation:
feature + context encoders (residual CNNs at 1/8 resolution), an all-pairs
4-level correlation pyramid with radius-4 bilinear lookups, and a recurrent
SepConvGRU update block with convex upsampling. The converter targets the
canonical princeton-vl checkpoint layout (``fnet.* / cnet.* / update_block.*``,
``module.`` prefixes stripped) used by raft-things.pth / raft-sintel.pth.

With no checkpoint the built-in pyramidal Lucas-Kanade flow
(methods/flow.py) remains the default estimator; converted RAFT plugs into the
same ``flow_fn(img1, img2) -> flow`` interface via :func:`make_raft_flow`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    encoder_dims: Tuple[int, ...] = (64, 64, 96, 128)  # stem + 3 stages
    encoder_out: int = 256

    @staticmethod
    def tiny(**kw) -> "RAFTConfig":
        return RAFTConfig(
            hidden_dim=16, context_dim=16, corr_levels=2, corr_radius=2,
            iters=2, encoder_dims=(8, 8, 12, 16), encoder_out=32, **kw
        )


class _InstanceNorm(nn.Module):
    """Per-sample, per-channel norm over (H, W) (torch InstanceNorm2d,
    affine=False by default in RAFT encoders)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)


class _FoldedBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = x * scale + bias with scale/bias folded
    from (weight, bias, running_mean, running_var) by the converter."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


def _norm(kind: str, dtype, name: str):
    if kind == "instance":
        return _InstanceNorm(dtype=dtype, name=name)
    return _FoldedBatchNorm(dtype=dtype, name=name)


class ResidualBlock(nn.Module):
    out_ch: int
    stride: int = 1
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_ch, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_norm(self.norm, self.dtype, "norm1")(y))
        y = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_norm(self.norm, self.dtype, "norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample")(x)
            x = _norm(self.norm, self.dtype, "norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """fnet/cnet: 7x7/2 stem + 3 residual stages (strides 1,2,2) + 1x1 out."""

    cfg: RAFTConfig
    out_ch: int
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.cfg.encoder_dims
        x = nn.Conv(d[0], (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(_norm(self.norm, self.dtype, "norm1")(x))
        for si, (ch, stride) in enumerate(((d[1], 1), (d[2], 2), (d[3], 2))):
            x = ResidualBlock(ch, stride, self.norm, self.dtype,
                              name=f"layer{si + 1}_0")(x)
            x = ResidualBlock(ch, 1, self.norm, self.dtype,
                              name=f"layer{si + 1}_1")(x)
        return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv2")(x)


def _corr_pyramid(fmap1, fmap2, levels: int):
    """All-pairs correlation + average pooling pyramid.
    fmap: [B, H, W, D] -> list of [B*H*W, h_l, w_l] volumes."""
    b, h, w, d = fmap1.shape
    f1 = fmap1.reshape(b, h * w, d).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, d).astype(jnp.float32)
    corr = jnp.einsum("bnd,bmd->bnm", f1, f2) / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h * w, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        c = pyramid[-1]
        hh, ww = c.shape[1] // 2, c.shape[2] // 2
        c = c[:, : hh * 2, : ww * 2].reshape(-1, hh, 2, ww, 2).mean(axis=(2, 4))
        pyramid.append(c)
    return pyramid


def _corr_lookup(pyramid, coords, radius: int):
    """Bilinear (2r+1)^2 neighborhood lookup at each level.
    coords: [B, H, W, 2] (x, y) at 1/8 res. Returns [B, H, W, L*(2r+1)^2]."""
    b, h, w, _ = coords.shape
    n = b * h * w
    out = []
    r = radius
    # Channel-enumeration quirk: princeton-vl/torchvision CorrBlock builds
    # delta = meshgrid(dy, dx) ('ij') and adds delta[..., 0] — the SLOW axis —
    # to the x coordinate, so the flattened (2r+1)^2 correlation channels
    # enumerate the x-offset slowest. The learned convc1 weights are trained
    # against that order; match it exactly (pinned by a formula-verbatim
    # oracle in tests/test_raft.py).
    ox, oy = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                         indexing="ij")
    offsets = jnp.asarray(np.stack([ox, oy], -1).reshape(-1, 2), jnp.float32)
    flat = coords.reshape(n, 2)
    for lvl, c in enumerate(pyramid):
        ctr = flat / (2.0**lvl)
        sx = ctr[:, None, 0] + offsets[None, :, 0]  # [n, K]
        sy = ctr[:, None, 1] + offsets[None, :, 1]

        def sample(vol, sx=sx, sy=sy):
            # vol: [n, hl, wl]; per-row bilinear gather
            k = sx.shape[1]
            coords2 = jnp.stack([sy, sx])  # order (row, col)

            def one(v, cy, cx):
                return jax.scipy.ndimage.map_coordinates(
                    v, [cy, cx], order=1, mode="constant", cval=0.0
                )

            return jax.vmap(one)(vol, coords2[0], coords2[1])

        out.append(sample(c))
    return jnp.concatenate(out, axis=-1).reshape(b, h, w, -1)


class SepConvGRU(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (1, 5), padding=(0, 2),
                                   dtype=self.dtype, name="convz1")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (1, 5), padding=(0, 2),
                                   dtype=self.dtype, name="convr1")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (1, 5), padding=(0, 2),
                             dtype=self.dtype, name="convq1")(
            jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (5, 1), padding=(2, 0),
                                   dtype=self.dtype, name="convz2")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (5, 1), padding=(2, 0),
                                   dtype=self.dtype, name="convr2")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (5, 1), padding=(2, 0),
                             dtype=self.dtype, name="convq2")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class UpdateBlock(nn.Module):
    cfg: RAFTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, inp, corr, flow):
        c = self.cfg
        # BasicMotionEncoder
        co = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        co = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype, name="convc2")(co))
        fl = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype, name="convf1")(flow))
        fl = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="convf2")(fl))
        mo = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=self.dtype, name="conv")(
            jnp.concatenate([co, fl], axis=-1)))
        motion = jnp.concatenate([mo, flow], axis=-1)  # 128
        x = jnp.concatenate([inp, motion], axis=-1)
        h = SepConvGRU(c.hidden_dim, dtype=self.dtype, name="gru")(h, x)
        # flow head
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="flow_head_conv1")(h))
        delta = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                        name="flow_head_conv2")(d)
        # convex upsampling mask (scaled .25 like the reference impl)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="mask_conv1")(h))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_conv2")(m)
        return h, delta, mask


def _convex_upsample(flow, mask):
    """8x convex upsampling: per output pixel a softmax-weighted combination of
    the 3x3 coarse neighborhood. flow [B,h,w,2], mask [B,h,w,576]."""
    b, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(b, h, w, 8, 8, 9), axis=-1)
    f = flow * 8.0
    # 3x3 neighborhoods of the coarse flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fp[:, i : i + h, j : j + w] for i in range(3) for j in range(3)], axis=-2
    )  # [b, h, w, 9, 2]
    up = jnp.einsum("bhwxyn,bhwnc->bhwxyc", m, neigh)
    # [b, h, w, 8, 8, 2] -> [b, 8h, 8w, 2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 8, w * 8, 2)


class RAFT(nn.Module):
    """__call__(img1, img2) -> full-resolution flow [B, H, W, 2] (x, y).
    Images [B, H, W, 3] in [0, 1]; H, W divisible by 8."""

    cfg: RAFTConfig = RAFTConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2):
        c = self.cfg
        img1 = 2.0 * img1 - 1.0
        img2 = 2.0 * img2 - 1.0
        fnet = BasicEncoder(c, c.encoder_out, "instance", self.dtype, name="fnet")
        f1 = fnet(img1)
        f2 = fnet(img2)
        cnet = BasicEncoder(c, c.hidden_dim + c.context_dim, "batch", self.dtype,
                            name="cnet")(img1)
        h = jnp.tanh(cnet[..., : c.hidden_dim])
        inp = nn.relu(cnet[..., c.hidden_dim :])

        pyramid = _corr_pyramid(f1, f2, c.corr_levels)
        b, hh, ww, _ = f1.shape
        gy, gx = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32),
                              jnp.arange(ww, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1), (b, hh, ww, 2))
        coords1 = coords0
        update = UpdateBlock(c, self.dtype, name="update_block")
        up_mask = None
        for _ in range(c.iters):
            corr = _corr_lookup(pyramid, coords1, c.corr_radius)
            flow = coords1 - coords0
            h, delta, up_mask = update(h, inp, corr, flow)
            coords1 = coords1 + delta
        return _convex_upsample(coords1 - coords0, up_mask)


def make_raft_flow(params, cfg: RAFTConfig = RAFTConfig()):
    """Wrap converted RAFT params as a ``flow_fn(img1 [H,W,C], img2) -> flow``
    compatible with methods/flow.py."""
    model = RAFT(cfg)

    def flow_fn(img1, img2):
        out = model.apply({"params": params}, img1[None], img2[None])
        return out[0]

    return flow_fn
