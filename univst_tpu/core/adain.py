"""AdaIN operators with exact reference semantics.

The reference implements AdaIN as ``F.instance_norm(cnt) * sty_std + sty_mean``
(backbones/video_diffusion_sd/pnp_utils.py:114-139;
backbones/video_diffusion_sd3/pnp_utils.py:289-316). Two subtleties are
replicated deliberately because output parity depends on them:

  1. The scale/shift statistics use torch's default *unbiased* std (N-1), while
     ``F.instance_norm`` normalizes with *biased* variance + eps=1e-5.
  2. ``F.instance_norm`` interprets dim 1 of its input as the channel dim, so
     for a ``[B, L, D]`` attention tensor it normalizes each token over D —
     a different axis than the per-(B, D)-over-L statistics. We reproduce the
     actual behavior, not the "intended" one, and note the quirk per function.

Layout note: this framework is frames-leading / channels-last. Latents are
``[F, H, W, C]`` (the reference's batch dim of 1 is dropped; its ``[B,C,F,H,W]``
dims map accordingly). Attention tensors are ``[B, L, D]`` (B = branches x
frames) or ``[B, heads, N, C]`` for SD3.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-5  # torch F.instance_norm default


def _std_unbiased(x, axis, keepdims=True):
    """torch.std default: unbiased (N-1) estimator."""
    x = x.astype(jnp.float32)
    n = 1
    axes = axis if isinstance(axis, tuple) else (axis,)
    for a in axes:
        n *= x.shape[a]
    var = jnp.var(x, axis=axis, keepdims=keepdims) * (n / max(n - 1, 1))
    return jnp.sqrt(var)


def _instance_norm(x, axis):
    """Biased normalization with eps, matching F.instance_norm over `axis`.

    Stats via sibling E[x]/E[x^2] reductions (one fused input pass — the
    dependent mean-then-var form costs an extra full pass per call on the
    8-layer K/V shift path)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    sq = jnp.mean(jnp.square(x), axis=axis, keepdims=True)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    return (x - mean) / jnp.sqrt(var + _EPS)


def attention_adain(cnt_feat, sty_feat):
    """AdaIN over attention K/V tensors, SD / AnimateDiff variant.

    Args: ``[B, L, D]`` tensors. Style stats are per-(B, D) over tokens L
    (reference pnp_utils.py:116-121, dim=[1]); normalization is per-(B, L)
    over D (the F.instance_norm quirk, pnp_utils.py:123).
    """
    sty = sty_feat.astype(jnp.float32)
    sty_mean = jnp.mean(sty, axis=1, keepdims=True)
    sty_std = _std_unbiased(sty, axis=1)
    normed = _instance_norm(cnt_feat, axis=2)
    out = normed * sty_std + sty_mean
    return out.astype(cnt_feat.dtype)


def attention_adain_sd3(cnt_feat, sty_feat):
    """AdaIN for SD3 per-head K/V tensors ``[B, heads, N, C]``.

    Style stats are per-(B, heads, C) over N (sd3 pnp_utils.py:292-295,
    dim=[-2]); normalization is per-(B, heads) jointly over (N, C) — torch
    F.instance_norm on a 4D input treats dims (2, 3) as spatial
    (sd3 pnp_utils.py:300).
    """
    sty = sty_feat.astype(jnp.float32)
    sty_mean = jnp.mean(sty, axis=-2, keepdims=True)
    sty_std = _std_unbiased(sty, axis=-2)
    normed = _instance_norm(cnt_feat, axis=(2, 3))
    out = normed * sty_std + sty_mean
    return out.astype(cnt_feat.dtype)


def attention_adain_sd3_tm(cnt_feat, sty_feat):
    """:func:`attention_adain_sd3` on token-major ``[B, N, heads, C]`` tensors
    (the transpose-free SD3 attention layout — see
    attention/pallas_attention.py video_flash_attention_folded). Identical
    math with the reduction axes relabeled: style stats per-(B, heads, C)
    over N (axis 1), normalization per-(B, heads) over (N, C) = axes (1, 3).
    Pinned to the head-major form by tests/test_adain.py."""
    sty = sty_feat.astype(jnp.float32)
    sty_mean = jnp.mean(sty, axis=1, keepdims=True)
    sty_std = _std_unbiased(sty, axis=1)
    normed = _instance_norm(cnt_feat, axis=(1, 3))
    out = normed * sty_std + sty_mean
    return out.astype(cnt_feat.dtype)


def latent_adain(cnt_feat, sty_feat):
    """Init/anchor latent AdaIN, SD / AnimateDiff variant.

    Args: ``[F, H, W, C]`` latents (reference layout ``[1, C, F, H, W]``,
    pnp_utils.py:128-139). Style stats per-(F, C) over (H, W) — reference
    dims [0, 3, 4] with B=1; normalization per-C over (F, H, W) — torch
    instance_norm on 5D input with N=1.
    """
    sty = sty_feat.astype(jnp.float32)
    sty_mean = jnp.mean(sty, axis=(1, 2), keepdims=True)
    sty_std = _std_unbiased(sty, axis=(1, 2))
    normed = _instance_norm(cnt_feat, axis=(0, 1, 2))
    out = normed * sty_std + sty_mean
    return out.astype(cnt_feat.dtype)


def latent_adain_sd3(cnt_feat, sty_feat):
    """SD3 latent AdaIN over ``[F, H, W, C]`` latents.

    Reference layout is ``[F, C, H, W]`` with stats AND normalization both
    per-(F, C) over (H, W) (sd3 pnp_utils.py:305-316 — the one internally
    consistent variant).
    """
    sty = sty_feat.astype(jnp.float32)
    sty_mean = jnp.mean(sty, axis=(1, 2), keepdims=True)
    sty_std = _std_unbiased(sty, axis=(1, 2))
    normed = _instance_norm(cnt_feat, axis=(1, 2))
    out = normed * sty_std + sty_mean
    return out.astype(cnt_feat.dtype)
