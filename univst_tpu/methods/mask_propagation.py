"""Point-matching mask propagation (SURVEY.md C6) as a jit-compiled scan.

Rebuild of src/mask_propagation.py:15-155: propagate a first-frame one-hot
mask across frames via top-k-filtered cosine affinity over cached UNet decoder
features, with an anchor set of {first frame} + a queue of the 9 previous
frames' *subsampled* (feature, seg) pairs.

TPU-first redesign of the dynamic parts:
  * the reference's ``queue.Queue`` of variable-length sampled tensors
    (mask_propagation.py:37-58,86-99) becomes fixed-capacity ring-buffer banks
    with validity masks — static shapes, one compiled graph for all frames;
  * ``torch.randperm`` subsampling becomes per-frame ``jax.random`` scored
    top-k selection (same class-proportional sample sizes; the reference's
    RNG stream is not reproducible bit-for-bit, which only affects which
    anchors are cached, not the affinity math);
  * invalid anchor slots contribute exp(-inf) = 0 affinity, so padding is
    exactly inert.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MaskPropConfig:
    """Hyper-parameters (reference CLI defaults, mask_propagation.py:143-147)."""

    temperature: float = 0.2
    n_last_frames: int = 9
    topk: int = 15
    sample_ratio: float = 0.3


def _l2norm(x, axis):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def _propagate_one(feat_src, segs_src, src_valid, feat_tgt, cfg: MaskPropConfig):
    """One frame's propagation (reference ``mask_propogation``, :72-83).

    feat_src: [S, C] anchor features; segs_src: [n_cls, S]; src_valid: [S] bool
    feat_tgt: [T, C].
    Returns segs_tgt [n_cls, T].
    """
    fs = _l2norm(feat_src.astype(jnp.float32), axis=1)
    ft = _l2norm(feat_tgt.astype(jnp.float32), axis=1)
    logits = jnp.einsum("tc,sc->st", ft, fs, preferred_element_type=jnp.float32)
    # logits[s, t]; kill invalid anchors before exp
    logits = jnp.where(src_valid[:, None], logits / cfg.temperature, -jnp.inf)
    aff = jnp.exp(logits)
    # per-target top-k floor (aff below the k-th largest source -> 0)
    tk_min = jax.lax.top_k(aff.T, cfg.topk)[0][:, -1]
    aff = jnp.where(aff < tk_min[None, :], 0.0, aff)
    aff = aff / jnp.clip(jnp.sum(aff, axis=0, keepdims=True), 1e-12)
    return segs_src.astype(jnp.float32) @ aff  # [n_cls, T]


def _subsample(segs_tgt, key, capacity: int, cfg: MaskPropConfig):
    """Class-proportional random subsampling (reference :86-99).

    'fore' = positions with nonzero class-0 mass, exactly as the reference
    computes it (segs_tar[0, :] != 0). Returns (indices [capacity], valid
    [capacity]) selecting which target positions enter the anchor queue.
    """
    t = segs_tgt.shape[1]
    is_fore = segs_tgt[0] != 0
    n_f = jnp.sum(is_fore)
    n_b = t - n_f
    denom = jnp.float32(t)
    k_f = jnp.floor(n_f.astype(jnp.float32) ** 2 / denom * cfg.sample_ratio).astype(jnp.int32)
    k_b = jnp.floor(n_b.astype(jnp.float32) ** 2 / denom * cfg.sample_ratio).astype(jnp.int32)
    score = jax.random.uniform(key, (t,))
    # rank positions within their class by random score
    def class_rank(mask):
        s = jnp.where(mask, score, 2.0)  # non-members sort last
        order = jnp.argsort(s)
        rank = jnp.zeros(t, jnp.int32).at[order].set(jnp.arange(t, dtype=jnp.int32))
        return rank

    sel = jnp.where(
        is_fore, class_rank(is_fore) < k_f, class_rank(~is_fore) < k_b
    )
    n_sel = jnp.sum(sel)
    # compact the selected positions into the first `capacity` slots
    order = jnp.argsort(jnp.where(sel, score, 3.0))
    idx = order[:capacity]
    valid = jnp.arange(capacity) < jnp.minimum(n_sel, capacity)
    return idx, valid


def propagate_masks(
    features,
    first_seg,
    cfg: MaskPropConfig = MaskPropConfig(),
    key=None,
):
    """Propagate the first-frame one-hot seg across all frames.

    Args:
      features: ``[F, T, C]`` per-frame flattened decoder features (T = h*w).
      first_seg: ``[n_cls, T]`` one-hot first-frame segmentation.
      key: PRNG key for anchor subsampling.
    Returns: ``[F-1, n_cls, T]`` soft segs for frames 1..F-1.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    f, t, c = features.shape
    n_cls = first_seg.shape[0]
    capacity = int(t * cfg.sample_ratio) + 1
    q = cfg.n_last_frames

    feat_first = features[0]
    keys = jax.random.split(key, f - 1)

    def step(carry, inputs):
        feat_bank, seg_bank, valid_bank, write_ptr = carry
        feat_tgt, k = inputs
        # anchors: first frame (always valid) + ring buffer
        feat_src = jnp.concatenate([feat_first, feat_bank.reshape(q * capacity, c)])
        segs_src = jnp.concatenate(
            [first_seg, seg_bank.transpose(1, 0, 2).reshape(n_cls, q * capacity)], axis=1
        )
        src_valid = jnp.concatenate(
            [jnp.ones(t, bool), valid_bank.reshape(q * capacity)]
        )
        segs_tgt = _propagate_one(feat_src, segs_src, src_valid, feat_tgt, cfg)
        # subsample this frame's result into the ring buffer
        idx, valid = _subsample(segs_tgt, k, capacity, cfg)
        slot = write_ptr % q
        feat_bank = feat_bank.at[slot].set(feat_tgt[idx])
        seg_bank = seg_bank.at[slot].set(segs_tgt[:, idx])
        valid_bank = valid_bank.at[slot].set(valid)
        return (feat_bank, seg_bank, valid_bank, write_ptr + 1), segs_tgt

    init = (
        jnp.zeros((q, capacity, c), features.dtype),
        jnp.zeros((q, n_cls, capacity), jnp.float32),
        jnp.zeros((q, capacity), bool),
        jnp.asarray(0, jnp.int32),
    )
    _, segs = jax.lax.scan(step, init, (features[1:], keys))
    return segs


def norm_mask(masks):
    """Per-class min-max normalization (reference norm_mask, :114-123).
    masks: [n_cls, H, W]."""
    mn = jnp.min(masks, axis=(1, 2), keepdims=True)
    mx = jnp.max(masks, axis=(1, 2), keepdims=True)
    normed = (masks - mn) / jnp.clip(mx - mn, 1e-12)
    # reference guards on the channel's (pre-shift) max being > 0
    return jnp.where(mx > 0, normed, masks)


def to_one_hot(seg, n_classes: int):
    """[H, W] integer labels -> [n_cls, H*W] one-hot (reference :126-138)."""
    flat = seg.reshape(-1).astype(jnp.int32)
    return jax.nn.one_hot(flat, n_classes, dtype=jnp.float32).T


def upsample_labels(segs, feat_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """[F-1, n_cls, T] -> [F-1, H, W] uint8 argmax label maps (reference
    :60-65: bilinear upsample, per-class min-max norm, argmax)."""
    fh, fw = feat_hw
    oh, ow = out_hw
    n = segs.shape[0]
    m = segs.reshape(n, -1, fh, fw)
    m = jax.image.resize(m, (n, m.shape[1], oh, ow), "bilinear")
    m = jax.vmap(norm_mask)(m)
    return jnp.argmax(m, axis=1).astype(jnp.uint8)


def upsample_and_binarize(segs, feat_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """[F-1, n_cls, T] -> list of [H, W] uint8 {0, 255} masks (reference
    :60-69: bilinear upsample, per-class min-max norm, argmax, binarize)."""
    labels = upsample_labels(segs, feat_hw, out_hw)
    return jnp.where(labels != 0, 255, 0).astype(jnp.uint8)
