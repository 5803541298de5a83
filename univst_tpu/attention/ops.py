"""Functional attention building blocks.

The reference implements its method by monkey-patching ``attn1.forward`` on
selected decoder blocks (video_diffusion_sd/pnp_utils.py:104-111) and mutating
``module.idx`` every step (pnp_utils.py:7-15). Here the same math is a set of
pure functions over (q, k, v) taking the step index and a
:class:`~univst_tpu.core.config.StyleShiftConfig` as explicit arguments —
trace-safe, jit-able, and shape-static so the whole 50-step denoise loop
compiles to a single ``lax.scan``.

Layouts:
  * pre-head tensors: ``[B, L, D]`` with ``B = branches * frames``
  * per-head tensors: ``[B, heads, N, Dh]`` (SD3)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.adain import (
    attention_adain,
    attention_adain_sd3,
    attention_adain_sd3_tm,
)
from univst_tpu.core.config import FrameIndex, StyleShiftConfig


def resolve_frame_indices(
    indices: Sequence[FrameIndex], num_frames: int
) -> Tuple[np.ndarray, ...]:
    """Static per-entry frame gather maps, each shape [num_frames].

    Reproduces the reference index semantics
    (video_diffusion_sd/models/attention.py:388-410): strings 'first'/'last'/
    'mid' broadcast one frame to all; ints are relative offsets clipped to
    [0, F-1].
    """
    out = []
    for index in indices:
        if isinstance(index, str):
            if index == "first":
                fi = np.zeros(num_frames, np.int32)
            elif index == "last":
                fi = np.full(num_frames, num_frames - 1, np.int32)
            elif index in ("mid", "middle"):
                fi = np.full(num_frames, (num_frames - 1) // 2, np.int32)
            else:
                raise ValueError(f"unknown frame index {index!r}")
        else:
            fi = np.clip(np.arange(num_frames, dtype=np.int32) + int(index), 0, num_frames - 1)
        out.append(fi)
    return tuple(out)


def _select_frames(xv, index: FrameIndex, frame_axis: int):
    """Per-frame source selection as SLICE / SHIFT / BROADCAST ops — no
    advanced-indexing gather. Semantically identical to indexing with
    :func:`resolve_frame_indices` (clip-to-edge int offsets; 'first'/'last'/
    'mid' broadcasts), but lowers to sharding-friendly HLO: under a
    frame-sharded GSPMD partition a broadcast moves ONE frame and a +/-k shift
    is a k-frame halo exchange (collective-permute), where the gather form
    all-gathers the whole tensor (the failure mode SURVEY §5 calls out).
    """
    ax = frame_axis
    f = xv.shape[ax]

    def take(lo, hi):
        return jax.lax.slice_in_dim(xv, lo, hi, axis=ax)

    if isinstance(index, str):
        if index == "first":
            src = take(0, 1)
        elif index == "last":
            src = take(f - 1, f)
        elif index in ("mid", "middle"):
            m = (f - 1) // 2
            src = take(m, m + 1)
        else:
            raise ValueError(f"unknown frame index {index!r}")
        return jnp.broadcast_to(src, xv.shape)
    k = int(index)
    if k == 0 or f == 1:
        return xv
    k = max(-f + 1, min(k, f - 1))
    if k < 0:
        edge = jnp.broadcast_to(take(0, 1), xv.shape[:ax] + (-k,) + xv.shape[ax + 1:])
        return jnp.concatenate([edge, take(0, f + k)], axis=ax)
    edge = jnp.broadcast_to(take(f - 1, f), xv.shape[:ax] + (k,) + xv.shape[ax + 1:])
    return jnp.concatenate([take(k, f), edge], axis=ax)


def cross_frame_kv(x, num_frames: int, indices: Sequence[FrameIndex]):
    """Sparse-causal KV expansion: each frame's KV tokens become the
    concatenation of the KV tokens of the frames selected by ``indices``
    (reference semantics: video_diffusion_sd/models/attention.py:388-410).

    Args:
      x: ``[B * F, L, D]`` key or value tensor.
      num_frames: F (static).
      indices: static tuple of frame indices.
    Returns: ``[B * F, L * len(indices), D]``.
    """
    if not indices:
        return x
    bf, l, d = x.shape
    b = bf // num_frames
    xv = x.reshape(b, num_frames, l, d)
    gathers = [_select_frames(xv, fi, frame_axis=1) for fi in indices]
    out = jnp.concatenate(gathers, axis=2)
    return out.reshape(bf, l * len(indices), d)


def cross_frame_kv_heads(x, num_frames: int, indices: Sequence[FrameIndex]):
    """Sparse-causal KV expansion on per-head ``[B*F, H, N, Dh]`` tensors
    (the SD3 layout; reference sd3 pnp_utils.py:53-78 gathers after the
    head split)."""
    if not indices:
        return x
    bf, h, n, dh = x.shape
    b = bf // num_frames
    xv = x.reshape(b, num_frames, h, n, dh)
    gathers = [_select_frames(xv, fi, frame_axis=1) for fi in indices]
    out = jnp.concatenate(gathers, axis=3)
    return out.reshape(bf, h, n * len(indices), dh)


def apply_style_shift(q, k, v, step_idx, cfg: StyleShiftConfig, num_frames: int):
    """AdaIN-guided attention shift on pre-head ``[3F, L, D]`` tensors.

    Branch layout along the batch axis is [content | style | stylized]
    (reference batching: stable_diffusion.py:704). Inside the step window
    (traced gate — computed with ``where`` so one compiled graph serves all 50
    steps) the stylized chunk becomes:
      q'  = gamma * (alpha * q_cnt + (1-alpha) * q_sty)
      k'  = beta * adain(k_sty, k_style) + (1-beta) * k_style     (v likewise)
    (reference: video_diffusion_sd/pnp_utils.py:47-57).
    """
    f = num_frames
    gate = cfg.window_gate(step_idx)
    beta = cfg.beta(step_idx).astype(jnp.float32)

    q_cnt, q_sty = q[:f], q[2 * f :]
    k_style, k_sty = k[f : 2 * f], k[2 * f :]
    v_style, v_sty = v[f : 2 * f], v[2 * f :]

    q_new = cfg.gamma * (cfg.alpha * q_cnt + (1.0 - cfg.alpha) * q_sty)
    k_new = beta * attention_adain(k_sty, k_style) + (1.0 - beta) * k_style
    v_new = beta * attention_adain(v_sty, v_style) + (1.0 - beta) * v_style

    q_out = jnp.where(gate, q_new.astype(q.dtype), q_sty)
    k_out = jnp.where(gate, k_new.astype(k.dtype), k_sty)
    v_out = jnp.where(gate, v_new.astype(v.dtype), v_sty)

    q = jnp.concatenate([q[: 2 * f], q_out], axis=0)
    k = jnp.concatenate([k[: 2 * f], k_out], axis=0)
    v = jnp.concatenate([v[: 2 * f], v_out], axis=0)
    return q, k, v


def apply_style_shift_injected(
    q, k, v, style_k, style_v, step_idx, cfg: StyleShiftConfig, num_frames: int
):
    """2-branch AdaIN shift on pre-head ``[2F, L, D]`` tensors.

    Batch layout is [content | stylized]; the style branch's projected K/V
    arrive precomputed as ``style_k`` / ``style_v`` with shape ``[1, L, D]``
    (the style branch's frames are identical — a repeated style image — so it
    runs once as a single frame; see pipelines/sd.py style pre-pass). The math
    is identical to :func:`apply_style_shift` with the style chunk broadcast
    from one frame (reference: video_diffusion_sd/pnp_utils.py:47-57)."""
    f = num_frames
    gate = cfg.window_gate(step_idx)
    beta = cfg.beta(step_idx).astype(jnp.float32)

    q_cnt, q_sty = q[:f], q[f:]
    k_sty, v_sty = k[f:], v[f:]
    k_style = style_k.astype(jnp.float32)
    v_style = style_v.astype(jnp.float32)

    q_new = cfg.gamma * (cfg.alpha * q_cnt + (1.0 - cfg.alpha) * q_sty)
    k_new = beta * attention_adain(k_sty, k_style) + (1.0 - beta) * k_style
    v_new = beta * attention_adain(v_sty, v_style) + (1.0 - beta) * v_style

    q_out = jnp.where(gate, q_new.astype(q.dtype), q_sty)
    k_out = jnp.where(gate, k_new.astype(k.dtype), k_sty)
    v_out = jnp.where(gate, v_new.astype(v.dtype), v_sty)

    q = jnp.concatenate([q[:f], q_out], axis=0)
    k = jnp.concatenate([k[:f], k_out], axis=0)
    v = jnp.concatenate([v[:f], v_out], axis=0)
    return q, k, v


def apply_style_shift_sd3(q, k, v, step_idx, cfg: StyleShiftConfig,
                          num_frames: int, token_major: bool = False):
    """SD3 variant on per-head ``[3F, heads, N, Dh]`` tensors (after q/k norm;
    reference: video_diffusion_sd3/pnp_utils.py:181-194). ``token_major``
    switches the AdaIN reduction axes for ``[3F, N, heads, Dh]`` tensors (the
    transpose-free attention layout); everything else is axis-0 slicing and
    elementwise math, identical in both layouts."""
    adain = attention_adain_sd3_tm if token_major else attention_adain_sd3
    f = num_frames
    gate = cfg.window_gate(step_idx)
    beta = cfg.beta(step_idx).astype(jnp.float32)

    q_cnt, q_sty = q[:f], q[2 * f :]
    k_style, k_sty = k[f : 2 * f], k[2 * f :]
    v_style, v_sty = v[f : 2 * f], v[2 * f :]

    q_new = cfg.gamma * (cfg.alpha * q_cnt + (1.0 - cfg.alpha) * q_sty)
    k_new = beta * adain(k_sty, k_style) + (1.0 - beta) * k_style
    v_new = beta * adain(v_sty, v_style) + (1.0 - beta) * v_style

    q_out = jnp.where(gate, q_new.astype(q.dtype), q_sty)
    k_out = jnp.where(gate, k_new.astype(k.dtype), k_sty)
    v_out = jnp.where(gate, v_new.astype(v.dtype), v_sty)

    q = jnp.concatenate([q[: 2 * f], q_out], axis=0)
    k = jnp.concatenate([k[: 2 * f], k_out], axis=0)
    v = jnp.concatenate([v[: 2 * f], v_out], axis=0)
    return q, k, v


def apply_style_shift_sd3_injected(
    q, k, v, style_k, style_v, step_idx, cfg: StyleShiftConfig,
    num_frames: int, token_major: bool = False,
):
    """SD3 2-branch variant on per-head ``[2F, heads, N, Dh]`` tensors with the
    style branch's K/V injected as ``[1, heads, N, Dh]`` (identical style
    frames run once; see apply_style_shift_injected). ``token_major``: see
    :func:`apply_style_shift_sd3`."""
    adain = attention_adain_sd3_tm if token_major else attention_adain_sd3
    f = num_frames
    gate = cfg.window_gate(step_idx)
    beta = cfg.beta(step_idx).astype(jnp.float32)

    q_cnt, q_sty = q[:f], q[f:]
    k_sty, v_sty = k[f:], v[f:]
    k_style = style_k.astype(jnp.float32)
    v_style = style_v.astype(jnp.float32)

    q_new = cfg.gamma * (cfg.alpha * q_cnt + (1.0 - cfg.alpha) * q_sty)
    k_new = beta * adain(k_sty, k_style) + (1.0 - beta) * k_style
    v_new = beta * adain(v_sty, v_style) + (1.0 - beta) * v_style

    q_out = jnp.where(gate, q_new.astype(q.dtype), q_sty)
    k_out = jnp.where(gate, k_new.astype(k.dtype), k_sty)
    v_out = jnp.where(gate, v_new.astype(v.dtype), v_sty)

    q = jnp.concatenate([q[:f], q_out], axis=0)
    k = jnp.concatenate([k[:f], k_out], axis=0)
    v = jnp.concatenate([v[:f], v_out], axis=0)
    return q, k, v


def sdpa(q, k, v, scale: float | None = None):
    """Scaled dot-product attention on ``[B, heads, T, Dh]`` tensors.

    fp32 softmax accumulation regardless of input dtype; XLA fuses this into a
    flash-style kernel on TPU. A fused Pallas kernel (3-branch shift +
    sparse-causal KV inside the kernel) lives in
    univst_tpu/attention/pallas_attention.py and is used on the hot path when
    shapes allow.
    """
    dh = q.shape[-1]
    if scale is None:
        scale = dh**-0.5
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v)
    return out


def _flash_eligible(tq: int, s: int, dh: int) -> bool:
    """Use the Pallas TPU flash kernel for large sequences: the naive path
    materializes [B, H, L, S] logits (26+ GB at 512px with the 3-branch
    batch, and entirely infeasible for SD3's joint attention at 1024px),
    flash streams KV blocks through VMEM instead. Non-128-multiple KV
    lengths are padded and masked via segment ids in :func:`mha`."""
    import os

    if os.environ.get("UNIVST_DISABLE_FLASH"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # the kernel requires head_dim <= 128 or a multiple of 128; the dh=160
    # layers only occur at L <= 256 where naive logits are small anyway
    if dh > 128 and dh % 128 != 0:
        return False
    return tq >= 256 and s >= 128


def largest_divisor_block(l: int, cap: int = 4096) -> int:
    """Largest power-of-two flash block size <= ``cap`` that divides ``l``.

    The video kernel's grid is ``l // block`` with no remainder handling, so a
    non-dividing block would silently skip tail rows; callers must guarantee
    ``l % 128 == 0``."""
    return max(bs for bs in (4096, 2048, 1024, 512, 256, 128) if bs <= cap and l % bs == 0)


def q_block_for(lq_pad: int, cap: int = 4096) -> int:
    """Largest q-block <= ``cap`` dividing ``lq_pad``, including the 3*2^k
    sizes the merged [img | ctx] joint-query lengths pad to (SD3 at 1024px:
    4096 + 333 -> 4608 = 2 x 2304). All candidates are lane-width multiples."""
    return max(
        bs
        for bs in (4096, 2304, 2048, 1536, 1152, 1024, 768, 512, 384, 256, 128)
        if bs <= cap and lq_pad % bs == 0
    )


def video_mha(q, k, v, num_heads: int, num_frames: int,
              frame_indices: Sequence[FrameIndex], scale: float | None = None):
    """Sparse-causal video attention on pre-head ``[B*F, L, D]`` tensors.

    On TPU with large token counts this dispatches to the fused Pallas kernel
    (attention/pallas_attention.py) that reads per-frame KV blocks via index
    maps — no expanded-KV materialization. Elsewhere it falls back to the
    explicit gather + mha path (bitwise the reference semantics)."""
    import os

    bf, l, d = q.shape
    dh = d // num_heads
    f = num_frames
    # L >= 1024: below that (the 16x16 level, L=256) the kernel grid is
    # overhead-dominated and the XLA expanded-KV path is ~25x faster
    # (scripts/bench_attn_tune.py, v5e: 0.3 ms vs ~8 ms per layer)
    use_kernel = (
        frame_indices
        and not os.environ.get("UNIVST_DISABLE_FLASH")
        and jax.default_backend() in ("tpu", "axon")
        and l >= 1024
        and l % 128 == 0
    )
    if use_kernel:
        from univst_tpu.attention.pallas_attention import video_flash_attention

        b = bf // f

        def split(x):
            return x.reshape(b, f, l, num_heads, dh).transpose(0, 1, 3, 2, 4)

        dt = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
        # tuned on v5e (bench_attn_tune.py): (4096, 4096) dual-row blocks at
        # the 64x64 level beat (1024, 1024) by ~18% — the kernel raises the
        # Mosaic VMEM limit to admit the fp32 logit blocks. Blocks must
        # DIVIDE l (the kernel grid is l // block): pick the largest
        # power-of-two divisor <= 4096 (l % 128 == 0 is guaranteed by the
        # use_kernel gate above, so one always exists — e.g. 768px gives
        # L=9216 -> 1024-wide blocks).
        blk = largest_divisor_block(l)
        out = video_flash_attention(
            split(q).astype(dt), split(k).astype(dt), split(v).astype(dt),
            tuple(frame_indices),
            sm_scale=float(dh**-0.5 if scale is None else scale),
            # narrow_qk measured at the production SD/AD shapes (v5e):
            # dh=40/L=4096 b16/b32 2- and 3-src: 4.5-6.1% faster per call
            # (scripts/bench_sd_narrow_qk.py); dh=80/L=1024 (the 32x32
            # level): 0.63 vs 0.76 ms (b1 2-src), 0.99 vs 1.26 (3-src),
            # equal at b2 — never slower (round-5 probe). Exact
            # (interpret-mode kernel tests cover dh 40/64/80 narrow).
            # Unmeasured dims (dh=160 at >=1024px) stay under the
            # UNIVST_NARROW_QK env opt-in (None), and the kernel itself
            # refuses narrow layouts Mosaic can't tile (>128, non-128-mult).
            block_q=blk, block_k=blk, narrow_qk=True if dh <= 80 else None,
        ).astype(q.dtype)
        return out.transpose(0, 1, 3, 2, 4).reshape(bf, l, d)
    if frame_indices:
        k = cross_frame_kv(k, f, frame_indices)
        v = cross_frame_kv(v, f, frame_indices)
    return mha(q, k, v, num_heads, scale)


def joint_video_attention(q, k, v, num_frames: int,
                          frame_indices: Sequence[FrameIndex],
                          cq=None, ck=None, cv=None,
                          scale: float | None = None):
    """SD3/MMDiT joint attention with sparse-causal video KV, on per-head
    ``[B*F, H, L, dh]`` tensors (image tokens) plus optional per-head context
    streams ``[B*F, H, Lc, dh]``.

    Reference semantics (sd3 pnp_utils.py:53-84): expand the image K/V by
    gathering ``frame_indices`` frames, concatenate the context K/V, and run
    SDPA over the joint [img*slots | ctx] sequence. At 1024px that
    materializes 600 MB per tensor per layer (16f x 3 slots x 4096 tokens)
    and runs the library flash kernel at ~45 TFLOPS effective. On TPU this
    instead streams the UNEXPANDED per-frame KV blocks through the fused
    video kernel (pallas_attention.py) with the context as one extra masked
    kv step — no expanded tensor exists, duplicate slots are elided (frames
    0/1 under ('first', -1, 0) repeat frame 0), and the kernel measures ~60
    TFLOPS at the SD3 shape (scripts/bench_sd3_anatomy.py). The context-token
    queries run as a second short call against the same KV. Elsewhere (CPU
    tests), the reference expand+concat+sdpa path runs unchanged.

    Returns ``[B*F, H, L(+Lc), dh]`` (context rows appended when cq given).
    """
    import os

    bf, nh, n, dh = q.shape
    f = num_frames
    has_ctx = cq is not None
    use_kernel = (
        frame_indices
        and not os.environ.get("UNIVST_DISABLE_FLASH")
        and jax.default_backend() in ("tpu", "axon")
        and n >= 1024
        and n % 128 == 0
        and bf % f == 0
    )
    if not use_kernel:
        kx = cross_frame_kv_heads(k, f, frame_indices) if frame_indices else k
        vx = cross_frame_kv_heads(v, f, frame_indices) if frame_indices else v
        if has_ctx:
            q = jnp.concatenate([q, cq], axis=2)
            kx = jnp.concatenate([kx, ck], axis=2)
            vx = jnp.concatenate([vx, cv], axis=2)
        return heads_attention(q, kx, vx, scale)

    from univst_tpu.attention.pallas_attention import video_flash_attention

    b = bf // f

    def r5(x):
        return x.reshape(b, f, nh, x.shape[2], dh)

    dt = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    blk = largest_divisor_block(n)
    sm = float(dh**-0.5 if scale is None else scale)
    if not has_ctx:
        out_i = video_flash_attention(
            r5(q).astype(dt), r5(k).astype(dt), r5(v).astype(dt),
            tuple(frame_indices), sm_scale=sm, block_q=blk, block_k=blk,
            narrow_qk=True,
        )
        return out_i.reshape(bf, nh, n, dh).astype(q.dtype)
    ctx_kw = dict(ctx_k=r5(ck).astype(dt), ctx_v=r5(cv).astype(dt),
                  ctx_valid=ck.shape[2])
    if os.environ.get("UNIVST_SD3_SPLIT_CTX_Q"):
        # Legacy two-call form (kept for A/B benching): image queries at full
        # blocks, then the short context queries as a second call. The second
        # call re-sweeps the ENTIRE joint KV per layer for ~333 q rows — tiny
        # q blocks at low MXU efficiency plus a duplicate KV read.
        out_i = video_flash_attention(
            r5(q).astype(dt), r5(k).astype(dt), r5(v).astype(dt),
            tuple(frame_indices), sm_scale=sm, block_q=blk, block_k=blk,
            **ctx_kw,
        )
        nc = cq.shape[2]
        nc_pad = -(-nc // 128) * 128
        cq_p = jnp.pad(cq, ((0, 0), (0, 0), (0, nc_pad - nc), (0, 0)))
        out_c = video_flash_attention(
            r5(cq_p).astype(dt), r5(k).astype(dt), r5(v).astype(dt),
            tuple(frame_indices), sm_scale=sm, block_q=nc_pad, block_k=blk,
            **ctx_kw,
        )[:, :, :, :nc]
        out = jnp.concatenate([out_i, out_c], axis=3)
        return out.reshape(bf, nh, n + nc, dh).astype(q.dtype)
    # Merged call: the context-token queries ride the same q stream as the
    # image tokens ([img | ctx | pad] rows per frame). Every joint-attention
    # query attends the identical KV set (img slots + own-frame ctx), so the
    # concat is purely a q-side layout change; the padded tail rows attend
    # real KV and are sliced off. This removes the second full-KV sweep and
    # runs the ctx rows inside full-size q blocks (measured: the split form's
    # short call cost far more than its 8% FLOP share).
    nc = cq.shape[2]
    lq = n + nc
    align = 512 if lq >= 1024 else 128
    lq_pad = -(-lq // align) * align
    qj = jnp.concatenate([q, cq], axis=2)
    if lq_pad != lq:
        qj = jnp.pad(qj, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
    # v5e sweep at the SD3 joint shape (bench_sd3_attn_tune --solo --merged,
    # narrow-qk kernel): one full-length q block with half-size kv blocks
    # (4608, 2048, nch=4) measures best — 126.4/62.95 ms/call (b=2/b=1) vs
    # 132.1/66.1 for (2304, 4096, 4); a full-q block halves the KV re-read
    # traffic (nq=1) and bk=2048 keeps the logit blocks pipeline-friendly
    # (4608x4096 fp32 blocks measured 27% SLOWER — VMEM pressure).
    if lq_pad <= 4608:
        bq = lq_pad
        blk = min(blk, max(2048, blk // 2))
    else:
        bq = q_block_for(lq_pad)
    # 4 independent softmax chains hide more VPU time under MXU work than 2
    nch = 4 if bq % 4 == 0 else 2
    out = video_flash_attention(
        r5(qj).astype(dt), r5(k).astype(dt), r5(v).astype(dt),
        tuple(frame_indices), sm_scale=sm, block_q=bq,
        block_k=blk, dual=nch, narrow_qk=True, **ctx_kw,
    )
    return out.reshape(bf, nh, lq_pad, dh)[:, :, :lq].astype(q.dtype)


def joint_video_attention_tokens(q, k, v, num_frames: int,
                                 frame_indices: Sequence[FrameIndex],
                                 cq=None, ck=None, cv=None,
                                 scale: float | None = None):
    """:func:`joint_video_attention` on TOKEN-MAJOR per-head tensors
    ``[B*F, L, H, dh]`` (= a free reshape of the projection output
    ``[B*F, L, H*dh]`` — no head transpose).

    On TPU this calls the folded-layout kernel
    (pallas_attention.video_flash_attention_folded): k/v stream straight from
    the projection GEMM's layout and the output feeds the out-projection
    directly, removing the four per-layer [L, H] transposes plus the v
    128-lane pad copy that the head-major form materializes (~5-6 ms/layer at
    the SD3 b32 shape). Elsewhere it transposes to head-major and runs the
    reference expand+concat path (CPU test parity; perf irrelevant there).

    Returns ``[B*F, L(+Lc), H, dh]`` (context rows appended when cq given).
    """
    import os

    bf, n, nh, dh = q.shape
    f = num_frames
    has_ctx = cq is not None
    use_kernel = (
        frame_indices
        and not os.environ.get("UNIVST_DISABLE_FLASH")
        and jax.default_backend() in ("tpu", "axon")
        and n >= 1024
        and n % 128 == 0
        and bf % f == 0
        # folded kernel: whole head groups per 128-lane block
        and 128 % dh == 0
        and nh % (128 // dh) == 0
    )
    if not use_kernel:
        hm = lambda x: x.transpose(0, 2, 1, 3)  # noqa: E731
        out = joint_video_attention(
            hm(q), hm(k), hm(v), f, frame_indices,
            cq=hm(cq) if has_ctx else None,
            ck=hm(ck) if has_ctx else None,
            cv=hm(cv) if has_ctx else None, scale=scale,
        )
        return out.transpose(0, 2, 1, 3)

    from univst_tpu.attention.pallas_attention import (
        video_flash_attention_folded,
    )

    b = bf // f

    def r5(x):
        return x.reshape(b, f, x.shape[1], nh, dh)

    dt = jnp.bfloat16 if q.dtype != jnp.float32 else jnp.float32
    sm = float(dh**-0.5 if scale is None else scale)
    # v5e folded-kernel sweep at the SD3 joint shape (/tmp bench, ROUND5_NOTES
    # table): one full-length q block + bk=1024 + 8 row chains wins —
    # (4480, 1024, nch8) = 118.0/59.5 ms/call (b2/b1) vs the classic
    # head-major production form's 126.2/62.8, with the per-layer transposes
    # gone on top. bk=2048 REGRESSES here (the g*nch fp32 logit blocks blow
    # scoped VMEM: 156 ms at b2); bk=512 is grid-overhead-bound (187 ms).
    bkf = largest_divisor_block(n, cap=1024)
    if not has_ctx:
        bqf = n if n <= 4608 else q_block_for(n)
        out = video_flash_attention_folded(
            r5(q).astype(dt), r5(k).astype(dt), r5(v).astype(dt),
            tuple(frame_indices), sm_scale=sm, block_q=bqf, block_k=bkf,
            dual=8 if bqf % 64 == 0 else 4,
        )
        return out.reshape(bf, n, nh, dh).astype(q.dtype)
    # merged [img | ctx | pad] q stream (see joint_video_attention): one
    # token-axis concat+pad is the only copy the folded path pays. 64-aligned
    # pad (4429 -> 4480, was 4608): the dead q rows are swept like real ones,
    # and 64-align keeps the 8 row chains sublane-aligned (bq/8 % 8 == 0)
    nc = cq.shape[1]
    lq = n + nc
    align = 64 if lq >= 1024 else 128
    lq_pad = -(-lq // align) * align
    qj = jnp.concatenate(
        [q, cq] + ([jnp.zeros((bf, lq_pad - lq, nh, dh), q.dtype)]
                   if lq_pad != lq else []),
        axis=1,
    )
    bq = lq_pad if lq_pad <= 4608 else q_block_for(lq_pad)
    nch = 8 if bq % 64 == 0 else (4 if bq % 4 == 0 else 2)
    out = video_flash_attention_folded(
        r5(qj).astype(dt), r5(k).astype(dt), r5(v).astype(dt),
        tuple(frame_indices), sm_scale=sm, block_q=bq, block_k=bkf,
        dual=nch, ctx_k=r5(ck).astype(dt), ctx_v=r5(cv).astype(dt),
        ctx_valid=nc,
    )
    return out.reshape(bf, lq_pad, nh, dh)[:, :lq].astype(q.dtype)


def mha(q, k, v, num_heads: int, scale: float | None = None):
    """Multi-head attention over pre-head ``[B, L, D]`` tensors; returns [B, L, D].

    Dispatches to the Pallas TPU flash-attention kernel for the big spatial
    attentions and to the fused-naive XLA path for short sequences (text
    cross-attn KV=77, temporal attn over F frames)."""
    b, tq, d = q.shape
    dh = d // num_heads
    s = k.shape[1]

    def split(x, t):
        return x.reshape(b, t, num_heads, dh).transpose(0, 2, 1, 3)

    out = heads_attention(split(q, tq), split(k, s), split(v, s), scale)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, d)


def heads_attention(qh, kh, vh, scale: float | None = None):
    """Attention on per-head ``[B, heads, T, Dh]`` tensors (the SD3/MMDiT
    joint-attention layout); returns the same layout.

    Flash-eligible shapes stream through the Pallas TPU kernel with q/KV
    padded to the lane width and the KV tail masked via segment ids — the
    naive path materializes [B, H, T, S] fp32 logits, which is infeasible
    for SD3's joint [img*frames | text] attention at 1024px (hundreds of
    GB; the reference leans on torch SDPA's implicit flash here)."""
    b, _, tq, dh = qh.shape
    s = kh.shape[2]
    if _flash_eligible(tq, s, dh):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        qh, kh, vh, kv_seg, tq_pad, s_pad = flash_pad(qh, kh, vh)
        segment_ids = None
        if kv_seg is not None:
            segment_ids = SegmentIds(
                q=jnp.zeros((b, tq_pad), jnp.int32), kv=kv_seg
            )
        bq, bkm, bk = flash_block_plan(tq_pad, s_pad)
        bs = BlockSizes(
            block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
        )
        sm_scale = float(dh**-0.5 if scale is None else scale)
        dt = jnp.bfloat16 if qh.dtype != jnp.float32 else jnp.float32
        out = flash_attention(
            qh.astype(dt), kh.astype(dt), vh.astype(dt),
            segment_ids=segment_ids, sm_scale=sm_scale, block_sizes=bs,
        ).astype(qh.dtype)
        if tq_pad != tq:
            out = out[:, :, :tq]
        return out
    return sdpa(qh, kh, vh, scale=scale)


def flash_pad(qh, kh, vh):
    """Pad ``[B, H, T, dh]`` q and ``[B, H, S, dh]`` k/v for the TPU flash
    kernel; returns ``(q, k, v, kv_segment_or_None, tq_pad, s_pad)``.

    Padded q rows attend the real KV and their outputs are sliced off by the
    caller; padded KV rows are masked via segment ids (q tokens segment 0,
    pad tokens segment 1 never match) — this lets SD3's joint
    [img*frames | text] sequences (S=4429, not a 128-multiple) stream through
    the flash kernel instead of materializing [B, H, T, S] logits. Long
    sequences align to 512 so :func:`flash_block_plan` can pick real blocks;
    short ones to the 128 lane width only. Split out from
    :func:`heads_attention` so the CPU suite can verify the padding/masking
    semantics without TPU hardware (tests/test_flash_padding.py, ADVICE r2)."""
    b, _, tq, _ = qh.shape
    s = kh.shape[2]
    align_q = 512 if tq >= 1024 else 128
    align_s = 512 if s >= 1024 else 128
    tq_pad = -(-tq // align_q) * align_q
    if tq_pad != tq:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
    kv_seg = None
    s_pad = -(-s // align_s) * align_s
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        kh, vh = jnp.pad(kh, pad), jnp.pad(vh, pad)
        kv_seg = jnp.broadcast_to(
            (jnp.arange(s_pad, dtype=jnp.int32) >= s).astype(jnp.int32),
            (b, s_pad),
        )
    return qh, kh, vh, kv_seg, tq_pad, s_pad


def flash_block_plan(tq_pad: int, s_pad: int):
    """Block sizes (block_q, block_k_major, block_k) for the library flash
    kernel, tuned on v5e. The library defaults run ~7x slower at small
    head_dim. Blocks must divide the padded sequence lengths; 1536 leads the
    candidates for the SD3 joint shapes (4429 pads to 4608 = 3 x 1536; q and
    k-major blocks of 1536 measure ~10% faster than 512 —
    scripts/bench_sd3_anatomy.py --probe attn: 33.4 vs 30.4 TFLOPS), while
    the SD shapes (4096/8192) keep their tuned 1024."""

    def _div(n, cap):
        return max(bs for bs in (1536, 1024, 512, 256, 128)
                   if bs <= cap and n % bs == 0)

    return (
        _div(tq_pad, min(1536, tq_pad)),
        _div(s_pad, min(1536, s_pad)),
        _div(s_pad, min(512, s_pad)),
    )
