"""Fused sparse-causal video flash attention (Pallas TPU kernel).

The reference expands K/V by gathering frames ('first', -1, 0 ...) and
concatenating along tokens before SDPA (video_diffusion_sd/pnp_utils.py:59-84)
— at 512px that materializes a 2-3x copy of every K/V tensor per layer. This
kernel instead reads the UNEXPANDED per-frame K/V blocks directly via
scalar-prefetched index maps: the gather becomes block addressing, the softmax
runs online over the per-source KV streams, and no expanded tensor ever exists.

Layout:
  q, k, v: [B, F, H, L, dh]   (dh padded to a multiple of 128 by the wrapper)
  frame_srcs: int32 [F, S]    resolved source frame per (target frame, slot)
  out: [B, F, H, L, dh]

Grid: (B*F*H, L/bq, S*L/bk) — the kv axis covers every source slot's token
blocks; flash accumulators live in VMEM scratch across the kv axis and the
output block is written on the last kv step (the standard TPU flash pattern,
see jax.experimental.pallas.ops.tpu.flash_attention).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from univst_tpu.attention.ops import resolve_frame_indices

_NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    srcs_ref,  # [F, S] int32
    mult_ref,  # [F, S] int32 slot multiplicity; 0 = dropped duplicate slot
    # inputs (blocked)
    q_ref,     # [1, bq, dh]
    k_ref,     # [1, bk, dh]
    v_ref,     # [1, bk, dh]  (lane ``sum_lane`` holds 1.0 — see below)
    # optional inputs (blocked; present when ctx_valid is not None)
    # ctx_k_ref, ctx_v_ref: [1, lc, dh] — the target row's own context KV
    # outputs
    # o_ref,     [1, bq, dh]
    # scratch
    # m_ref,     [bq, 128] running max
    # l_ref,     [bq, 128] running sum (used only when sum_lane is None)
    # acc_ref,   [bq, dh] accumulator (lane ``sum_lane`` = running softmax sum)
    *refs,
    sm_scale: float,
    kv_steps: int,
    nk: int,
    fh: int,
    h: int,
    sum_lane: int | None,
    unroll: int = 1,
    dual: bool = False,
    ctx_valid: int | None = None,
):
    if ctx_valid is not None:
        ctx_k_ref, ctx_v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        ctx_k_ref = ctx_v_ref = None
        o_ref, m_ref, l_ref, acc_ref = refs

    def _sq(ref):
        return ref[0]
    # At the video shapes this kernel is VPU-bound, not MXU-bound: the
    # per-logit elementwise chain costs more than the two padded matmuls
    # (L=4096, S=2L, dh 40->128: ~26 ms of exp/reduce vs ~22 ms of MXU per
    # layer). Two consequences:
    #   * the softmax runs in base 2 with sm_scale * log2(e) folded into the
    #     q block (one [bq, dh] pass, 1/bk-th of a logit pass) — no per-logit
    #     scale multiply, and exp2 instead of exp (XLA lowers exp as exp2 + a
    #     multiply; the fold removes that multiply too);
    #   * the softmax row-sum rides the PV matmul instead of a VPU reduction:
    #     the wrapper plants 1.0 at padding lane ``sum_lane`` of v, so
    #     acc[:, sum_lane] accumulates sum(p) on the (otherwise idle) MXU —
    #     the rescale-by-alpha bookkeeping falls out for free since the sum
    #     lives inside acc. Deletes one full [bq, bk] reduction pass per block.
    ikv = pl.program_id(2)
    # with a context block, the LAST kv step processes the target row's own
    # context KV (masked to ctx_valid tokens); main per-frame slots before it
    kv_main = kv_steps - 1 if ctx_valid is not None else kv_steps

    @pl.when(ikv == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if sum_lane is None:
            l_ref[...] = jnp.zeros_like(l_ref)

    def scaled_q():
        return (_sq(q_ref).astype(jnp.float32) * (sm_scale * 1.4426950408889634)
                ).astype(q_ref.dtype)

    def qk(qr, kr):
        return jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, bk] base-2 logits

    def chain(s, rows, vr, scale):
        """Online-softmax update of rows ``rows`` of the accumulators."""
        m_prev = m_ref[rows, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        if sum_lane is None:
            l_ref[rows] = jnp.broadcast_to(
                alpha * l_ref[rows, :1]
                + scale * jnp.sum(p, axis=1, keepdims=True),
                l_ref[rows].shape,
            )
        acc_ref[rows] = acc_ref[rows] * alpha + scale * jax.lax.dot_general(
            p.astype(vr.dtype), vr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[rows] = jnp.broadcast_to(m_new, m_ref[rows].shape)

    def run_block(k, v, scale, mask_from: int | None):
        q = scaled_q()

        def masked(s, col0: int = 0):
            # ``mask_from`` is a GLOBAL column threshold; ``col0`` is the
            # first global column of this (sub-)block — nonzero on the
            # unrolled path, where lane indices are sub-block-local.
            if mask_from is None or mask_from >= col0 + s.shape[1]:
                return s
            # context tail past ctx_valid is padding: force its logits to
            # -inf BEFORE the running max so it contributes nothing
            lanes = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            return jnp.where(lanes < mask_from, s, _NEG_INF)

        if dual:
            # INDEPENDENT q row-blocks per program (dual=2, or more via an
            # int): all QK matmuls issue first, then the softmax chains.
            # Chain A only depends on s_A, so the VLIW scheduler can run
            # chain A's VPU work under later chains' MXU time — unlike
            # sub-block unrolling over the KV axis, where the chains
            # serialize through the shared running max.
            nch = 2 if dual is True else int(dual)
            bqh = q.shape[0] // nch
            rows = [slice(i * bqh, (i + 1) * bqh) for i in range(nch)]
            ss = [masked(qk(q[r], k)) for r in rows]
            for s_i, r in zip(ss, rows):
                chain(s_i, r, v, scale)
        else:
            # Statically unrolled sub-blocks of the KV block (kept for
            # reference: measured consistently SLOWER on v5e — the chains
            # share the running max, so Mosaic serializes them).
            bk = k.shape[0] // unroll
            for j in range(unroll):
                kj = jax.lax.slice_in_dim(k, j * bk, (j + 1) * bk, axis=0)
                vj = jax.lax.slice_in_dim(v, j * bk, (j + 1) * bk, axis=0)
                chain(masked(qk(q, kj), j * bk), slice(None), vj, scale)

    # Duplicate-slot elision: softmax over duplicated keys equals softmax
    # over one copy with its probability mass scaled by the multiplicity
    # (e.g. frame 0 under [-1, 0, 'first'] attends frame 0 three times).
    # Dropped slots (mult 0) skip the whole block body — the MXU work
    # vanishes; kept representative slots scale the PV contribution (and the
    # in-acc softmax sum, which rides the same matmul) by mult. Exact.
    tgt_f = (pl.program_id(0) % fh) // h
    # clamp: on the ctx step ikv // nk would index past the slot table
    mult = mult_ref[tgt_f, jnp.minimum(ikv // nk, mult_ref.shape[1] - 1)]

    @pl.when((ikv < kv_main) & (mult > 0))
    def _body():
        run_block(_sq(k_ref), _sq(v_ref), mult.astype(jnp.float32), None)

    if ctx_valid is not None:

        @pl.when(ikv == kv_steps - 1)
        def _ctx_body():
            run_block(_sq(ctx_k_ref), _sq(ctx_v_ref), jnp.float32(1.0),
                      ctx_valid)

    @pl.when(ikv == kv_steps - 1)
    def _finish():
        acc = acc_ref[...]
        denom = (
            l_ref[:, :1] if sum_lane is None else acc[:, sum_lane][:, None]
        )
        o_ref[0] = (acc / denom).astype(o_ref.dtype)


def video_flash_attention(
    q, k, v, frame_indices: Sequence, sm_scale: float | None = None,
    block_q: int = 1024, block_k: int = 1024, unroll: int | None = None,
    dual: bool | None = None, interpret: bool = False,
    ctx_k=None, ctx_v=None, ctx_valid: int | None = None,
    narrow_qk: bool | None = None,
):
    """Attention where each frame's KV is the concat of the frames selected by
    ``frame_indices`` — computed WITHOUT materializing the expanded KV.

    Args:
      q: ``[B, F, H, Lq, dh]`` — Lq may differ from the KV length (SD3's
        joint attention runs the image-token queries and the short
        context-token queries as two calls against the same KV).
      k, v: ``[B, F, H, L, dh]``.
      frame_indices: static sparse-causal index set (e.g. ``(-1, 'first')``).
      ctx_k, ctx_v: optional ``[B, F, H, Lc, dh]`` per-frame context KV
        (SD3 joint attention: every query also attends its own frame's text
        tokens). Processed as one extra masked kv step; Lc is padded to the
        lane width here and the tail masked to ``ctx_valid`` real tokens
        (default Lc). The reference instead concatenates context into the
        expanded KV before SDPA (sd3 pnp_utils.py:59-84).
    Returns ``[B, F, H, Lq, dh]``.
    """
    b, f, h, lq, dh = q.shape
    l = k.shape[3]
    if sm_scale is None:
        sm_scale = dh**-0.5
    has_ctx = ctx_k is not None
    if has_ctx:
        if ctx_valid is None:
            ctx_valid = ctx_k.shape[3]
        lc = -(-ctx_k.shape[3] // 128) * 128
        if lc != ctx_k.shape[3]:
            cpad = ((0, 0),) * 3 + ((0, lc - ctx_k.shape[3]), (0, 0))
            ctx_k, ctx_v = jnp.pad(ctx_k, cpad), jnp.pad(ctx_v, cpad)
    # Pad head_dim to the TPU lane width. When padding exists anyway, one
    # spare lane carries the softmax-sum column (sum_lane); an exact multiple
    # of 128 keeps the VPU row-sum instead of padding a whole extra tile.
    dh_pad = max(128, ((dh + 127) // 128) * 128)
    sum_lane = dh if dh < dh_pad else None
    # narrow_qk: keep q/k at a sub-lane-width head dim (padded only to the
    # fp32 sublane quantum, 8) instead of the full 128 lanes. The QK matmul
    # contracts over dh — the pad lanes are zeros and contribute nothing —
    # so narrow blocks halve the q/k HBM traffic (and the pad-copy writes)
    # at dh=64 and let Mosaic issue a shallower MXU contraction. v keeps the
    # 128-lane pad: the PV output width and the in-acc softmax-sum lane both
    # need it. Opt-in via UNIVST_NARROW_QK=1 until measured on every shape.
    if narrow_qk is None:
        import os

        narrow_qk = sum_lane is not None and os.environ.get(
            "UNIVST_NARROW_QK", "0"
        ) == "1"
    # Hard gate (regardless of caller/env): the narrow block's minor dim is
    # the sublane-rounded head dim; a minor dim >128 that is not a multiple
    # of 128 is the layout class Mosaic does not support (same rule as
    # _flash_eligible, ops.py). dh=160 would give 160-lane q/k blocks —
    # fall back to the full 256-lane pad, which is safe.
    if narrow_qk:
        dh_sub = -(-dh // 8) * 8
        if dh_sub > 128 and dh_sub % 128 != 0:
            narrow_qk = False
    dh_qk = -(-dh // 8) * 8 if narrow_qk else dh_pad
    if dh_qk != dh:
        qk_pad = ((0, 0),) * 4 + ((0, dh_qk - dh),)
        q, k = jnp.pad(q, qk_pad), jnp.pad(k, qk_pad)
        if has_ctx:
            ctx_k = jnp.pad(ctx_k, qk_pad)
    if dh_pad != dh:
        pad = ((0, 0),) * 4 + ((0, dh_pad - dh),)
        v = jnp.pad(v, pad)
        if has_ctx:
            ctx_v = jnp.pad(ctx_v, pad)
    if sum_lane is not None:
        # ones at the sum lane (jnp.pad can't write a single lane; one cheap
        # fused update)
        ones = jnp.zeros((dh_pad,), v.dtype).at[sum_lane].set(1.0)
        v = v + ones
        if has_ctx:
            # the ctx softmax mass must ride the same sum lane — but ONLY for
            # the ctx_valid real tokens (masked logits still produce
            # p = exp2(-1e30 - m) = 0, so padded rows add nothing anyway)
            ctx_v = ctx_v + ones
    bq = min(block_q, lq)
    bk = min(block_k, l)
    if lq % bq or l % bk:
        # the grid is (lq // bq, l // bk) — a non-dividing block would
        # silently leave tail q rows unwritten and tail KV unattended
        raise ValueError(
            f"block_q={bq} / block_k={bk} must divide q length {lq} / "
            f"kv length {l}"
        )
    nq = lq // bq
    nk = l // bk
    if unroll is None:
        # measured on v5e: sub-block unrolling (hoped-for MXU/VPU overlap)
        # is a consistent 5-30% REGRESSION — Mosaic serializes the chains —
        # so the single full-block body stays the default
        unroll = 1
    elif unroll > 1 and bk % unroll:
        raise ValueError(f"unroll {unroll} must divide block_k {bk}")
    if has_ctx and unroll > 1 and lc % unroll:
        # the ctx step runs the same unrolled body over the [lc, dh] block;
        # a non-dividing unroll would silently drop the tail sub-block
        raise ValueError(
            f"unroll {unroll} must divide the padded context length {lc}")
    srcs = np.stack(resolve_frame_indices(tuple(frame_indices), f), axis=1)  # [F, S]
    s_slots = srcs.shape[1]
    kv_steps = s_slots * nk + (1 if has_ctx else 0)
    # per-(frame, slot) multiplicity: first occurrence of a source frame
    # keeps the slot with count = #duplicates, later occurrences drop to 0
    mult = np.zeros_like(srcs)
    for fi in range(f):
        for sj in range(s_slots):
            if (srcs[fi, :sj] == srcs[fi, sj]).any():
                continue  # duplicate of an earlier slot -> dropped
            mult[fi, sj] = int((srcs[fi] == srcs[fi, sj]).sum())

    qv = q.reshape(b * f * h, lq, dh_qk)

    def q_map(ibfh, iq, ikv, srcs_ref, mult_ref):
        return (ibfh, iq, 0)

    def kv_map(ibfh, iq, ikv, srcs_ref, mult_ref):
        fh = ibfh % (f * h)
        tgt_f = fh // h
        hh = fh % h
        bb = ibfh // (f * h)
        # clamp to the last real slot on the ctx step (block fetched, unused)
        slot = jnp.minimum(ikv // nk, s_slots - 1)
        src_f = srcs_ref[tgt_f, slot]
        return (bb * f * h + src_f * h + hh, jnp.minimum(ikv % nk, nk - 1), 0)

    def ctx_map(ibfh, iq, ikv, srcs_ref, mult_ref):
        return (ibfh, 0, 0)

    in_specs = [
        pl.BlockSpec((1, bq, dh_qk), q_map),
        pl.BlockSpec((1, bk, dh_qk), kv_map),
        pl.BlockSpec((1, bk, dh_pad), kv_map),
    ]
    if has_ctx:
        in_specs += [
            pl.BlockSpec((1, lc, dh_qk), ctx_map),
            pl.BlockSpec((1, lc, dh_pad), ctx_map),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * f * h, nq, kv_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dh_pad), q_map),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dh_pad), jnp.float32),
        ],
    )
    if dual is None:
        dual = bq >= 256 and bq % 2 == 0
    elif dual:
        # bqh = bq // nch must cover every row — a remainder would silently
        # drop the tail rows
        nch = 2 if dual is True else int(dual)
        if nch < 1 or bq % nch:
            raise ValueError(
                f"dual={dual} requires block_q divisible by the chain count, "
                f"got block_q={bq}"
            )
    kern = functools.partial(
        _kernel, sm_scale=float(sm_scale), kv_steps=kv_steps, nk=nk,
        fh=f * h, h=h, sum_lane=sum_lane, unroll=unroll, dual=dual,
        ctx_valid=(ctx_valid if has_ctx else None),
    )
    operands = [
        jnp.asarray(srcs, jnp.int32), jnp.asarray(mult, jnp.int32), qv,
        k.reshape(b * f * h, l, dh_qk), v.reshape(b * f * h, l, dh_pad),
    ]
    if has_ctx:
        operands += [
            ctx_k.reshape(b * f * h, lc, dh_qk),
            ctx_v.reshape(b * f * h, lc, dh_pad),
        ]
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * f * h, lq, dh_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the [bq, bk] fp32 logit block dominates scoped VMEM; the default
            # 16 MB limit rejects (2048, 2048)-class blocks that fit easily in
            # the 128 MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    out = out.reshape(b, f, h, lq, dh_pad)
    return out[..., :dh] if dh_pad != dh else out


def _kernel_folded(
    # scalar prefetch
    srcs_ref,   # [F, S] int32
    mult_ref,   # [F, S] int32
    # blocked inputs: 128-lane windows of token-major [B, F, L, H*dh] arrays;
    # each lane window packs g = 128 // dh heads side by side
    q_ref,      # [1, 1, bq, 128]
    k_ref,      # [1, 1, bk, 128]
    v_ref,      # [1, 1, bk, 128]
    *refs,      # (ctx_k, ctx_v when ctx_valid), o, m, l, acc
    sm_scale: float,
    kv_steps: int,
    nk: int,
    fh2: int,   # f * (h // g)
    h2: int,    # h // g
    g: int,     # heads per 128-lane block
    dh: int,
    nch: int,   # independent q row chains per (group) — see _kernel dual
    ctx_valid: int | None,
):
    """Token-major ("folded") variant of :func:`_kernel`.

    The q/k/v blocks are raw 128-lane windows of the projection output
    ``[B*F, L, H*dh]`` — no head transpose, no pad copy, no lane re-layout
    ever materializes. Each window holds ``g = 128 // dh`` heads side by
    side, so the kernel runs ``g`` block-diagonal attention problems per
    program: group ``gi`` contracts lanes ``[gi*dh, (gi+1)*dh)`` of q against
    the same lanes of k (the narrow-QK geometry — identical MXU cost, since a
    sub-128 contraction spends the same passes as a padded one), and
    accumulates PV into the same lane range of the [bq, 128] accumulator.
    The g * nch softmax chains are mutually independent, which is exactly the
    structure the VLIW scheduler needs to hide the VPU softmax under MXU work
    (the classic kernel gets this only from its row chains). Softmax row
    sums live in lane ``gi`` of the l scratch (one scalar per row per group;
    no spare v lane exists to carry an MXU-side sum, and none is needed —
    the VPU sum here replaces the *pad copies* the classic layout pays).
    """
    if ctx_valid is not None:
        ctx_k_ref, ctx_v_ref, o_ref, *scr = refs
    else:
        ctx_k_ref = ctx_v_ref = None
        o_ref, *scr = refs
    # per-group scratch (full-register [bq, 128] buffers — single-lane
    # read-modify-writes measured a ~40% kernel regression): g running-max
    # buffers, g accumulators, plus a VPU running-sum buffer only for g=1
    # (no spare lane exists there; for g>1 the softmax sum rides a
    # neighboring group's lane of the accumulator — see run_block)
    m_refs = scr[:g]
    acc_refs = scr[g : 2 * g]
    l_ref = scr[2 * g] if g == 1 else None
    sum_lanes = [None if g == 1 else (gi * dh + dh) % 128 for gi in range(g)]
    ikv = pl.program_id(2)
    kv_main = kv_steps - 1 if ctx_valid is not None else kv_steps

    @pl.when(ikv == 0)
    def _init():
        for r in m_refs:
            r[...] = jnp.full_like(r, _NEG_INF)
        for r in acc_refs:
            r[...] = jnp.zeros_like(r)
        if l_ref is not None:
            l_ref[...] = jnp.zeros_like(l_ref)

    def scaled_q():
        return (q_ref[0, 0].astype(jnp.float32) * (sm_scale * 1.4426950408889634)
                ).astype(q_ref.dtype)

    def qk(qr, kr):
        return jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def chain(s, rows, gi, vs, scale):
        """Classic online-softmax update of rows ``rows`` of group ``gi``
        (identical structure to :func:`_kernel`'s chain — full-register
        broadcasts, accumulator rescale, PV + in-acc sum on the MXU)."""
        m_ref, acc_ref = m_refs[gi], acc_refs[gi]
        m_prev = m_ref[rows, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        if l_ref is not None:
            l_ref[rows] = jnp.broadcast_to(
                alpha * l_ref[rows, :1]
                + scale * jnp.sum(p, axis=1, keepdims=True),
                l_ref[rows].shape,
            )
        acc_ref[rows] = acc_ref[rows] * alpha + scale * jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[rows] = jnp.broadcast_to(m_new, m_ref[rows].shape)

    def run_block(kb, vb, scale, mask_from: int | None):
        q = scaled_q()

        def masked(s):
            if mask_from is None or mask_from >= s.shape[1]:
                return s
            lanes = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            return jnp.where(lanes < mask_from, s, _NEG_INF)

        bqh = q.shape[0] // nch
        rows = [slice(i * bqh, (i + 1) * bqh) for i in range(nch)]
        vlanes = jax.lax.broadcasted_iota(jnp.int32, vb.shape, 1)
        for gi in range(g):
            cols = slice(gi * dh, (gi + 1) * dh)
            qg = q[:, cols]
            kg = kb[:, cols]
            if sum_lanes[gi] is None:
                vs = vb  # g=1: full-width v, VPU running sum
            else:
                # PV runs against the RAW 128-lane v block: the own-group
                # lanes produce the real PV, the sum lane (one lane of a
                # NEIGHBORING group, forced to 1.0 by one select) carries
                # the softmax mass on the MXU, and the remaining lanes
                # accumulate junk that is never read. One VPU select per
                # block replaces a per-logit reduction pass.
                vs = jnp.where(vlanes == sum_lanes[gi],
                               jnp.ones_like(vb), vb)
            ss = [masked(qk(qg[r], kg)) for r in rows]
            for s_i, r in zip(ss, rows):
                chain(s_i, r, gi, vs, scale)

    tgt_f = (pl.program_id(0) % fh2) // h2
    mult = mult_ref[tgt_f, jnp.minimum(ikv // nk, mult_ref.shape[1] - 1)]

    @pl.when((ikv < kv_main) & (mult > 0))
    def _body():
        run_block(k_ref[0, 0], v_ref[0, 0], mult.astype(jnp.float32), None)

    if ctx_valid is not None:

        @pl.when(ikv == kv_steps - 1)
        def _ctx_body():
            run_block(ctx_k_ref[0, 0], ctx_v_ref[0, 0], jnp.float32(1.0),
                      ctx_valid)

    @pl.when(ikv == kv_steps - 1)
    def _finish():
        outs = []
        for gi in range(g):
            acc = acc_refs[gi][...]
            denom = (
                l_ref[:, :1] if l_ref is not None
                else acc[:, sum_lanes[gi]][:, None]
            )
            outs.append(acc[:, gi * dh : (gi + 1) * dh] / denom)
        o_ref[0, 0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def video_flash_attention_folded(
    q, k, v, frame_indices: Sequence, sm_scale: float | None = None,
    block_q: int = 1024, block_k: int = 1024, dual: bool | int | None = None,
    interpret: bool = False,
    ctx_k=None, ctx_v=None, ctx_valid: int | None = None,
):
    """Token-major variant: q ``[B, F, Lq, H, dh]``, k/v ``[B, F, L, H, dh]``
    (= a free reshape of the projection output ``[B*F, L, H*dh]``), output in
    the same layout.

    The classic entry point wants head-major ``[B, F, H, L, dh]`` operands, so
    every layer pays four [L, H] transposes (q, k, v in; out back) plus the v
    128-lane pad copy — ~5-6 ms/layer at the SD3 b32 shape, measured as the
    gap between the ablated attention cost and the kernel call itself
    (ROUND4_NOTES anatomy). Here the head axis rides the 128-lane BlockSpec
    windows of the token-major array (g = 128 // dh heads per window,
    block-diagonal groups inside the kernel — see :func:`_kernel_folded`), so
    nothing is ever transposed or padded and the output feeds the
    out-projection GEMM directly.

    Requires ``128 % dh == 0`` and ``h % (128 // dh) == 0`` (SD3: dh=64,
    g=2). Callers with other head dims use the classic entry point.
    """
    b, f, lq, h, dh = q.shape
    l = k.shape[2]
    if 128 % dh or h % (128 // dh):
        raise ValueError(
            f"folded layout requires 128 % dh == 0 and h % (128//dh) == 0, "
            f"got dh={dh}, h={h}"
        )
    g = 128 // dh
    h2 = h // g
    if sm_scale is None:
        sm_scale = dh**-0.5
    has_ctx = ctx_k is not None

    def fold(x):
        # 4D [B, F, L, H*dh]: the 128-lane BlockSpec windows along the last
        # axis are exactly the head groups — a free view of the caller's
        # token-major tensors
        return x.reshape(b, f, x.shape[2], h * dh)

    q, k, v = fold(q), fold(k), fold(v)
    if has_ctx:
        if ctx_valid is None:
            ctx_valid = ctx_k.shape[2]
        lc = -(-ctx_k.shape[2] // 128) * 128
        ctx_k, ctx_v = fold(ctx_k), fold(ctx_v)
        if lc != ctx_k.shape[2]:
            cpad = ((0, 0), (0, 0), (0, lc - ctx_k.shape[2]), (0, 0))
            ctx_k, ctx_v = jnp.pad(ctx_k, cpad), jnp.pad(ctx_v, cpad)
    bq = min(block_q, lq)
    bk = min(block_k, l)
    if lq % bq or l % bk:
        raise ValueError(
            f"block_q={bq} / block_k={bk} must divide q length {lq} / "
            f"kv length {l}"
        )
    nq = lq // bq
    nk = l // bk
    srcs = np.stack(resolve_frame_indices(tuple(frame_indices), f), axis=1)
    s_slots = srcs.shape[1]
    kv_steps = s_slots * nk + (1 if has_ctx else 0)
    mult = np.zeros_like(srcs)
    for fi in range(f):
        for sj in range(s_slots):
            if (srcs[fi, :sj] == srcs[fi, sj]).any():
                continue
            mult[fi, sj] = int((srcs[fi] == srcs[fi, sj]).sum())

    def q_map(ibfh, iq, ikv, srcs_ref, mult_ref):
        fh = ibfh % (f * h2)
        return (ibfh // (f * h2), fh // h2, iq, fh % h2)

    def kv_map(ibfh, iq, ikv, srcs_ref, mult_ref):
        fh = ibfh % (f * h2)
        tgt_f = fh // h2
        hh = fh % h2
        bb = ibfh // (f * h2)
        slot = jnp.minimum(ikv // nk, s_slots - 1)
        src_f = srcs_ref[tgt_f, slot]
        return (bb, src_f, jnp.minimum(ikv % nk, nk - 1), hh)

    def ctx_map(ibfh, iq, ikv, srcs_ref, mult_ref):
        fh = ibfh % (f * h2)
        return (ibfh // (f * h2), fh // h2, 0, fh % h2)

    in_specs = [
        pl.BlockSpec((1, 1, bq, 128), q_map),
        pl.BlockSpec((1, 1, bk, 128), kv_map),
        pl.BlockSpec((1, 1, bk, 128), kv_map),
    ]
    if has_ctx:
        lc_pad = ctx_k.shape[2]
        in_specs += [
            pl.BlockSpec((1, 1, lc_pad, 128), ctx_map),
            pl.BlockSpec((1, 1, lc_pad, 128), ctx_map),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * f * h2, nq, kv_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, 128), q_map),
        scratch_shapes=(
            [pltpu.VMEM((bq, 128), jnp.float32) for _ in range(2 * g)]
            + ([pltpu.VMEM((bq, 128), jnp.float32)] if g == 1 else [])
        ),
    )
    if dual is None:
        nch = 2 if (bq >= 256 and bq % 2 == 0) else 1
    else:
        nch = (2 if dual is True else int(dual)) if dual else 1
    if nch < 1 or bq % nch:
        raise ValueError(
            f"dual={dual} requires block_q divisible by the chain count, "
            f"got block_q={bq}"
        )
    kern = functools.partial(
        _kernel_folded, sm_scale=float(sm_scale), kv_steps=kv_steps, nk=nk,
        fh2=f * h2, h2=h2, g=g, dh=dh, nch=nch,
        ctx_valid=(ctx_valid if has_ctx else None),
    )
    operands = [jnp.asarray(srcs, jnp.int32), jnp.asarray(mult, jnp.int32),
                q, k, v]
    if has_ctx:
        operands += [ctx_k, ctx_v]
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f, lq, h * dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, f, lq, h, dh)
