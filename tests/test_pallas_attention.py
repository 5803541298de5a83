"""Correctness test for the fused video flash attention kernel (interpret
mode on CPU) vs a naive expanded-KV reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univst_tpu.attention.ops import resolve_frame_indices
from univst_tpu.attention.pallas_attention import (
    video_flash_attention,
    video_flash_attention_folded,
)


def _naive(q, k, v, indices, ctx_k=None, ctx_v=None):
    b, f, h, lq, dh = q.shape
    maps = resolve_frame_indices(indices, f)
    outs = np.zeros_like(np.asarray(q), dtype=np.float32)
    qn, kn, vn = map(np.asarray, (q, k, v))
    for bi in range(b):
        for fi in range(f):
            ks = np.concatenate([kn[bi, m[fi]] for m in maps], axis=1)  # [h, S*l, dh]
            vs = np.concatenate([vn[bi, m[fi]] for m in maps], axis=1)
            if ctx_k is not None:
                # reference joint attention: own-frame context KV appended to
                # the expanded KV (sd3 pnp_utils.py:59-84)
                ks = np.concatenate([ks, np.asarray(ctx_k)[bi, fi]], axis=1)
                vs = np.concatenate([vs, np.asarray(ctx_v)[bi, fi]], axis=1)
            for hi in range(h):
                logits = qn[bi, fi, hi] @ ks[hi].T * (dh**-0.5)
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                outs[bi, fi, hi] = p @ vs[hi]
    return outs


@pytest.mark.parametrize("indices", [(-1, "first"), ("first", -1, 0)])
# dh=32 exercises the MXU sum-lane variant (spare padding lane carries the
# softmax row-sum); dh=128 the VPU running-sum fallback (no spare lane);
# unroll=2 the sub-block path; dual the independent-row-block pair whose
# softmax chains interleave with the matmuls
@pytest.mark.parametrize(
    "dh,unroll,dual",
    [(32, 1, False), (128, 1, False), (32, 2, False), (128, 2, False),
     (32, 1, True), (128, 1, True), (32, 1, 4), (128, 1, 4)],
)
def test_video_flash_matches_naive(indices, dh, unroll, dual):
    rng = np.random.default_rng(0)
    b, f, h, l = 1, 4, 2, 256
    q = jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
    got = np.asarray(
        video_flash_attention(q, k, v, indices, block_q=128, block_k=128,
                              unroll=unroll, dual=dual, interpret=True)
    )
    want = _naive(q, k, v, indices)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("dh", [32, 128])
# 77: non-lane-multiple ctx tail; unroll=2 splits the ctx block into
# sub-blocks whose masking must use GLOBAL column indices — (77, 2) puts the
# valid boundary inside sub-block 1, (200, 2) makes sub-block 1 entirely
# padding (regression: both were mis-masked when lanes were block-local)
@pytest.mark.parametrize("lc,unroll", [(77, 1), (128, 1), (77, 2), (200, 2)])
def test_video_flash_ctx_kv_matches_naive(dh, lc, unroll):
    """The masked context-KV step (SD3 joint attention: each query also
    attends its own frame's text tokens) vs the reference expand+concat
    semantics, including the non-128-multiple ctx_valid masking."""
    rng = np.random.default_rng(2)
    b, f, h, l = 1, 4, 2, 256
    shp = (b, f, h, l, dh)
    q, k, v = (jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3))
    ck, cv = (jnp.asarray(rng.standard_normal((b, f, h, lc, dh)), jnp.float32)
              for _ in range(2))
    got = np.asarray(
        video_flash_attention(q, k, v, ("first", -1, 0), block_q=128,
                              block_k=128, ctx_k=ck, ctx_v=cv, unroll=unroll,
                              interpret=True)
    )
    want = _naive(q, k, v, ("first", -1, 0), ctx_k=ck, ctx_v=cv)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("dh", [32, 64, 128])  # g = 4 / 2 / 1 heads per lane block
@pytest.mark.parametrize("with_ctx,lc", [(False, 0), (True, 77)])
@pytest.mark.parametrize("lq_extra", [0, 128])  # merged [img|ctx|pad] q rows
def test_video_flash_folded_matches_naive(dh, with_ctx, lc, lq_extra):
    """Token-major folded layout (head groups ride the 128-lane BlockSpec
    windows — no head transpose) vs the same naive expanded-KV reference.
    lq_extra exercises a q stream longer than the KV length (SD3's merged
    [img | ctx | pad] query rows)."""
    rng = np.random.default_rng(9)
    b, f, h, l = 1, 4, 4, 256
    lq = l + lq_extra
    q = jnp.asarray(rng.standard_normal((b, f, h, lq, dh)), jnp.float32)
    k, v = (jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
            for _ in range(2))
    kw_c, kw_f = {}, {}
    ck = cv = None
    if with_ctx:
        ck, cv = (jnp.asarray(rng.standard_normal((b, f, h, lc, dh)),
                              jnp.float32) for _ in range(2))
        kw_c = dict(ctx_k=ck, ctx_v=cv)
        kw_f = dict(ctx_k=ck.transpose(0, 1, 3, 2, 4),
                    ctx_v=cv.transpose(0, 1, 3, 2, 4))
    got = np.asarray(
        video_flash_attention_folded(
            q.transpose(0, 1, 3, 2, 4), k.transpose(0, 1, 3, 2, 4),
            v.transpose(0, 1, 3, 2, 4), ("first", -1, 0), block_q=128,
            block_k=128, dual=4, interpret=True, **kw_f,
        )
    ).transpose(0, 1, 3, 2, 4)
    want = np.asarray(
        video_flash_attention(q, k, v, ("first", -1, 0), block_q=128,
                              block_k=128, dual=4, interpret=True, **kw_c)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # and against the torch-free naive reference (full-length q only: the
    # naive helper assumes lq == l)
    if not lq_extra:
        ref = _naive(q, k, v, ("first", -1, 0), ctx_k=ck, ctx_v=cv)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("dh", [40, 64, 80])  # SD 64x64 / SD3 / SD 32x32 head dims
@pytest.mark.parametrize("with_ctx", [False, True])
def test_video_flash_narrow_qk_matches_naive(dh, with_ctx):
    """narrow_qk keeps q/k at the real head dim (padded to the sublane
    quantum only) instead of the 128-lane pad — the QK contraction over the
    zero pad lanes contributes nothing, so results must be identical; v keeps
    the 128-lane pad for the PV output and the in-acc softmax-sum lane."""
    rng = np.random.default_rng(5)
    b, f, h, l, lc = 1, 4, 2, 256, 77
    shp = (b, f, h, l, dh)
    q, k, v = (jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3))
    kw = {}
    ck = cv = None
    if with_ctx:
        ck, cv = (jnp.asarray(rng.standard_normal((b, f, h, lc, dh)),
                              jnp.float32) for _ in range(2))
        kw = dict(ctx_k=ck, ctx_v=cv)
    got = np.asarray(
        video_flash_attention(q, k, v, ("first", -1, 0), block_q=128,
                              block_k=128, dual=4, narrow_qk=True,
                              interpret=True, **kw)
    )
    want = _naive(q, k, v, ("first", -1, 0), ctx_k=ck, ctx_v=cv)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_ctx_unroll_must_divide_padded_length():
    rng = np.random.default_rng(4)
    b, f, h, l, dh = 1, 2, 1, 384, 32
    q, k, v = (jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
               for _ in range(3))
    ck, cv = (jnp.asarray(rng.standard_normal((b, f, h, 77, dh)), jnp.float32)
              for _ in range(2))  # pads to lc=128, indivisible by 3
    # unroll=3 divides block_k=96 (so the main-block check passes) but not
    # the padded ctx length 128 — must raise instead of dropping ctx columns
    with pytest.raises(ValueError, match="context length"):
        video_flash_attention(q, k, v, ("first",), block_q=128, block_k=96,
                              ctx_k=ck, ctx_v=cv, unroll=3, interpret=True)


def test_video_flash_separate_q_length():
    """Lq != L (SD3 runs the short context-token queries as a second call
    against the same per-frame KV)."""
    rng = np.random.default_rng(3)
    b, f, h, l, lq, dh = 1, 3, 2, 256, 128, 32
    q = jnp.asarray(rng.standard_normal((b, f, h, lq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, f, h, l, dh)), jnp.float32)
    got = np.asarray(
        video_flash_attention(q, k, v, ("first", -1), block_q=128,
                              block_k=128, interpret=True)
    )
    # naive with full-length q padded then sliced
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, l - lq), (0, 0)))
    want = _naive(qp, k, v, ("first", -1))[:, :, :, :lq]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_joint_video_attention_kernel_matches_reference(monkeypatch):
    """joint_video_attention's fused-kernel route (image queries + appended
    context rows) vs its own reference expand+concat+sdpa route."""
    from jax.experimental.pallas import tpu as pltpu

    from univst_tpu.attention import ops

    rng = np.random.default_rng(4)
    b, f, h, n, nc, dh = 1, 3, 2, 1024, 77, 32
    shp = (b * f, h, n, dh)
    q, k, v = (jnp.asarray(rng.standard_normal(shp), jnp.float32)
               for _ in range(3))
    cq, ck, cv = (jnp.asarray(rng.standard_normal((b * f, h, nc, dh)),
                              jnp.float32) for _ in range(3))
    idx = ("first", -1, 0)
    want = np.asarray(
        ops.joint_video_attention(q, k, v, f, idx, cq=cq, ck=ck, cv=cv)
    )
    monkeypatch.setattr(ops.jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            ops.joint_video_attention(q, k, v, f, idx, cq=cq, ck=ck, cv=cv)
        )
    assert got.shape == want.shape == (b * f, h, n + nc, dh)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_block_size_must_divide_length():
    """Non-dividing blocks raise instead of silently truncating coverage
    (ADVICE r2: nq = l // bq dropped tail rows)."""
    q = jnp.zeros((1, 2, 1, 384, 32), jnp.float32)
    with pytest.raises(ValueError, match="must divide"):
        video_flash_attention(q, q, q, ("first",), block_q=256, block_k=128)
    with pytest.raises(ValueError, match="must divide"):
        video_flash_attention(q, q, q, ("first",), block_q=128, block_k=256)


def test_dual_odd_block_raises():
    q = jnp.zeros((1, 2, 1, 385, 32), jnp.float32)
    with pytest.raises(ValueError, match="divisible by the chain count"):
        video_flash_attention(q, q, q, ("first",), block_q=385, block_k=385,
                              dual=True)
    with pytest.raises(ValueError, match="divisible by the chain count"):
        video_flash_attention(q, q, q, ("first",), block_q=385, block_k=385,
                              dual=4)


def test_largest_divisor_block():
    from univst_tpu.attention.ops import largest_divisor_block

    assert largest_divisor_block(4096) == 4096
    assert largest_divisor_block(9216) == 1024   # 768x768 -> L=9216
    assert largest_divisor_block(2304) == 256    # 384x384 at the 64-level
    assert largest_divisor_block(1152, cap=1024) == 128


@pytest.mark.parametrize("tq,s", [(300, 300), (443, 520), (256, 333)])
def test_heads_attention_flash_padding_matches_sdpa(monkeypatch, tq, s):
    """The padded-q/padded-KV + SegmentIds flash path in heads_attention,
    exercised on CPU via TPU interpret mode (ADVICE r2: the path only ran on
    hardware). Shapes are scaled-down SD3 joint lengths (non-128-multiples)."""
    from jax.experimental.pallas import tpu as pltpu

    from univst_tpu.attention import ops

    monkeypatch.setattr(ops.jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(1)
    b, h, dh = 1, 2, 32
    qh = jnp.asarray(rng.standard_normal((b, h, tq, dh)), jnp.float32)
    kh = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    vh = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    assert ops._flash_eligible(tq, s, dh)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ops.heads_attention(qh, kh, vh))
    want = np.asarray(ops.sdpa(qh, kh, vh))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
