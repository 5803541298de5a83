"""Tests for functional attention ops: cross-frame KV gather, style shift, MHA."""

import numpy as np
import jax.numpy as jnp

from univst_tpu.attention.ops import (
    apply_style_shift,
    cross_frame_kv,
    mha,
    resolve_frame_indices,
)
from univst_tpu.core.adain import attention_adain
from univst_tpu.core.config import SD_STYLE_SHIFT, AD_STYLE_SHIFT


def test_resolve_frame_indices():
    fi = resolve_frame_indices((-1, 0, "first", "last", "mid"), 8)
    np.testing.assert_array_equal(fi[0], [0, 0, 1, 2, 3, 4, 5, 6])  # clip(arange-1)
    np.testing.assert_array_equal(fi[1], np.arange(8))
    np.testing.assert_array_equal(fi[2], np.zeros(8))
    np.testing.assert_array_equal(fi[3], np.full(8, 7))
    np.testing.assert_array_equal(fi[4], np.full(8, 3))


def test_cross_frame_kv_matches_loop():
    rng = np.random.default_rng(0)
    b, f, l, d = 3, 4, 6, 5
    x = rng.standard_normal((b * f, l, d)).astype(np.float32)
    got = np.asarray(cross_frame_kv(jnp.asarray(x), f, (-1, "first")))
    assert got.shape == (b * f, 2 * l, d)
    xv = x.reshape(b, f, l, d)
    prev = np.clip(np.arange(f) - 1, 0, f - 1)
    for bi in range(b):
        for fi in range(f):
            expected = np.concatenate([xv[bi, prev[fi]], xv[bi, 0]], axis=0)
            np.testing.assert_allclose(got[bi * f + fi], expected)


def test_style_shift_inside_window():
    rng = np.random.default_rng(1)
    f, l, d = 2, 8, 4
    q = rng.standard_normal((3 * f, l, d)).astype(np.float32)
    k = rng.standard_normal((3 * f, l, d)).astype(np.float32)
    v = rng.standard_normal((3 * f, l, d)).astype(np.float32)
    cfg = SD_STYLE_SHIFT
    step = 10  # inside [0, 25]
    qo, ko, vo = apply_style_shift(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), step, cfg, f
    )
    qo, ko, vo = map(np.asarray, (qo, ko, vo))
    # content & style chunks untouched
    np.testing.assert_allclose(qo[: 2 * f], q[: 2 * f])
    np.testing.assert_allclose(ko[: 2 * f], k[: 2 * f])
    # stylized q: gamma * (alpha*q_cnt + (1-alpha)*q_sty)
    expected_q = cfg.gamma * (cfg.alpha * q[:f] + (1 - cfg.alpha) * q[2 * f :])
    np.testing.assert_allclose(qo[2 * f :], expected_q, rtol=1e-5)
    # stylized k: beta*adain(k_sty, k_style) + (1-beta)*k_style
    beta = float(cfg.beta(step))
    assert abs(beta - ((0.9 - 0.1) / (0 - 25) * (10 - 25) + 0.1)) < 1e-6
    ad = np.asarray(attention_adain(jnp.asarray(k[2 * f :]), jnp.asarray(k[f : 2 * f])))
    expected_k = beta * ad + (1 - beta) * k[f : 2 * f]
    np.testing.assert_allclose(ko[2 * f :], expected_k, rtol=1e-4, atol=1e-5)


def test_style_shift_outside_window_is_identity():
    rng = np.random.default_rng(2)
    f, l, d = 2, 4, 4
    q = jnp.asarray(rng.standard_normal((3 * f, l, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3 * f, l, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((3 * f, l, d)).astype(np.float32))
    qo, ko, vo = apply_style_shift(q, k, v, 30, SD_STYLE_SHIFT, f)  # 30 > 25
    np.testing.assert_allclose(np.asarray(qo), np.asarray(q))
    np.testing.assert_allclose(np.asarray(ko), np.asarray(k))
    np.testing.assert_allclose(np.asarray(vo), np.asarray(v))


def test_window_quirks():
    # SD: lower bound unscaled (idx >= eta1), upper inclusive (idx <= eta2*50)
    assert bool(SD_STYLE_SHIFT.window_gate(25))
    assert not bool(SD_STYLE_SHIFT.window_gate(26))
    # AD: upper exclusive (idx < eta2*50)
    assert bool(AD_STYLE_SHIFT.window_gate(24))
    assert not bool(AD_STYLE_SHIFT.window_gate(25))


def test_mha_matches_naive():
    rng = np.random.default_rng(3)
    b, l, h, dh = 2, 6, 2, 4
    d = h * dh
    q = rng.standard_normal((b, l, d)).astype(np.float32)
    k = rng.standard_normal((b, l, d)).astype(np.float32)
    v = rng.standard_normal((b, l, d)).astype(np.float32)
    got = np.asarray(mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h))

    def naive(q, k, v):
        out = np.zeros_like(q)
        for bi in range(b):
            for hi in range(h):
                qs = q[bi, :, hi * dh : (hi + 1) * dh]
                ks = k[bi, :, hi * dh : (hi + 1) * dh]
                vs = v[bi, :, hi * dh : (hi + 1) * dh]
                logits = qs @ ks.T / np.sqrt(dh)
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                out[bi, :, hi * dh : (hi + 1) * dh] = p @ vs
        return out

    np.testing.assert_allclose(got, naive(q, k, v), rtol=1e-4, atol=1e-5)
