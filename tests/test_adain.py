"""AdaIN parity tests against torch F.instance_norm ground truth.

These encode the *actual* reference semantics (including the instance_norm
axis quirks documented in univst_tpu/core/adain.py) using torch as the oracle.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from univst_tpu.core.adain import (
    attention_adain,
    attention_adain_sd3,
    attention_adain_sd3_tm,
    latent_adain,
    latent_adain_sd3,
)


def _torch_adain(cnt: torch.Tensor, sty: torch.Tensor, dims) -> torch.Tensor:
    """The reference formula: F.instance_norm(cnt) * sty.std(dims) + sty.mean(dims)."""
    sty_mean = sty.mean(dim=dims, keepdim=True)
    sty_std = sty.std(dim=dims, keepdim=True)
    return F.instance_norm(cnt) * sty_std + sty_mean


def test_attention_adain_matches_torch():
    rng = np.random.default_rng(0)
    cnt = rng.standard_normal((6, 32, 16)).astype(np.float32)
    sty = rng.standard_normal((6, 32, 16)).astype(np.float32)
    want = _torch_adain(torch.from_numpy(cnt), torch.from_numpy(sty), dims=[1]).numpy()
    got = np.asarray(attention_adain(jnp.asarray(cnt), jnp.asarray(sty)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attention_adain_sd3_matches_torch():
    rng = np.random.default_rng(1)
    cnt = rng.standard_normal((4, 3, 24, 8)).astype(np.float32)
    sty = rng.standard_normal((4, 3, 24, 8)).astype(np.float32)
    want = _torch_adain(torch.from_numpy(cnt), torch.from_numpy(sty), dims=[-2]).numpy()
    got = np.asarray(attention_adain_sd3(jnp.asarray(cnt), jnp.asarray(sty)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attention_adain_sd3_tm_matches_head_major():
    """The token-major variant ([B, N, H, C], the transpose-free attention
    layout) must equal the head-major form under a transpose."""
    rng = np.random.default_rng(11)
    cnt = rng.standard_normal((4, 3, 24, 8)).astype(np.float32)  # [B, H, N, C]
    sty = rng.standard_normal((4, 3, 24, 8)).astype(np.float32)
    want = np.asarray(attention_adain_sd3(jnp.asarray(cnt), jnp.asarray(sty)))
    got = np.asarray(
        attention_adain_sd3_tm(
            jnp.asarray(cnt.transpose(0, 2, 1, 3)),
            jnp.asarray(sty.transpose(0, 2, 1, 3)),
        )
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_latent_adain_matches_torch():
    rng = np.random.default_rng(2)
    # reference layout [1, C, F, H, W]; ours [F, H, W, C]
    cnt_t = rng.standard_normal((1, 4, 5, 8, 8)).astype(np.float32)
    sty_t = rng.standard_normal((1, 4, 5, 8, 8)).astype(np.float32)
    want = _torch_adain(
        torch.from_numpy(cnt_t), torch.from_numpy(sty_t), dims=[0, 3, 4]
    ).numpy()[0].transpose(1, 2, 3, 0)
    cnt = jnp.asarray(cnt_t[0].transpose(1, 2, 3, 0))
    sty = jnp.asarray(sty_t[0].transpose(1, 2, 3, 0))
    got = np.asarray(latent_adain(cnt, sty))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_latent_adain_sd3_matches_torch():
    rng = np.random.default_rng(3)
    # reference layout [F, C, H, W]; ours [F, H, W, C]
    cnt_t = rng.standard_normal((5, 4, 8, 8)).astype(np.float32)
    sty_t = rng.standard_normal((5, 4, 8, 8)).astype(np.float32)
    want = _torch_adain(
        torch.from_numpy(cnt_t), torch.from_numpy(sty_t), dims=[2, 3]
    ).numpy().transpose(0, 2, 3, 1)
    cnt = jnp.asarray(cnt_t.transpose(0, 2, 3, 1))
    sty = jnp.asarray(sty_t.transpose(0, 2, 3, 1))
    got = np.asarray(latent_adain_sd3(cnt, sty))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_adain_moment_transfer_invariant():
    """After AdaIN, output per-style-stat-axis moments match the style's."""
    rng = np.random.default_rng(4)
    cnt = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32)) * 3.0 + 1.0
    sty = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32)) * 0.5 - 2.0
    out = np.asarray(attention_adain(cnt, sty))
    sty_np = np.asarray(sty)
    # means transfer exactly only when the normalized content has zero mean
    # along the style axis; check the weaker invariant: output mean is within
    # the style mean +/- output std scale (sanity, not exact).
    assert np.abs(out.mean() - sty_np.mean()) < 1.0
