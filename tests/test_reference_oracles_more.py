"""Reference-code oracles, round 5 (VERDICT r4 item 5).

Extends tests/test_reference_oracles.py to the method math that was
previously pinned only by hand-derived expectations:

  * RF-Solver midpoint update + loop   inversion_tools/flow_inversion.py:226-252
  * ``latent_adain`` (SD/AD variant)   backbones/video_diffusion_sd/pnp_utils.py:128-139
  * ``latent_adain`` (SD3 variant)     backbones/video_diffusion_sd3/pnp_utils.py:305-316
  * ``attention_adain`` (SD3 variant)  backbones/video_diffusion_sd3/pnp_utils.py:289-303
  * SD3 ``CrossFrameProcessor`` tensor math (sparse-causal gather + joint
    [img|ctx] SDPA)                    backbones/video_diffusion_sd3/pnp_utils.py:9-132
  * SD3 ``AttentionShiftProcessor`` shift block, intended-behavior form
    (``self.thresh2`` -> ``eta2``; the shipped line crashes on the missing
    attribute)                         backbones/video_diffusion_sd3/pnp_utils.py:181-195

As in test_reference_oracles.py, the torch oracles below are lifted VERBATIM
from the reference (modulo removing module/projection plumbing: the
processors' q/k/v enter as tensors, exactly what the JAX counterparts take)
and run against the JAX implementations on identical random inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from univst_tpu.attention.ops import (
    apply_style_shift_sd3,
    joint_video_attention,
)
from univst_tpu.core.adain import (
    attention_adain_sd3,
    latent_adain,
    latent_adain_sd3,
)
from univst_tpu.core.config import SD3_STYLE_SHIFT
from univst_tpu.core.scheduler import FlowMatchSchedule
from univst_tpu.methods.inversion import rf_solver_segment

# ---------------------------------------------------------------------------
# torch oracles, lifted from the reference
# ---------------------------------------------------------------------------


def ref_latent_adain_sd(cnt_feat, sty_feat, ad=True):
    """video_diffusion_sd/pnp_utils.py:128-139, verbatim."""
    beta = 1.0
    cnt_mean = cnt_feat.mean(dim=[0, 3, 4], keepdim=True)
    cnt_std = cnt_feat.std(dim=[0, 3, 4], keepdim=True)
    sty_mean = sty_feat.mean(dim=[0, 3, 4], keepdim=True)
    sty_std = sty_feat.std(dim=[0, 3, 4], keepdim=True)
    output_mean = beta * sty_mean + (1 - beta) * cnt_mean
    output_std = beta * sty_std + (1 - beta) * cnt_std
    if ad:
        output = F.instance_norm(cnt_feat) * output_std + output_mean
    return output.to(cnt_feat.dtype)


def ref_latent_adain_sd3(cnt_feat, sty_feat, ad=True):
    """video_diffusion_sd3/pnp_utils.py:305-316, verbatim."""
    beta = 1.0
    cnt_mean = cnt_feat.mean(dim=[2, 3], keepdim=True)
    cnt_std = cnt_feat.std(dim=[2, 3], keepdim=True)
    sty_mean = sty_feat.mean(dim=[2, 3], keepdim=True)
    sty_std = sty_feat.std(dim=[2, 3], keepdim=True)
    output_mean = beta * sty_mean + (1 - beta) * cnt_mean
    output_std = beta * sty_std + (1 - beta) * cnt_std
    if ad:
        output = F.instance_norm(cnt_feat) * output_std + output_mean
    return output.to(cnt_feat.dtype)


def ref_attention_adain_sd3(cnt_feat, sty_feat, ad=True):
    """video_diffusion_sd3/pnp_utils.py:289-303, verbatim."""
    beta = 1.0
    cnt_mean = cnt_feat.mean(dim=[-2], keepdim=True)
    cnt_std = cnt_feat.std(dim=[-2], keepdim=True)
    sty_mean = sty_feat.mean(dim=[-2], keepdim=True)
    sty_std = sty_feat.std(dim=[-2], keepdim=True)
    output_mean = beta * sty_mean + (1 - beta) * cnt_mean
    output_std = beta * sty_std + (1 - beta) * cnt_std
    if ad:
        output = F.instance_norm(cnt_feat) * output_std + output_mean
    return output.to(cnt_feat.dtype)


def ref_rf_solver_loop(image_latents, timesteps, pred_fn):
    """inversion_tools/flow_inversion.py:226-252, verbatim modulo replacing
    ``pipeline.transformer(...)`` with ``pred_fn(latents, t_scalar)`` (the
    pipeline/prompt plumbing; ``t_vec`` is ``1000 * t`` broadcast)."""
    traj = [image_latents.detach().clone()]
    for idx, (t_curr, t_prev) in enumerate(zip(timesteps[:-1], timesteps[1:])):
        pred = pred_fn(image_latents, 1000 * t_curr)
        img_mid = image_latents + (t_prev - t_curr) / 2 * pred
        pred_mid = pred_fn(img_mid, 1000 * (t_curr + (t_prev - t_curr) / 2))
        first_order = (pred_mid - pred) / ((t_prev - t_curr) / 2)
        image_latents = (
            image_latents
            + (t_prev - t_curr) * pred
            + 0.5 * (t_prev - t_curr) ** 2 * first_order
        )
        traj.append(image_latents.detach().clone())
    return traj


def ref_sd3_joint_attention(query, key, value, cq, ck, cv, clip_length,
                            index_list):
    """video_diffusion_sd3/pnp_utils.py:52-110 (CrossFrameProcessor), verbatim
    modulo taking per-head q/k/v and context projections as tensors (the
    ``attn.to_q``/``add_q_proj`` module calls) and ``einops.rearrange``
    spelled as view/permute."""
    b_f, heads, n, head_dim = key.shape
    key = key.reshape(b_f // clip_length, clip_length, heads, n, head_dim)
    value = value.reshape(b_f // clip_length, clip_length, heads, n, head_dim)
    frame_index_list = []
    for index in index_list:
        if isinstance(index, str):
            if index == "first":
                frame_index = [0] * clip_length
            elif index == "last":
                frame_index = [clip_length - 1] * clip_length
            elif (index == "mid") or (index == "middle"):
                frame_index = [int(clip_length - 1) // 2] * clip_length
        else:
            assert isinstance(index, int), "relative index must be int"
            frame_index = torch.arange(clip_length) + index
            frame_index = frame_index.clip(0, clip_length - 1)
        frame_index_list.append(frame_index)
    key = torch.cat([key[:, fi] for fi in frame_index_list], dim=-2)
    value = torch.cat([value[:, fi] for fi in frame_index_list], dim=-2)
    key = key.reshape(b_f, heads, -1, head_dim)
    value = value.reshape(b_f, heads, -1, head_dim)
    query = torch.cat([query, cq], dim=2)
    key = torch.cat([key, ck], dim=2)
    value = torch.cat([value, cv], dim=2)
    return F.scaled_dot_product_attention(
        query, key, value, attn_mask=None, dropout_p=0.0, is_causal=False
    )


def ref_sd3_attention_shift(query, key, value, idx, eta1, eta2):
    """video_diffusion_sd3/pnp_utils.py:181-195 (AttentionShiftProcessor
    shift block), verbatim in intended-behavior form: the shipped beta line
    reads ``self.thresh2``, an attribute the class never sets (it would raise
    AttributeError on first use inside the window) — ``eta2`` is the
    evidently intended threshold and is substituted here."""
    batch_size = query.shape[0]
    chunk_size = batch_size // 3
    if idx >= eta1 * 50 and idx <= eta2 * 50:
        alpha = 0.8
        beta = (0.9 - 0.1) / (eta1 * 50 - eta2 * 50) * (idx - eta2 * 50) + 0.1
        gamma = 2.0
        query[2 * chunk_size: 3 * chunk_size] = (
            alpha * query[:chunk_size]
            + (1 - alpha) * query[2 * chunk_size: 3 * chunk_size]
        )
        key[2 * chunk_size: 3 * chunk_size] = beta * ref_attention_adain_sd3(
            key[2 * chunk_size: 3 * chunk_size], key[chunk_size: 2 * chunk_size]
        ) + (1 - beta) * key[chunk_size: 2 * chunk_size]
        value[2 * chunk_size: 3 * chunk_size] = beta * ref_attention_adain_sd3(
            value[2 * chunk_size: 3 * chunk_size],
            value[chunk_size: 2 * chunk_size],
        ) + (1 - beta) * value[chunk_size: 2 * chunk_size]
        query[2 * chunk_size: 3 * chunk_size] = (
            gamma * query[2 * chunk_size: 3 * chunk_size]
        )
    return query, key, value


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def _rand(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_latent_adain_sd_matches_reference():
    """Ours takes [F, H, W, C]; the reference [1, C, F, H, W]
    (pnp_utils.py:128 with the pipeline's batch of 1)."""
    rng = np.random.default_rng(0)
    f, h, w, c = 4, 6, 5, 3
    cnt, sty = _rand(rng, (f, h, w, c)), _rand(rng, (f, h, w, c))

    def to_ref(x):  # [F,H,W,C] -> [1,C,F,H,W]
        return torch.from_numpy(x).permute(3, 0, 1, 2)[None]

    ref = ref_latent_adain_sd(to_ref(cnt), to_ref(sty))
    ref = ref[0].permute(1, 2, 3, 0).numpy()
    ours = np.asarray(latent_adain(jnp.asarray(cnt), jnp.asarray(sty)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_latent_adain_sd3_matches_reference():
    """Ours takes [F, H, W, C]; the reference [F, C, H, W]
    (sd3 pnp_utils.py:305, frames as the batch dim)."""
    rng = np.random.default_rng(1)
    f, h, w, c = 4, 6, 5, 3
    cnt, sty = _rand(rng, (f, h, w, c)), _rand(rng, (f, h, w, c))

    def to_ref(x):  # [F,H,W,C] -> [F,C,H,W]
        return torch.from_numpy(x).permute(0, 3, 1, 2)

    ref = ref_latent_adain_sd3(to_ref(cnt), to_ref(sty))
    ref = ref.permute(0, 2, 3, 1).numpy()
    ours = np.asarray(latent_adain_sd3(jnp.asarray(cnt), jnp.asarray(sty)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_attention_adain_sd3_matches_reference():
    rng = np.random.default_rng(2)
    b, heads, n, c = 3, 2, 17, 8
    cnt, sty = _rand(rng, (b, heads, n, c)), _rand(rng, (b, heads, n, c))
    ref = ref_attention_adain_sd3(
        torch.from_numpy(cnt), torch.from_numpy(sty)
    ).numpy()
    ours = np.asarray(attention_adain_sd3(jnp.asarray(cnt), jnp.asarray(sty)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_rf_solver_step_matches_reference():
    """The single-step midpoint update (core/scheduler.py rf_solver_step) vs
    the lifted update lines on random tensors."""
    rng = np.random.default_rng(3)
    x = _rand(rng, (2, 4, 8, 8))
    v = _rand(rng, (2, 4, 8, 8))
    vm = _rand(rng, (2, 4, 8, 8))
    t_curr, t_prev = 0.35, 0.5
    dt = t_prev - t_curr
    xt = torch.from_numpy(x)
    first_order = (torch.from_numpy(vm) - torch.from_numpy(v)) / (dt / 2)
    ref = xt + dt * torch.from_numpy(v) + 0.5 * dt**2 * first_order
    ours = np.asarray(
        FlowMatchSchedule.rf_solver_step(
            jnp.asarray(v), jnp.asarray(vm), jnp.asarray(t_curr),
            jnp.asarray(t_prev), jnp.asarray(x),
        )
    )
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_rf_solver_loop_matches_reference():
    """Whole-loop parity: rf_solver_segment (the lax.scan) vs the lifted
    reference loop, both driven by the same closed-form 'denoiser'
    v = sin(x) * 0.1 + t / 1000 (elementwise, framework-agnostic). Checks
    the two-calls-per-step structure, the midpoint input/timestep, and the
    trajectory stacking."""
    rng = np.random.default_rng(4)
    x0 = _rand(rng, (1, 4, 6, 6)) * 0.3
    sigmas = np.linspace(1.0, 0.0, 6).astype(np.float32)  # inversion: flipped
    fwd = sigmas[::-1].copy()

    def pred_torch(x, t_vec):
        return torch.sin(x) * 0.1 + t_vec / 1000.0

    ref_traj = ref_rf_solver_loop(
        torch.from_numpy(x0), [torch.tensor(t) for t in fwd], pred_torch
    )

    def denoise(latent, t, i):
        del i
        return jnp.sin(latent) * 0.1 + t / 1000.0, None

    t_curr, t_prev = jnp.asarray(fwd[:-1]), jnp.asarray(fwd[1:])
    steps = jnp.arange(len(fwd) - 1)
    (_, _), traj = rf_solver_segment(
        denoise, (jnp.asarray(x0), jnp.zeros((1,), jnp.float32)), steps,
        t_curr, t_prev, train_scale=1000.0, capture_step=None,
    )
    ours = np.asarray(traj)
    ref = np.stack([t.numpy() for t in ref_traj[1:]])
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)


def _sd3_qkv(rng, branches, f, heads, n, lc, dh):
    shp = (branches * f, heads, n, dh)
    cshp = (branches * f, heads, lc, dh)
    return (
        _rand(rng, shp), _rand(rng, shp), _rand(rng, shp),
        _rand(rng, cshp), _rand(rng, cshp), _rand(rng, cshp),
    )


def test_sd3_cross_frame_joint_attention_matches_reference():
    """CrossFrameProcessor parity: sparse-causal gather + joint [img|ctx]
    SDPA (the content/style-inversion path, no shift)."""
    rng = np.random.default_rng(5)
    f, heads, n, lc, dh = 4, 2, 16, 7, 8
    q, k, v, cq, ck, cv = _sd3_qkv(rng, 1, f, heads, n, lc, dh)
    idxs = ("first", -1, 0)
    ref = ref_sd3_joint_attention(
        *(torch.from_numpy(a) for a in (q, k, v, cq, ck, cv)),
        clip_length=f, index_list=list(idxs),
    ).numpy()
    ours = np.asarray(
        joint_video_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), f, idxs,
            cq=jnp.asarray(cq), ck=jnp.asarray(ck), cv=jnp.asarray(cv),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("idx,in_window", [(10, True), (45, False)])
def test_sd3_attention_shift_matches_reference(idx, in_window):
    """AttentionShiftProcessor parity end-to-end: the AdaIN shift block on
    the 3-branch batch, then the joint attention — vs the lifted reference
    math (intended-behavior thresh2 form)."""
    rng = np.random.default_rng(6)
    f, heads, n, lc, dh = 2, 2, 12, 5, 8
    q, k, v, cq, ck, cv = _sd3_qkv(rng, 3, f, heads, n, lc, dh)
    cfg = SD3_STYLE_SHIFT
    qt, kt, vt = (torch.from_numpy(a.copy()) for a in (q, k, v))
    qt, kt, vt = ref_sd3_attention_shift(qt, kt, vt, idx, cfg.eta1, cfg.eta2)
    assert (qt.numpy() != q).any() == in_window
    ref = ref_sd3_joint_attention(
        qt, kt, vt, *(torch.from_numpy(a) for a in (cq, ck, cv)),
        clip_length=f, index_list=["first", -1, 0],
    ).numpy()
    qs, ks, vs = apply_style_shift_sd3(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(idx),
        cfg, f,
    )
    ours = np.asarray(
        joint_video_attention(
            qs, ks, vs, f, ("first", -1, 0),
            cq=jnp.asarray(cq), ck=jnp.asarray(ck), cv=jnp.asarray(cv),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
