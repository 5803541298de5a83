"""Reference-code oracles (VERDICT round-1, item 2).

The reference's pure-torch method functions are lifted VERBATIM (modulo
removing dead I/O / tqdm / pipeline plumbing) into this file as test oracles,
and run against the JAX implementations on identical inputs. This replaces
hand-rederived formulas with the actual reference code as the source of truth.

Lifted functions and their reference locations:
  * ``next_step``            inversion_tools/ddim_inversion.py:190-204
  * ``ddim_loop_plus`` core  inversion_tools/ddim_inversion.py:117-167
  * ``mask_propogation``     src/mask_propagation.py:72-99 (affinity part)
  * ``norm_mask``            src/mask_propagation.py:114-123
  * ``attention_adain``      backbones/video_diffusion_sd/pnp_utils.py:114-126
  * the SD/AD shift windows  backbones/*/pnp_utils.py:45-57
  * ``generate_eta_values``  backbones/video_diffusion_sd3/pipelines/custom_pipeline.py:18-44
"""

import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from univst_tpu.attention.ops import apply_style_shift, apply_style_shift_injected
from univst_tpu.core.config import AD_STYLE_SHIFT, SD_STYLE_SHIFT
from univst_tpu.core.scheduler import (
    DDIMSchedule,
    EasyInvConfig,
    generate_eta_values,
)
from univst_tpu.methods.inversion import ddim_invert
from univst_tpu.methods.mask_propagation import (
    MaskPropConfig,
    _propagate_one,
    norm_mask,
)

# ---------------------------------------------------------------------------
# torch oracles, lifted from the reference
# ---------------------------------------------------------------------------


def ref_next_step(model_output, timestep: int, sample, ddim_scheduler):
    """inversion_tools/ddim_inversion.py:190-204, verbatim."""
    timestep, next_timestep = min(
        timestep - ddim_scheduler.config.num_train_timesteps // ddim_scheduler.num_inference_steps, 999), timestep
    alpha_prod_t = ddim_scheduler.alphas_cumprod[timestep] if timestep >= 0 else ddim_scheduler.final_alpha_cumprod
    alpha_prod_t_next = ddim_scheduler.alphas_cumprod[next_timestep]
    beta_prod_t = 1 - alpha_prod_t

    next_original_sample = (sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
    pred_epsilon = model_output

    next_sample_direction = (1 - alpha_prod_t_next) ** 0.5 * pred_epsilon
    next_sample = alpha_prod_t_next ** 0.5 * next_original_sample + next_sample_direction

    return next_sample


def ref_ddim_loop_plus(denoise, ddim_scheduler, latent, num_inv_steps, is_opt):
    """inversion_tools/ddim_inversion.py:117-167 loop body (I/O and the dead
    num_fix_itr=0 scaffold removed; `denoise` replaces the UNet call)."""
    all_latent = [latent]
    or_latent_idx = 0.5
    inject_steps = 0.05
    inject_len = 0.2
    num_inference_steps = num_inv_steps
    latent = latent.clone().detach()
    last_latent = None
    for i in range(num_inv_steps):
        t = ddim_scheduler.timesteps[len(ddim_scheduler.timesteps) - i - 1]
        noise_pred = denoise(latent, t)
        if is_opt and (inject_steps + inject_len) * num_inference_steps > i > inject_steps * num_inference_steps:
            if i > 0:
                latent = or_latent_idx * latent + (1 - or_latent_idx) * last_latent
        last_latent = latent
        latent = ref_next_step(noise_pred, int(t), latent, ddim_scheduler)
        all_latent.append(latent)
    return all_latent


def ref_mask_propogation(feat_src, feat_tar, segs, args):
    """src/mask_propagation.py:72-88 (through segs_tar; the anchor-subsampling
    tail is RNG-stream-dependent and tested behaviorally elsewhere)."""
    feat_src = F.normalize(feat_src, dim=0, p=2)
    feat_tar = F.normalize(feat_tar, dim=1, p=2).squeeze(0)
    aff = torch.exp(feat_tar @ feat_src / args.temperature).transpose(1, 0)
    tk_val_min = torch.topk(aff, args.topk, dim=0).values.min(dim=0).values
    aff[aff < tk_val_min] = 0
    aff = aff / torch.sum(aff, keepdim=True, axis=0)
    segs_tar = torch.mm(segs, aff)
    return segs_tar


def ref_norm_mask(mask):
    """src/mask_propagation.py:114-123, verbatim."""
    c, _, _ = mask.size()
    for cnt in range(c):
        mask_cnt = mask[cnt, :, :]
        if (mask_cnt.max() > 0):
            mask_cnt = (mask_cnt - mask_cnt.min())
            mask_cnt = mask_cnt / mask_cnt.max()
            mask[cnt, :, :] = mask_cnt
    return mask


def ref_attention_adain(cnt_feat, sty_feat, ad=True):
    """backbones/video_diffusion_sd/pnp_utils.py:114-126, verbatim."""
    beta = 1.0
    cnt_mean = cnt_feat.mean(dim=[1], keepdim=True)
    cnt_std = cnt_feat.std(dim=[1], keepdim=True)
    sty_mean = sty_feat.mean(dim=[1], keepdim=True)
    sty_std = sty_feat.std(dim=[1], keepdim=True)
    output_mean = beta * sty_mean + (1 - beta) * cnt_mean
    output_std = beta * sty_std + (1 - beta) * cnt_std
    if ad:
        output = F.instance_norm(cnt_feat) * output_std + output_mean
    return output.to(cnt_feat.dtype)


def ref_attention_shift(query, key, value, idx, chunk_size, backbone):
    """The AdaIN-guided shift blocks of the patched attn1 forwards:
    SD: backbones/video_diffusion_sd/pnp_utils.py:47-57 (eta1 UNSCALED);
    AD: backbones/animatediff/pnp_utils.py:45-55 (both scaled, hi exclusive).
    Constants inlined exactly as the reference hardcodes them."""
    query, key, value = query.clone(), key.clone(), value.clone()
    eta1, eta2 = 0.0, 0.5
    if backbone == "sd":
        in_window = idx >= eta1 and idx <= eta2 * 50
        alpha, gamma = 0.65, 3.0
    else:
        in_window = idx >= eta1 * 50 and idx < eta2 * 50
        alpha, gamma = 0.8, 2.0
    if in_window:
        beta = (0.9 - 0.1) / (eta1 * 50 - eta2 * 50) * (idx - eta2 * 50) + 0.1
        query[2 * chunk_size: 3 * chunk_size] = alpha * query[: chunk_size] + (1 - alpha) * query[2 * chunk_size: 3 * chunk_size]
        key[2 * chunk_size: 3 * chunk_size] = beta * ref_attention_adain(key[2 * chunk_size: 3 * chunk_size], key[chunk_size: 2 * chunk_size]) + (1 - beta) * key[chunk_size: 2 * chunk_size]
        value[2 * chunk_size: 3 * chunk_size] = beta * ref_attention_adain(value[2 * chunk_size: 3 * chunk_size], value[chunk_size: 2 * chunk_size]) + (1 - beta) * value[chunk_size: 2 * chunk_size]
        query[2 * chunk_size: 3 * chunk_size] = gamma * query[2 * chunk_size: 3 * chunk_size]
    return query, key, value


def ref_generate_eta_values(timesteps, start_step, end_step, eta, eta_trend):
    """backbones/video_diffusion_sd3/pipelines/custom_pipeline.py:18-44,
    verbatim (self removed)."""
    assert start_step < end_step and start_step >= 0 and end_step <= len(timesteps), "Invalid start_step and end_step"
    eta_values = [0.0] * len(timesteps)
    if eta_trend == 'constant':
        for i in range(start_step, end_step):
            eta_values[i] = eta
    elif eta_trend == 'linear_increase':
        total_time = timesteps[start_step] - timesteps[end_step - 1]
        for i in range(start_step, end_step):
            eta_values[i] = eta * (timesteps[start_step] - timesteps[i]) / total_time
    elif eta_trend == 'linear_decrease':
        total_time = timesteps[start_step] - timesteps[end_step - 1]
        for i in range(start_step, end_step):
            eta_values[i] = eta * (timesteps[i] - timesteps[end_step - 1]) / total_time
    else:
        raise NotImplementedError(f"Unsupported eta_trend: {eta_trend}")
    return eta_values


def _sched_shim(schedule: DDIMSchedule, num_inference_steps: int):
    """Duck-typed diffusers-DDIMScheduler stand-in feeding the lifted oracle:
    same alpha tables the JAX side uses, torch dtypes."""
    shim = types.SimpleNamespace()
    shim.config = types.SimpleNamespace(
        num_train_timesteps=schedule.cfg.num_train_timesteps
    )
    shim.num_inference_steps = num_inference_steps
    shim.alphas_cumprod = torch.tensor(np.asarray(schedule.alphas_cumprod), dtype=torch.float32)
    shim.final_alpha_cumprod = torch.tensor(float(schedule.final_alpha_cumprod))
    shim.timesteps = torch.tensor(schedule.timesteps(num_inference_steps).copy())
    return shim


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def test_next_step_matches_reference():
    sched = DDIMSchedule()
    n = 50
    shim = _sched_shim(sched, n)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    e = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    for t in sched.timesteps(n):
        want = ref_next_step(torch.tensor(e), int(t), torch.tensor(x), shim).numpy()
        got = np.asarray(sched.next_step(jnp.asarray(e), int(t), jnp.asarray(x), n))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("is_opt", [False, True])
def test_inversion_trajectory_matches_reference_loop(is_opt):
    """Full 50-step inversion trajectory against the lifted ddim_loop_plus,
    with a deterministic elementwise pseudo-denoiser shared by both sides."""
    sched = DDIMSchedule()
    n = 50
    shim = _sched_shim(sched, n)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)

    def torch_denoise(latent, t):
        return 0.1 * latent + 0.01 * torch.sin(torch.tensor(float(t)))

    def jax_denoise(latent, t, i):
        return 0.1 * latent + 0.01 * jnp.sin(t.astype(jnp.float32)), None

    want = torch.stack(
        ref_ddim_loop_plus(torch_denoise, shim, torch.tensor(x0), n, is_opt)
    ).numpy()
    got, _ = ddim_invert(
        jax_denoise, jnp.asarray(x0), sched, n,
        easyinv=EasyInvConfig() if is_opt else None,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_mask_propagation_affinity_matches_reference():
    rng = np.random.default_rng(2)
    s_anchor, t_tgt, c, n_cls = 48, 40, 16, 2
    feat_src = rng.standard_normal((s_anchor, c)).astype(np.float32)
    feat_tgt = rng.standard_normal((t_tgt, c)).astype(np.float32)
    segs = (rng.random((n_cls, s_anchor)) > 0.5).astype(np.float32)
    args = types.SimpleNamespace(temperature=0.2, topk=15, sample_ratio=0.3)
    want = ref_mask_propogation(
        torch.tensor(feat_src.T.copy()), torch.tensor(feat_tgt),
        torch.tensor(segs), args,
    ).numpy()
    got = np.asarray(
        _propagate_one(
            jnp.asarray(feat_src), jnp.asarray(segs),
            jnp.ones(s_anchor, bool), jnp.asarray(feat_tgt),
            MaskPropConfig(),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_norm_mask_matches_reference():
    rng = np.random.default_rng(3)
    m = (rng.random((3, 8, 8)) * rng.integers(0, 2, (3, 1, 1))).astype(np.float32)
    want = ref_norm_mask(torch.tensor(m.copy())).numpy()
    got = np.asarray(norm_mask(jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("backbone", ["sd", "ad"])
def test_attention_shift_matches_reference(backbone):
    """The 3-branch shift (and the injected 2-branch variant) against the
    lifted patched-forward block, across every step index of the window
    boundaries."""
    rng = np.random.default_rng(4)
    f, l, d = 2, 6, 8
    q = rng.standard_normal((3 * f, l, d)).astype(np.float32)
    k = rng.standard_normal((3 * f, l, d)).astype(np.float32)
    v = rng.standard_normal((3 * f, l, d)).astype(np.float32)
    cfg = SD_STYLE_SHIFT if backbone == "sd" else AD_STYLE_SHIFT
    for idx in [0, 1, 12, 24, 25, 26, 49]:
        wq, wk, wv = ref_attention_shift(
            torch.tensor(q), torch.tensor(k), torch.tensor(v), idx, f, backbone
        )
        gq, gk, gv = apply_style_shift(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(idx), cfg, f
        )
        np.testing.assert_allclose(np.asarray(gq), wq.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gk), wk.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gv), wv.numpy(), rtol=1e-5, atol=1e-6)

        # injected 2-branch variant: style rows identical => same stylized rows
        k_id = k.copy()
        v_id = v.copy()
        k_id[f:2 * f] = k_id[f:f + 1]  # make style rows identical
        v_id[f:2 * f] = v_id[f:f + 1]
        wq2, wk2, wv2 = ref_attention_shift(
            torch.tensor(q), torch.tensor(k_id), torch.tensor(v_id), idx, f, backbone
        )
        q2 = np.concatenate([q[:f], q[2 * f:]], axis=0)
        k2 = np.concatenate([k_id[:f], k_id[2 * f:]], axis=0)
        v2 = np.concatenate([v_id[:f], v_id[2 * f:]], axis=0)
        gq2, gk2, gv2 = apply_style_shift_injected(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(k_id[f:f + 1]), jnp.asarray(v_id[f:f + 1]),
            jnp.asarray(idx), cfg, f,
        )
        np.testing.assert_allclose(
            np.asarray(gq2[f:]), wq2[2 * f:].numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gk2[f:]), wk2[2 * f:].numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gv2[f:]), wv2[2 * f:].numpy(), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize(
    "trend", ["constant", "linear_increase", "linear_decrease"]
)
def test_eta_values_match_reference(trend):
    ts = np.linspace(1.0, 0.02, 50)
    want = np.asarray(ref_generate_eta_values(ts, 25, 39, 0.85, trend), np.float32)
    got = generate_eta_values(ts, 25, 39, 0.85, trend)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
