"""Live LoRA adapters (C16): the delta-tree live path must match the merge
path exactly, and the factorized module must be inert at init.

Reference counterparts: convert_lora (merge,
convert_lora_safetensor_to_diffusers.py:24-100) and the dead-code live
processors (video_diffusion_sd/models/lora.py:28-137) — see
univst_tpu/models/lora.py for why the live path is a delta tree here."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.models import convert as cv
from univst_tpu.models.convert_ldm import merge_lora
from univst_tpu.models.lora import LoRALinearLayer, apply_lora, lora_delta_params
from univst_tpu.models.unet_sd import UNetSDConfig
from tests.test_convert import _synthetic_sd_unet_sd


def _synthetic_lora(base_sd, rng, rank=2, n=6):
    """webui-format LoRA targeting a few attention projections of the base."""
    lora = {}
    count = 0
    for key in sorted(base_sd):
        if ".attn1.to_q.weight" in key or ".attn2.to_v.weight" in key:
            out_f, in_f = base_sd[key].shape
            stem = "lora_unet_" + key[: -len(".weight")].replace(".", "_")
            lora[stem + ".lora_up.weight"] = rng.standard_normal(
                (out_f, rank)
            ).astype(np.float32)
            lora[stem + ".lora_down.weight"] = rng.standard_normal(
                (rank, in_f)
            ).astype(np.float32)
            count += 1
            if count >= n:
                break
    assert count > 0
    return lora


def test_live_lora_matches_merge_path():
    rng = np.random.default_rng(0)
    cfg = UNetSDConfig.tiny()
    base_sd = _synthetic_sd_unet_sd(cfg, rng)
    lora_sd = _synthetic_lora(base_sd, rng)
    convert_fn = functools.partial(cv.convert_sd_unet, cfg=cfg)

    alpha = 0.37
    merged_tree = convert_fn(merge_lora(base_sd, lora_sd, alpha=alpha))
    base_tree = convert_fn(base_sd)
    delta = lora_delta_params(base_sd, lora_sd, convert_fn)
    live_tree = apply_lora(base_tree, delta, scale=alpha)

    flat_m = jax.tree_util.tree_leaves_with_path(merged_tree)
    flat_l = dict(jax.tree_util.tree_leaves_with_path(live_tree))
    changed = 0
    for path, leaf in flat_m:
        got = np.asarray(flat_l[path])
        np.testing.assert_allclose(got, np.asarray(leaf), rtol=1e-5, atol=1e-6)
        if np.abs(np.asarray(leaf) - np.asarray(dict(
                jax.tree_util.tree_leaves_with_path(base_tree))[path])).max() > 0:
            changed += 1
    assert changed >= 6  # the adapted projections actually moved


def test_apply_lora_scale_zero_is_identity():
    rng = np.random.default_rng(1)
    cfg = UNetSDConfig.tiny()
    base_sd = _synthetic_sd_unet_sd(cfg, rng)
    lora_sd = _synthetic_lora(base_sd, rng)
    convert_fn = functools.partial(cv.convert_sd_unet, cfg=cfg)
    base_tree = convert_fn(base_sd)
    delta = lora_delta_params(base_sd, lora_sd, convert_fn)
    out = apply_lora(base_tree, delta, scale=0.0)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(base_tree),
        jax.tree_util.tree_leaves_with_path(out),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_linear_layer_inert_at_init():
    layer = LoRALinearLayer(features=8, rank=2)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((3, 5, 8)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    out = layer.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init up
    # with a nonzero up kernel it produces the rank-factorized delta
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["up"]["kernel"] = jnp.ones_like(params["up"]["kernel"])
    out2 = layer.apply({"params": params}, x)
    want = (x @ params["down"]["kernel"]) @ params["up"]["kernel"]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want), rtol=1e-5)
