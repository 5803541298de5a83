"""LDM -> diffusers key-remap tests: a synthetic LDM checkpoint must map onto
exactly the diffusers key set that the Flax converters consume."""

import numpy as np
import pytest

from univst_tpu.models.convert_ldm import (
    ldm_clip_to_hf,
    ldm_unet_to_diffusers,
    ldm_vae_to_diffusers,
    merge_lora,
)
from univst_tpu.models.unet_sd import UNetSDConfig
from tests.test_convert import _synthetic_sd_unet_sd


def _synthetic_ldm_unet(rng):
    """Minimal-shape LDM UNet key set for the SD topology (values are
    placeholders; only names matter to the remap)."""
    sd = {}

    def add(name, shape=(2,)):
        sd[name + ".weight"] = rng.standard_normal(shape).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((shape[0],)).astype(np.float32)

    def resnet(p):
        for n, s in (("in_layers.0", (2,)), ("in_layers.2", (2, 2, 3, 3)),
                     ("emb_layers.1", (2, 2)), ("out_layers.0", (2,)),
                     ("out_layers.3", (2, 2, 3, 3))):
            add(f"{p}.{n}", s)

    def transformer(p):
        add(f"{p}.norm")
        add(f"{p}.proj_in", (2, 2, 1, 1))
        add(f"{p}.proj_out", (2, 2, 1, 1))
        t = f"{p}.transformer_blocks.0"
        for a in ("attn1", "attn2"):
            for q in ("to_q", "to_k", "to_v"):
                sd[f"{t}.{a}.{q}.weight"] = rng.standard_normal((2, 2)).astype(np.float32)
            add(f"{t}.{a}.to_out.0", (2, 2))
        for ln in ("norm1", "norm2", "norm3"):
            add(f"{t}.{ln}")
        add(f"{t}.ff.net.0.proj", (16, 2))
        add(f"{t}.ff.net.2", (8, 2))

    add("time_embed.0", (8, 2))
    add("time_embed.2", (8, 8))
    add("input_blocks.0.0", (2, 4, 3, 3))
    for i in range(1, 12):
        level, layer = (i - 1) // 3, (i - 1) % 3
        if layer == 2:
            add(f"input_blocks.{i}.0.op", (2, 2, 3, 3))
        else:
            resnet(f"input_blocks.{i}.0")
            if level < 3:  # levels 0-2 have attention in SD
                transformer(f"input_blocks.{i}.1")
    resnet("middle_block.0")
    transformer("middle_block.1")
    resnet("middle_block.2")
    for i in range(12):
        level, layer = i // 3, i % 3
        resnet(f"output_blocks.{i}.0")
        if level >= 1:
            transformer(f"output_blocks.{i}.1")
        if layer == 2 and level < 3:
            idx = 1 if level == 0 else 2
            add(f"output_blocks.{i}.{idx}.conv", (2, 2, 3, 3))
    add("out.0")
    add("out.2", (4, 2, 3, 3))
    return {f"model.diffusion_model.{k}": v for k, v in sd.items()}


def test_ldm_unet_keys_match_diffusers_format():
    rng = np.random.default_rng(0)
    remapped = ldm_unet_to_diffusers(_synthetic_ldm_unet(rng))
    # compare against the independently generated diffusers key set (shapes
    # differ — only names matter here)
    expected = set(_synthetic_sd_unet_sd(UNetSDConfig.tiny(), rng))
    got = set(remapped)
    missing = expected - got
    extra = got - expected
    # conv_shortcut keys are shape-dependent and synthetic dicts differ there
    missing = {k for k in missing if "conv_shortcut" not in k}
    extra = {k for k in extra if "conv_shortcut" not in k}
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]


def test_ldm_unet_rejects_leftovers():
    rng = np.random.default_rng(0)
    sd = _synthetic_ldm_unet(rng)
    sd["model.diffusion_model.bogus.weight"] = np.zeros(2, np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        ldm_unet_to_diffusers(sd)


def test_ldm_vae_remap_structure():
    rng = np.random.default_rng(1)
    sd = {}

    def add(name, shape=(2,)):
        sd[name + ".weight"] = rng.standard_normal(shape).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((shape[0],)).astype(np.float32)

    def resnet(p):
        add(p + ".norm1")
        add(p + ".conv1", (2, 2, 3, 3))
        add(p + ".norm2")
        add(p + ".conv2", (2, 2, 3, 3))

    def attn(p):
        add(p + ".norm")
        for q in ("q", "k", "v", "proj_out"):
            add(f"{p}.{q}", (2, 2, 1, 1))

    add("encoder.conv_in", (2, 3, 3, 3))
    for i in range(2):
        for j in range(2):
            resnet(f"encoder.down.{i}.block.{j}")
    add("encoder.down.0.downsample.conv", (2, 2, 3, 3))
    resnet("encoder.mid.block_1")
    attn("encoder.mid.attn_1")
    resnet("encoder.mid.block_2")
    add("encoder.norm_out")
    add("encoder.conv_out", (8, 2, 3, 3))
    add("quant_conv", (8, 8, 1, 1))
    add("decoder.conv_in", (2, 4, 3, 3))
    resnet("decoder.mid.block_1")
    attn("decoder.mid.attn_1")
    resnet("decoder.mid.block_2")
    for i in range(2):
        for j in range(3):
            resnet(f"decoder.up.{i}.block.{j}")
    add("decoder.up.1.upsample.conv", (2, 2, 3, 3))
    add("decoder.norm_out")
    add("decoder.conv_out", (3, 2, 3, 3))
    add("post_quant_conv", (4, 4, 1, 1))
    out = ldm_vae_to_diffusers({f"first_stage_model.{k}": v for k, v in sd.items()})
    # level reversal: LDM decoder.up.1 (shallow) -> diffusers up_blocks.0
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in out
    # attention 1x1 convs squeezed to linear
    assert out["encoder.mid_block.attentions.0.to_q.weight"].ndim == 2


def test_ldm_clip_strip_prefix():
    sd = {
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": np.ones(2),
        "cond_stage_model.transformer.text_model.embeddings.position_ids": np.ones(2),
    }
    out = ldm_clip_to_hf(sd)
    assert list(out) == ["text_model.final_layer_norm.weight"]


def test_merge_lora_linear():
    base = {"up_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((4, 4), np.float32)}
    rng = np.random.default_rng(0)
    up = rng.standard_normal((4, 2)).astype(np.float32)
    down = rng.standard_normal((2, 4)).astype(np.float32)
    lora = {
        "lora_unet_up_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": up,
        "lora_unet_up_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": down,
    }
    out = merge_lora(base, lora, alpha=0.5)
    np.testing.assert_allclose(
        out["up_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight"],
        0.5 * up @ down, rtol=1e-6,
    )
