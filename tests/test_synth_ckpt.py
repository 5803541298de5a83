"""Weights-day fire drill, layer 1: converter <-> generator roundtrips.

For each checkpoint family, synth_* emits a state dict with the released
torch layout's key names/shapes (values random); convert_* must consume it
with zero missing and zero unconsumed keys, merge strictly into the Flax
init, and transport every value exactly. Any key-name or transform drift
between the two sides fails here (VERDICT r3 #4).

External anchors: the CLIP and T5 inventories are additionally checked
against real transformers models instantiated at matching tiny configs —
a ground-truth key list that does not depend on our own code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univst_tpu.models import convert as cv
from univst_tpu.models import synth_ckpt as sk


def _assert_transported(converted, merged, path=""):
    """Every leaf the converter produced must appear, exactly, in the merge."""
    n = 0
    for k in converted:
        p = f"{path}/{k}"
        if isinstance(converted[k], dict):
            n += _assert_transported(converted[k], merged[k], p)
        else:
            np.testing.assert_allclose(
                np.asarray(merged[k], np.float32), converted[k], err_msg=p
            )
            n += 1
    return n


def _roundtrip(init_params, synth_sd, convert_fn, cfg):
    conv = convert_fn(synth_sd, cfg)
    merged = cv.merge_into_params(init_params, conv)
    n = _assert_transported(conv, merged)
    assert n > 0
    return merged, n


def test_sd_unet_roundtrip():
    from univst_tpu.models.layers import VideoCtx
    from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig

    cfg = UNetSDConfig.tiny()
    m = UNetPseudo3D(cfg, dtype=jnp.float32)
    vctx = VideoCtx(num_frames=2, frame_indices=())
    params = jax.jit(m.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)), jnp.asarray(0),
        jnp.zeros((1, 77, cfg.cross_attention_dim)), vctx,
    )["params"]
    sd = sk.synth_sd_unet(params, cfg)
    assert any(k.startswith("down_blocks.0.attentions.0") for k in sd)
    _, n = _roundtrip(params, sd, cv.convert_sd_unet, cfg)
    # 2D keys only: temporal params keep their identity init
    assert not any("temporal" in k for k in sd)


def test_ad_unet_and_motion_roundtrip():
    from univst_tpu.models.unet_ad import UNetADConfig, UNetAnimateDiff
    from univst_tpu.models.layers import VideoCtx

    cfg = UNetADConfig.tiny()
    m = UNetAnimateDiff(cfg, dtype=jnp.float32)
    vctx = VideoCtx(num_frames=2, frame_indices=())
    params = jax.jit(m.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)), jnp.asarray(0),
        jnp.zeros((1, 77, cfg.cross_attention_dim)), vctx,
    )["params"]

    sd = sk.synth_ad_unet(params, cfg)
    merged, _ = _roundtrip(params, sd, cv.convert_ad_unet, cfg)

    mm = sk.synth_motion_module(params, cfg)
    assert any(k.endswith("pos_encoder.pe") for k in mm), "real ckpts persist PE"
    conv = cv.convert_motion_module(mm, cfg)
    merged = cv.merge_into_params(merged, conv)
    _assert_transported(conv, merged)
    # the two checkpoints together cover disjoint trees
    assert not (set(sd) & set(mm))


@pytest.mark.parametrize("temporal", [False, True])
def test_vae_roundtrip(temporal):
    from univst_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.tiny(temporal_decoder=temporal)
    m = AutoencoderKL(cfg, dtype=jnp.float32)
    params = jax.jit(m.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), 2
    )["params"]
    sd = sk.synth_vae(params, cfg)
    if temporal:
        assert "decoder.time_conv_out.weight" in sd
        assert any("time_mixer.mix_factor" in k for k in sd)
        assert sd["decoder.mid_block.resnets.0.temporal_res_block.conv1.weight"].ndim == 5
    else:
        assert "post_quant_conv.weight" in sd
    _roundtrip(params, sd, cv.convert_vae, cfg)


def test_clip_roundtrip_and_transformers_anchor():
    from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig.tiny(projection_dim=16)
    m = CLIPTextModel(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )["params"]
    sd = sk.synth_clip_text(params, cfg)
    _roundtrip(params, sd, cv.convert_clip_text, cfg)

    # external anchor: the real transformers module tree at the same dims
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_positions,
        projection_dim=cfg.projection_dim,
    )
    hf = transformers.CLIPTextModelWithProjection(hf_cfg)
    hf_keys = {k for k, v in hf.state_dict().items()}
    ours = {k for k in sd if k != "text_model.embeddings.position_ids"}
    # transformers >= 4.31 no longer persists position_ids; older releases
    # (and the published SD checkpoints) do — the converter tolerates both
    hf_keys.discard("text_model.embeddings.position_ids")
    assert ours == hf_keys
    for k in ours:
        assert tuple(sd[k].shape) == tuple(hf.state_dict()[k].shape), k


def test_t5_roundtrip_and_transformers_anchor():
    from univst_tpu.models.t5 import T5Config, T5Encoder

    cfg = T5Config.tiny()
    m = T5Encoder(cfg, dtype=jnp.float32)
    params = jax.jit(m.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    sd = sk.synth_t5(params, cfg)
    _roundtrip(params, sd, cv.convert_t5, cfg)

    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.head_dim,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.rel_buckets,
        feed_forward_proj="gated-gelu",  # T5 v1.1 (the SD3 T5-XXL variant)
    )
    hf = transformers.T5EncoderModel(hf_cfg)
    hf_keys = set(hf.state_dict().keys())
    ours = set(sd)
    assert ours == hf_keys
    for k in ours:
        assert tuple(sd[k].shape) == tuple(hf.state_dict()[k].shape), k


@pytest.mark.parametrize("dual", [False, True])
def test_mmdit_roundtrip(dual):
    from univst_tpu.models.mmdit import MMDiT, MMDiTConfig

    kw = dict(qk_norm="rms", dual_attention_layers=(0,)) if dual else {}
    cfg = MMDiTConfig.tiny(**kw)
    from univst_tpu.models.layers import VideoCtx

    m = MMDiT(cfg, dtype=jnp.float32)
    vctx = VideoCtx(num_frames=1, frame_indices=())
    params = jax.jit(m.init, static_argnums=(5,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, cfg.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.joint_attention_dim)),
        jnp.zeros((1, cfg.pooled_projection_dim)),
        vctx,
    )["params"]
    sd = sk.synth_mmdit(params, cfg)
    assert "pos_embed.pos_embed" in sd  # persisted buffer, recomputed on load
    if dual:
        assert "transformer_blocks.0.attn2.to_q.weight" in sd
        assert "transformer_blocks.0.attn.norm_q.weight" in sd
    _roundtrip(params, sd, cv.convert_mmdit, cfg)
