"""Synthetic checkpoint generators — the offline "weights-day fire drill".

Every converter in :mod:`univst_tpu.models.convert` consumes a released
torch checkpoint layout (diffusers UNet/VAE, transformers CLIP/T5, the
AnimateDiff motion ckpt, SD3 MMDiT) that cannot be downloaded in this
environment. These generators emit state dicts with exactly those key
names and shapes — values random — so the full CLI → load → convert →
merge path can be exercised end-to-end on disk artifacts (VERDICT r3 #4).

Each ``synth_*`` mirrors its ``convert_*`` inverse-transform for
inverse-transform: a Flax init param tree supplies the shapes, the
builder inverts the layout transform (linear kernels transpose back to
``[out, in]``, NHWC conv kernels back to ``[out, in, kh, kw]``, …), and
the roundtrip test asserts ``convert(synth(params)) == params`` leaf for
leaf — so any key-name or transform drift between the two sides fails
loudly, which is the guarantee we can build without the real weights.

The torch-side naming follows the released checkpoints:
  * SD UNet/VAE: diffusers ``UNet2DConditionModel`` /
    ``AutoencoderKL(TemporalDecoder)`` (reference loads them via
    ``from_pretrained``, src/sd/run_content_inversion_sd.py:39-43)
  * CLIP: transformers ``CLIPTextModel(WithProjection)``
  * motion module: ``mm_sd_v15_v2.ckpt`` (reference ``load_weights``,
    animatediff/utils/util.py:89-121)
  * SD3: diffusers ``SD3Transformer2DModel`` + ``T5EncoderModel``
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


class _InvBuilder:
    """Mirror image of convert._TreeBuilder: walks a Flax param tree and
    emits torch-layout key/value pairs with inverted transforms."""

    def __init__(self, params: Mapping, rng: np.random.Generator):
        self.params = params
        self.rng = rng
        self.out: Dict[str, np.ndarray] = {}

    def leaf(self, path: str) -> np.ndarray:
        node = self.params
        for p in path.split("/"):
            if not isinstance(node, Mapping) or p not in node:
                raise KeyError(f"flax params have no leaf {path}")
            node = node[p]
        shape = getattr(node, "shape", None)
        if shape is None:
            raise KeyError(f"{path} is not a leaf")
        # fresh random values at the leaf's shape (never reuse the init
        # values: the roundtrip must prove the converter transports THESE)
        return self.rng.standard_normal(shape).astype(np.float32) * 0.02

    def has(self, path: str) -> bool:
        node = self.params
        for p in path.split("/"):
            if not isinstance(node, Mapping) or p not in node:
                return False
            node = node[p]
        return True

    def put(self, key: str, value: np.ndarray):
        if key in self.out:
            raise ValueError(f"duplicate torch key {key}")
        self.out[key] = np.ascontiguousarray(value)

    def linear(self, src: str, dst: str, bias: bool = True):
        k = self.leaf(dst + "/kernel")  # flax [in, out]
        self.put(src + ".weight", k.T)  # torch [out, in]
        if bias:
            self.put(src + ".bias", self.leaf(dst + "/bias"))

    def conv2d(self, src: str, dst: str):
        k = self.leaf(dst + "/kernel")  # flax [kh, kw, in, out]
        self.put(src + ".weight", np.transpose(k, (3, 2, 0, 1)))
        self.put(src + ".bias", self.leaf(dst + "/bias"))

    def norm(self, src: str, dst: str):
        self.put(src + ".weight", self.leaf(dst + "/scale"))
        self.put(src + ".bias", self.leaf(dst + "/bias"))


# ---------------------------------------------------------------------------
# SD / AnimateDiff UNet (diffusers UNet2DConditionModel layout)
# ---------------------------------------------------------------------------


def _inv_unet_transformer(b: _InvBuilder, src: str, dst: str, use_linear: bool):
    b.norm(f"{src}.norm", f"{dst}/norm")
    if use_linear:
        b.linear(f"{src}.proj_in", f"{dst}/proj_in")
        b.linear(f"{src}.proj_out", f"{dst}/proj_out")
    else:
        # our 1x1-conv-as-dense: kernel [in, out] -> torch [out, in, 1, 1]
        k = b.leaf(f"{dst}/proj_in/kernel")
        b.put(f"{src}.proj_in.weight", k.T[:, :, None, None])
        b.put(f"{src}.proj_in.bias", b.leaf(f"{dst}/proj_in/bias"))
        k = b.leaf(f"{dst}/proj_out/kernel")
        b.put(f"{src}.proj_out.weight", k.T[:, :, None, None])
        b.put(f"{src}.proj_out.bias", b.leaf(f"{dst}/proj_out/bias"))
    blk_s = f"{src}.transformer_blocks.0"
    blk_d = f"{dst}/block"
    for attn in ("attn1", "attn2"):
        b.linear(f"{blk_s}.{attn}.to_q", f"{blk_d}/{attn}/to_q", bias=False)
        b.linear(f"{blk_s}.{attn}.to_k", f"{blk_d}/{attn}/to_k", bias=False)
        b.linear(f"{blk_s}.{attn}.to_v", f"{blk_d}/{attn}/to_v", bias=False)
        b.linear(f"{blk_s}.{attn}.to_out.0", f"{blk_d}/{attn}/to_out")
    for ln in ("norm1", "norm2", "norm3"):
        b.norm(f"{blk_s}.{ln}", f"{blk_d}/{ln}")
    b.linear(f"{blk_s}.ff.net.0.proj", f"{blk_d}/ff/proj")
    b.linear(f"{blk_s}.ff.net.2", f"{blk_d}/ff/out")


def _inv_unet_resnet(b: _InvBuilder, src: str, dst: str, spatial: bool):
    suff = "/spatial" if spatial else ""
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    b.conv2d(f"{src}.conv1", f"{dst}/conv1{suff}")
    b.linear(f"{src}.time_emb_proj", f"{dst}/time_emb_proj")
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    b.conv2d(f"{src}.conv2", f"{dst}/conv2{suff}")
    if b.has(f"{dst}/conv_shortcut{suff}/kernel") or b.has(f"{dst}/conv_shortcut/kernel"):
        b.conv2d(f"{src}.conv_shortcut", f"{dst}/conv_shortcut{suff}")


def synth_sd_unet(unet_params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_sd_unet: diffusers UNet2DConditionModel keys."""
    b = _InvBuilder(unet_params, np.random.default_rng(seed))
    n = len(cfg.block_out_channels)
    lin = cfg.use_linear_projection
    b.conv2d("conv_in", "conv_in/spatial")
    b.linear("time_embedding.linear_1", "time_embedding/linear_1")
    b.linear("time_embedding.linear_2", "time_embedding/linear_2")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _inv_unet_resnet(b, f"down_blocks.{i}.resnets.{j}", f"down_{i}/resnet_{j}", True)
            if cfg.down_block_has_attn[i]:
                _inv_unet_transformer(b, f"down_blocks.{i}.attentions.{j}", f"down_{i}/attn_{j}", lin)
        if i < n - 1:
            b.conv2d(f"down_blocks.{i}.downsamplers.0.conv", f"down_{i}/downsample/spatial")
    _inv_unet_resnet(b, "mid_block.resnets.0", "mid/resnet_0", True)
    _inv_unet_resnet(b, "mid_block.resnets.1", "mid/resnet_1", True)
    _inv_unet_transformer(b, "mid_block.attentions.0", "mid/attn_0", lin)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _inv_unet_resnet(b, f"up_blocks.{i}.resnets.{j}", f"up_{i}/resnet_{j}", True)
            if cfg.up_block_has_attn[i]:
                _inv_unet_transformer(b, f"up_blocks.{i}.attentions.{j}", f"up_{i}/attn_{j}", lin)
        if i < n - 1:
            b.conv2d(f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}/upsample/spatial")
    b.norm("conv_norm_out", "conv_norm_out")
    b.conv2d("conv_out", "conv_out/spatial")
    return b.out


def synth_ad_unet(unet_params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_ad_unet (same diffusers key set as the SD
    UNet; flat Flax names, InflatedConv has no /spatial split)."""
    b = _InvBuilder(unet_params, np.random.default_rng(seed))
    n = len(cfg.block_out_channels)
    lin = cfg.use_linear_projection
    b.conv2d("conv_in", "conv_in")
    b.linear("time_embedding.linear_1", "time_embedding/linear_1")
    b.linear("time_embedding.linear_2", "time_embedding/linear_2")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _inv_unet_resnet(b, f"down_blocks.{i}.resnets.{j}", f"down_{i}_resnet_{j}", False)
            if cfg.down_block_has_attn[i]:
                _inv_unet_transformer(b, f"down_blocks.{i}.attentions.{j}", f"down_{i}_attn_{j}", lin)
        if i < n - 1:
            b.conv2d(f"down_blocks.{i}.downsamplers.0.conv", f"down_{i}_downsample")
    _inv_unet_resnet(b, "mid_block.resnets.0", "mid_resnet_0", False)
    _inv_unet_resnet(b, "mid_block.resnets.1", "mid_resnet_1", False)
    _inv_unet_transformer(b, "mid_block.attentions.0", "mid_attn_0", lin)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _inv_unet_resnet(b, f"up_blocks.{i}.resnets.{j}", f"up_{i}_resnet_{j}", False)
            if cfg.up_block_has_attn[i]:
                _inv_unet_transformer(b, f"up_blocks.{i}.attentions.{j}", f"up_{i}_attn_{j}", lin)
        if i < n - 1:
            b.conv2d(f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}_upsample")
    b.norm("conv_norm_out", "conv_norm_out")
    b.conv2d("conv_out", "conv_out")
    return b.out


def synth_motion_module(unet_params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_motion_module (mm_sd_v15_v2.ckpt keys),
    including the non-persistent ``pos_encoder.pe`` buffers the real ckpt
    carries (tolerated by the converter's allow_unused)."""
    b = _InvBuilder(unet_params, np.random.default_rng(seed))

    def one(src: str, dst: str):
        tt = f"{src}.temporal_transformer"
        b.norm(f"{tt}.norm", f"{dst}/norm")
        b.linear(f"{tt}.proj_in", f"{dst}/proj_in")
        b.linear(f"{tt}.proj_out", f"{dst}/proj_out")
        for blk in range(cfg.motion_num_blocks):
            tb = f"{tt}.transformer_blocks.{blk}"
            for a in range(cfg.motion_attention_layers):
                ab = f"{tb}.attention_blocks.{a}"
                b.linear(f"{ab}.to_q", f"{dst}/block_{blk}_attn_{a}/to_q", bias=False)
                b.linear(f"{ab}.to_k", f"{dst}/block_{blk}_attn_{a}/to_k", bias=False)
                b.linear(f"{ab}.to_v", f"{dst}/block_{blk}_attn_{a}/to_v", bias=False)
                b.linear(f"{ab}.to_out.0", f"{dst}/block_{blk}_attn_{a}/to_out")
                b.norm(f"{tb}.norms.{a}", f"{dst}/block_{blk}_norm_{a}")
                # real mm ckpts persist the sinusoidal PE buffer
                d_model = b.leaf(f"{dst}/block_{blk}_attn_{a}/to_q/kernel").shape[0]
                b.put(f"{ab}.pos_encoder.pe",
                      np.zeros((1, cfg.motion_pe_max_len, d_model), np.float32))
            b.linear(f"{tb}.ff.net.0.proj", f"{dst}/block_{blk}_ff/proj")
            b.linear(f"{tb}.ff.net.2", f"{dst}/block_{blk}_ff/out")
            b.norm(f"{tb}.ff_norm", f"{dst}/block_{blk}_ff_norm")

    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            one(f"down_blocks.{i}.motion_modules.{j}", f"down_{i}_motion_{j}")
        for j in range(cfg.layers_per_block + 1):
            one(f"up_blocks.{i}.motion_modules.{j}", f"up_{i}_motion_{j}")
    if cfg.motion_mid_block:
        one("mid_block.motion_modules.0", "mid_motion")
    return b.out


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL / AutoencoderKLTemporalDecoder layout)
# ---------------------------------------------------------------------------


def _inv_vae_resnet(b: _InvBuilder, src: str, dst: str):
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    b.conv2d(f"{src}.conv1", f"{dst}/conv1")
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    b.conv2d(f"{src}.conv2", f"{dst}/conv2")
    if b.has(f"{dst}/conv_shortcut/kernel"):
        b.conv2d(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")


def _inv_vae_temporal_resnet(b: _InvBuilder, src: str, dst: str):
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    for conv in ("conv1", "conv2"):
        k = b.leaf(f"{dst}/{conv}/kernel")  # [3, 1, in, out]
        b.put(f"{src}.{conv}.weight", np.transpose(k[:, 0], (2, 1, 0))[..., None, None])
        b.put(f"{src}.{conv}.bias", b.leaf(f"{dst}/{conv}/bias"))
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    if b.has(f"{dst}/conv_shortcut/kernel"):
        k = b.leaf(f"{dst}/conv_shortcut/kernel")  # [in, out]
        b.put(f"{src}.conv_shortcut.weight", k.T[..., None, None, None])
        b.put(f"{src}.conv_shortcut.bias", b.leaf(f"{dst}/conv_shortcut/bias"))


def _inv_vae_attention(b: _InvBuilder, src: str, dst: str):
    b.norm(f"{src}.group_norm", f"{dst}/norm")
    for p in ("to_q", "to_k", "to_v"):
        b.linear(f"{src}.{p}", f"{dst}/{p}")
    b.linear(f"{src}.to_out.0", f"{dst}/to_out")


def synth_vae(vae_params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_vae, both plain-KL and SVD temporal-decoder
    layouts."""
    b = _InvBuilder(vae_params, np.random.default_rng(seed))
    n = len(cfg.block_out_channels)
    b.conv2d("encoder.conv_in", "encoder/conv_in")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _inv_vae_resnet(b, f"encoder.down_blocks.{i}.resnets.{j}", f"encoder/down_{i}_res_{j}")
        if i < n - 1:
            b.conv2d(f"encoder.down_blocks.{i}.downsamplers.0.conv", f"encoder/down_{i}_conv")
    _inv_vae_resnet(b, "encoder.mid_block.resnets.0", "encoder/mid_res_0")
    _inv_vae_attention(b, "encoder.mid_block.attentions.0", "encoder/mid_attn")
    _inv_vae_resnet(b, "encoder.mid_block.resnets.1", "encoder/mid_res_1")
    b.norm("encoder.conv_norm_out", "encoder/norm_out")
    b.conv2d("encoder.conv_out", "encoder/conv_out")
    b.conv2d("quant_conv", "encoder/quant_conv")

    b.conv2d("decoder.conv_in", "decoder/conv_in")
    temporal = cfg.temporal_decoder

    def dec_res(src, dst):
        if temporal:
            _inv_vae_resnet(b, f"{src}.spatial_res_block", f"{dst}/spatial")
            _inv_vae_temporal_resnet(b, f"{src}.temporal_res_block", f"{dst}/temporal")
            b.put(f"{src}.time_mixer.mix_factor",
                  b.leaf(f"{dst}/time_mixer/mix_factor").reshape(()))
        else:
            _inv_vae_resnet(b, src, dst)

    dec_res("decoder.mid_block.resnets.0", "decoder/mid_res_0")
    if b.has("decoder/mid_attn/to_q/kernel"):
        _inv_vae_attention(b, "decoder.mid_block.attentions.0", "decoder/mid_attn")
    dec_res("decoder.mid_block.resnets.1", "decoder/mid_res_1")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec_res(f"decoder.up_blocks.{i}.resnets.{j}", f"decoder/up_{i}_res_{j}")
        if i < n - 1:
            b.conv2d(f"decoder.up_blocks.{i}.upsamplers.0.conv", f"decoder/up_{i}_conv")
    b.norm("decoder.conv_norm_out", "decoder/norm_out")
    b.conv2d("decoder.conv_out", "decoder/conv_out")
    if temporal:
        k = b.leaf("decoder/time_conv_out/kernel")  # [3, 1, in, out]
        b.put("decoder.time_conv_out.weight",
              np.transpose(k[:, 0], (2, 1, 0))[..., None, None])
        b.put("decoder.time_conv_out.bias", b.leaf("decoder/time_conv_out/bias"))
    else:
        b.conv2d("post_quant_conv", "decoder/post_quant_conv")
    return b.out


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModel layout)
# ---------------------------------------------------------------------------


def synth_clip_text(text_params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_clip_text, including the position_ids
    buffer older transformers releases persist."""
    b = _InvBuilder(text_params, np.random.default_rng(seed))
    pre = "text_model."
    b.put(pre + "embeddings.token_embedding.weight", b.leaf("token_embedding/embedding"))
    b.put(pre + "embeddings.position_embedding.weight", b.leaf("position_embedding"))
    b.put(pre + "embeddings.position_ids",
          np.arange(cfg.max_positions, dtype=np.int64)[None])
    for i in range(cfg.num_layers):
        s = f"{pre}encoder.layers.{i}"
        d = f"layer_{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            b.linear(f"{s}.self_attn.{p}", f"{d}/self_attn/{p}")
        b.norm(f"{s}.layer_norm1", f"{d}/layer_norm1")
        b.norm(f"{s}.layer_norm2", f"{d}/layer_norm2")
        b.linear(f"{s}.mlp.fc1", f"{d}/fc1")
        b.linear(f"{s}.mlp.fc2", f"{d}/fc2")
    b.norm(pre + "final_layer_norm", "final_layer_norm")
    if cfg.projection_dim is not None:
        b.linear("text_projection", "text_projection", bias=False)
    return b.out


# ---------------------------------------------------------------------------
# SD3 MMDiT (diffusers SD3Transformer2DModel layout)
# ---------------------------------------------------------------------------


def synth_mmdit(params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_mmdit, including the persisted
    pos_embed.pos_embed buffer (recomputed, not loaded, by the converter)."""
    b = _InvBuilder(params, np.random.default_rng(seed))

    k = b.leaf("patch_proj/kernel")  # [p*p*C, D]
    d_out = k.shape[1]
    p = cfg.patch_size
    c = k.shape[0] // (p * p)
    b.put("pos_embed.proj.weight",
          np.transpose(k.reshape(p, p, c, d_out), (3, 2, 0, 1)))
    b.put("pos_embed.proj.bias", b.leaf("patch_proj/bias"))
    b.put("pos_embed.pos_embed",
          np.zeros((1, cfg.pos_embed_max_size ** 2, d_out), np.float32))

    b.linear("time_text_embed.timestep_embedder.linear_1", "timestep_embedder/linear_1")
    b.linear("time_text_embed.timestep_embedder.linear_2", "timestep_embedder/linear_2")
    b.linear("time_text_embed.text_embedder.linear_1", "text_embedder/linear_1")
    b.linear("time_text_embed.text_embedder.linear_2", "text_embedder/linear_2")
    b.linear("context_embedder", "context_embedder")

    for i in range(cfg.num_layers):
        s = f"transformer_blocks.{i}"
        d = f"block_{i}"
        pre_only = i == cfg.num_layers - 1
        b.linear(f"{s}.norm1.linear", f"{d}/norm1/linear")
        if i in getattr(cfg, "dual_attention_layers", ()):
            s2, d2 = f"{s}.attn2", f"{d}/attn2"
            for q in ("to_q", "to_k", "to_v"):
                b.linear(f"{s2}.{q}", f"{d2}/{q}")
            b.linear(f"{s2}.to_out.0", f"{d2}/to_out")
            if cfg.qk_norm == "rms":
                b.put(f"{s2}.norm_q.weight", b.leaf(f"{d2}/norm_q/scale"))
                b.put(f"{s2}.norm_k.weight", b.leaf(f"{d2}/norm_k/scale"))
        b.linear(f"{s}.norm1_context.linear", f"{d}/norm1_context/linear")
        a_s, a_d = f"{s}.attn", f"{d}/attn"
        for q in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            b.linear(f"{a_s}.{q}", f"{a_d}/{q}")
        b.linear(f"{a_s}.to_out.0", f"{a_d}/to_out")
        if not pre_only:
            b.linear(f"{a_s}.to_add_out", f"{a_d}/to_add_out")
        if cfg.qk_norm == "rms":
            for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                b.put(f"{a_s}.{nm}.weight", b.leaf(f"{a_d}/{nm}/scale"))
        b.linear(f"{s}.ff.net.0.proj", f"{d}/ff/fc1")
        b.linear(f"{s}.ff.net.2", f"{d}/ff/fc2")
        if not pre_only:
            b.linear(f"{s}.ff_context.net.0.proj", f"{d}/ff_context/fc1")
            b.linear(f"{s}.ff_context.net.2", f"{d}/ff_context/fc2")

    b.linear("norm_out.linear", "norm_out_linear")
    b.linear("proj_out", "proj_out")
    return b.out


# ---------------------------------------------------------------------------
# T5 encoder (transformers T5EncoderModel layout)
# ---------------------------------------------------------------------------


def synth_t5(params: Mapping, cfg, seed: int = 0) -> Dict[str, np.ndarray]:
    """Inverse of convert.convert_t5 (HF T5EncoderModel: shared embedding
    duplicated under both names, as released checkpoints do)."""
    b = _InvBuilder(params, np.random.default_rng(seed))
    emb = b.leaf("token_embedding/embedding")
    b.put("shared.weight", emb)
    b.put("encoder.embed_tokens.weight", emb)
    b.put("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
          b.leaf("rel_bias"))
    for i in range(cfg.num_layers):
        s = f"encoder.block.{i}"
        for q in ("q", "k", "v", "o"):
            b.linear(f"{s}.layer.0.SelfAttention.{q}", f"layer_{i}_{q}", bias=False)
        b.put(f"{s}.layer.0.layer_norm.weight", b.leaf(f"layer_{i}_norm_attn/scale"))
        b.linear(f"{s}.layer.1.DenseReluDense.wi_0", f"layer_{i}_wi0", bias=False)
        b.linear(f"{s}.layer.1.DenseReluDense.wi_1", f"layer_{i}_wi1", bias=False)
        b.linear(f"{s}.layer.1.DenseReluDense.wo", f"layer_{i}_wo", bias=False)
        b.put(f"{s}.layer.1.layer_norm.weight", b.leaf(f"layer_{i}_norm_ff/scale"))
    b.put("encoder.final_layer_norm.weight", b.leaf("final_norm/scale"))
    return b.out
