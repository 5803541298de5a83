"""torch/diffusers checkpoint -> Flax parameter converters.

Rebuild of the reference weight plumbing (SURVEY.md C19):
  * diffusers 2D SD UNet -> inflated pseudo-3D Flax UNet, preserving the
    reference's from_2d_model semantics (unet_3d_condition.py:445-509):
    every 2D key must land, temporal params keep their identity/zero inits.
  * diffusers AutoencoderKL / AutoencoderKLTemporalDecoder -> Flax VAE.
  * HF CLIPTextModel -> Flax CLIP.

All converters are *strict*: unconsumed source keys or unassigned (non-temporal)
target leaves raise, mirroring load_2d_state_dict's both-direction check.

Weight layout transforms (torch -> flax):
  Linear  [out, in]        -> kernel [in, out]            (transpose)
  Conv2d  [out, in, kh, kw]-> kernel [kh, kw, in, out]    (2, 3, 1, 0)
  Conv1d  [out, in, k]     -> kernel [k, in, out]         (2, 1, 0)
  Norm    weight/bias      -> scale/bias
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from univst_tpu.models.unet_sd import UNetSDConfig
from univst_tpu.models.vae import VAEConfig
from univst_tpu.models.clip_text import CLIPTextConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt/.ckpt/.safetensors file to numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _linear(w):
    return np.ascontiguousarray(w.T)


def _conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv1d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


class _TreeBuilder:
    """Accumulates flax param leaves by '/'-joined path with strict accounting."""

    def __init__(self, source: Mapping[str, np.ndarray]):
        self.src = dict(source)
        self.used = set()
        self.tree: Dict = {}

    def take(self, key: str) -> np.ndarray:
        if key not in self.src:
            raise KeyError(f"source checkpoint is missing key: {key}")
        self.used.add(key)
        return self.src[key]

    def has(self, key: str) -> bool:
        return key in self.src

    def put(self, path: str, value: np.ndarray):
        parts = path.split("/")
        node = self.tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if parts[-1] in node:
            raise ValueError(f"duplicate assignment to {path}")
        node[parts[-1]] = value

    def linear(self, src: str, dst: str, bias: bool = True):
        self.put(dst + "/kernel", _linear(self.take(src + ".weight")))
        if bias:
            self.put(dst + "/bias", self.take(src + ".bias"))

    def conv2d(self, src: str, dst: str):
        self.put(dst + "/kernel", _conv2d(self.take(src + ".weight")))
        self.put(dst + "/bias", self.take(src + ".bias"))

    def conv1d(self, src: str, dst: str):
        self.put(dst + "/kernel", _conv1d(self.take(src + ".weight")))
        self.put(dst + "/bias", self.take(src + ".bias"))

    def norm(self, src: str, dst: str):
        self.put(dst + "/scale", self.take(src + ".weight"))
        self.put(dst + "/bias", self.take(src + ".bias"))

    def finish(self, allow_unused_prefixes: Tuple[str, ...] = ()) -> Dict:
        unused = [
            k
            for k in self.src
            if k not in self.used and not any(k.startswith(p) for p in allow_unused_prefixes)
        ]
        if unused:
            raise ValueError(
                f"{len(unused)} unconsumed checkpoint keys, e.g. {sorted(unused)[:5]}"
            )
        return self.tree


# ---------------------------------------------------------------------------
# SD UNet (diffusers 2D UNet2DConditionModel checkpoint)
# ---------------------------------------------------------------------------


def _unet_transformer(b: _TreeBuilder, src: str, dst: str, use_linear: bool):
    b.norm(f"{src}.norm", f"{dst}/norm")
    if use_linear:
        b.linear(f"{src}.proj_in", f"{dst}/proj_in")
        b.linear(f"{src}.proj_out", f"{dst}/proj_out")
    else:
        # 1x1 conv == dense on NHWC: squeeze the spatial dims
        w = b.take(f"{src}.proj_in.weight")
        b.put(f"{dst}/proj_in/kernel", _linear(w[:, :, 0, 0]))
        b.put(f"{dst}/proj_in/bias", b.take(f"{src}.proj_in.bias"))
        w = b.take(f"{src}.proj_out.weight")
        b.put(f"{dst}/proj_out/kernel", _linear(w[:, :, 0, 0]))
        b.put(f"{dst}/proj_out/bias", b.take(f"{src}.proj_out.bias"))
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


def _unet_resnet(b: _TreeBuilder, src: str, dst: str):
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    b.conv2d(f"{src}.conv1", f"{dst}/conv1/spatial")
    b.linear(f"{src}.time_emb_proj", f"{dst}/time_emb_proj")
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    b.conv2d(f"{src}.conv2", f"{dst}/conv2/spatial")
    if b.has(f"{src}.conv_shortcut.weight"):
        b.conv2d(f"{src}.conv_shortcut", f"{dst}/conv_shortcut/spatial")


def convert_sd_unet(
    state_dict: Mapping[str, np.ndarray], cfg: UNetSDConfig
) -> Dict:
    """diffusers UNet2DConditionModel state_dict -> partial Flax tree.

    Temporal parameters (conv temporal taps, attn_temporal, norm_temporal) are
    deliberately absent — merge over the Flax init with
    :func:`merge_into_params` so they keep their identity/zero inits
    (reference: load_2d_state_dict skips '*_temporal', unet_3d_condition.py:502-504).
    """
    b = _TreeBuilder(state_dict)
    n = len(cfg.block_out_channels)
    lin = cfg.use_linear_projection

    b.conv2d("conv_in", "conv_in/spatial")
    b.linear("time_embedding.linear_1", "time_embedding/linear_1")
    b.linear("time_embedding.linear_2", "time_embedding/linear_2")

    for i in range(n):
        for j in range(cfg.layers_per_block):
            _unet_resnet(b, f"down_blocks.{i}.resnets.{j}", f"down_{i}/resnet_{j}")
            if cfg.down_block_has_attn[i]:
                _unet_transformer(
                    b, f"down_blocks.{i}.attentions.{j}", f"down_{i}/attn_{j}", lin
                )
        if i < n - 1:
            b.conv2d(f"down_blocks.{i}.downsamplers.0.conv", f"down_{i}/downsample/spatial")

    _unet_resnet(b, "mid_block.resnets.0", "mid/resnet_0")
    _unet_resnet(b, "mid_block.resnets.1", "mid/resnet_1")
    _unet_transformer(b, "mid_block.attentions.0", "mid/attn_0", lin)

    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _unet_resnet(b, f"up_blocks.{i}.resnets.{j}", f"up_{i}/resnet_{j}")
            if cfg.up_block_has_attn[i]:
                _unet_transformer(
                    b, f"up_blocks.{i}.attentions.{j}", f"up_{i}/attn_{j}", lin
                )
        if i < n - 1:
            b.conv2d(f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}/upsample/spatial")

    b.norm("conv_norm_out", "conv_norm_out")
    b.conv2d("conv_out", "conv_out/spatial")
    return b.finish()


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL / AutoencoderKLTemporalDecoder)
# ---------------------------------------------------------------------------


def _vae_resnet(b: _TreeBuilder, src: str, dst: str):
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    b.conv2d(f"{src}.conv1", f"{dst}/conv1")
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    b.conv2d(f"{src}.conv2", f"{dst}/conv2")
    if b.has(f"{src}.conv_shortcut.weight"):
        b.conv2d(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")


def _vae_temporal_resnet(b: _TreeBuilder, src: str, dst: str):
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    # temporal convs are (3,1,1) Conv3d in torch: [out, in, 3, 1, 1] ->
    # our (3, 1) conv kernels [3, 1, in, out]
    for conv in ("conv1", "conv2"):
        w = b.take(f"{src}.{conv}.weight")[:, :, :, 0, 0]  # [out, in, 3]
        b.put(f"{dst}/{conv}/kernel", _conv1d(w)[:, None])
        b.put(f"{dst}/{conv}/bias", b.take(f"{src}.{conv}.bias"))
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    if b.has(f"{src}.conv_shortcut.weight"):
        w = b.take(f"{src}.conv_shortcut.weight")[:, :, 0, 0, 0]
        b.put(f"{dst}/conv_shortcut/kernel", _linear(w))
        b.put(f"{dst}/conv_shortcut/bias", b.take(f"{src}.conv_shortcut.bias"))


def _vae_attention(b: _TreeBuilder, src: str, dst: str):
    b.norm(f"{src}.group_norm", f"{dst}/norm")
    for p in ("to_q", "to_k", "to_v"):
        b.linear(f"{src}.{p}", f"{dst}/{p}")
    b.linear(f"{src}.to_out.0", f"{dst}/to_out")


def convert_vae(state_dict: Mapping[str, np.ndarray], cfg: VAEConfig) -> Dict:
    b = _TreeBuilder(state_dict)
    n = len(cfg.block_out_channels)

    # encoder
    b.conv2d("encoder.conv_in", "encoder/conv_in")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _vae_resnet(b, f"encoder.down_blocks.{i}.resnets.{j}", f"encoder/down_{i}_res_{j}")
        if i < n - 1:
            b.conv2d(f"encoder.down_blocks.{i}.downsamplers.0.conv", f"encoder/down_{i}_conv")
    _vae_resnet(b, "encoder.mid_block.resnets.0", "encoder/mid_res_0")
    _vae_attention(b, "encoder.mid_block.attentions.0", "encoder/mid_attn")
    _vae_resnet(b, "encoder.mid_block.resnets.1", "encoder/mid_res_1")
    b.norm("encoder.conv_norm_out", "encoder/norm_out")
    b.conv2d("encoder.conv_out", "encoder/conv_out")
    b.conv2d("quant_conv", "encoder/quant_conv")

    # decoder
    b.conv2d("decoder.conv_in", "decoder/conv_in")
    temporal = cfg.temporal_decoder

    def dec_res(src, dst):
        if temporal:
            _vae_resnet(b, f"{src}.spatial_res_block", f"{dst}/spatial")
            _vae_temporal_resnet(b, f"{src}.temporal_res_block", f"{dst}/temporal")
            b.put(f"{dst}/time_mixer/mix_factor", np.atleast_1d(b.take(f"{src}.time_mixer.mix_factor")))
        else:
            _vae_resnet(b, src, dst)

    dec_res("decoder.mid_block.resnets.0", "decoder/mid_res_0")
    if b.has("decoder.mid_block.attentions.0.to_q.weight"):
        _vae_attention(b, "decoder.mid_block.attentions.0", "decoder/mid_attn")
    dec_res("decoder.mid_block.resnets.1", "decoder/mid_res_1")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec_res(f"decoder.up_blocks.{i}.resnets.{j}", f"decoder/up_{i}_res_{j}")
        if i < n - 1:
            b.conv2d(f"decoder.up_blocks.{i}.upsamplers.0.conv", f"decoder/up_{i}_conv")
    b.norm("decoder.conv_norm_out", "decoder/norm_out")
    b.conv2d("decoder.conv_out", "decoder/conv_out")
    if temporal:
        w = b.take("decoder.time_conv_out.weight")[:, :, :, 0, 0]
        b.put("decoder/time_conv_out/kernel", _conv1d(w)[:, None])
        b.put("decoder/time_conv_out/bias", b.take("decoder.time_conv_out.bias"))
    else:
        b.conv2d("post_quant_conv", "decoder/post_quant_conv")
    return b.finish()


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


def convert_clip_text(state_dict: Mapping[str, np.ndarray], cfg: CLIPTextConfig) -> Dict:
    b = _TreeBuilder(state_dict)
    pre = "text_model."
    b.put("token_embedding/embedding", b.take(pre + "embeddings.token_embedding.weight"))
    b.put("position_embedding", b.take(pre + "embeddings.position_embedding.weight"))
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
    # position_ids buffers and unused extra layers are ignorable
    return b.finish(allow_unused_prefixes=("text_model.embeddings.position_ids",))


# ---------------------------------------------------------------------------
# merge helpers
# ---------------------------------------------------------------------------


def merge_into_params(init_params: Dict, converted: Dict, path: str = "") -> Dict:
    """Overlay converted leaves onto an init tree, strict on shape mismatches.

    Leaves present in init but not in converted keep their init values (the
    temporal identity/zero params). Leaves in converted but absent from init
    raise.
    """
    import jax.numpy as jnp

    out = {}
    for k, v in init_params.items():
        p = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            sub = converted.get(k, {})
            if not isinstance(sub, dict):
                raise ValueError(f"tree/leaf mismatch at {p}")
            out[k] = merge_into_params(v, sub, p)
        else:
            if k in converted:
                c = converted[k]
                if tuple(c.shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {p}: ckpt {c.shape} vs model {v.shape}"
                    )
                out[k] = jnp.asarray(c, dtype=v.dtype)
            else:
                out[k] = v
    extra = _extra_paths(converted, init_params)
    if extra:
        raise ValueError(f"converted keys not present in model: {extra[:5]}")
    return out


def _extra_paths(converted: Dict, init_params: Dict, path: str = ""):
    extra = []
    for k, v in converted.items():
        p = f"{path}/{k}" if path else k
        if k not in init_params:
            extra.append(p)
        elif isinstance(v, dict) and isinstance(init_params[k], dict):
            extra.extend(_extra_paths(v, init_params[k], p))
    return extra


# ---------------------------------------------------------------------------
# AnimateDiff UNet (diffusers 2D base + motion-module checkpoint)
# ---------------------------------------------------------------------------


def _ad_resnet(b: _TreeBuilder, src: str, dst: str):
    b.norm(f"{src}.norm1", f"{dst}/norm1")
    b.conv2d(f"{src}.conv1", f"{dst}/conv1")
    b.linear(f"{src}.time_emb_proj", f"{dst}/time_emb_proj")
    b.norm(f"{src}.norm2", f"{dst}/norm2")
    b.conv2d(f"{src}.conv2", f"{dst}/conv2")
    if b.has(f"{src}.conv_shortcut.weight"):
        b.conv2d(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")


def convert_ad_unet(state_dict: Mapping[str, np.ndarray], cfg) -> Dict:
    """diffusers 2D UNet state_dict -> AnimateDiff Flax tree (flat names).

    The motion-module parameters come from a separate checkpoint
    (convert_motion_module); they keep their zero/identity init here —
    reference from_pretrained_2d + load_weights split
    (animatediff/utils/util.py:89-121)."""
    b = _TreeBuilder(state_dict)
    n = len(cfg.block_out_channels)
    lin = cfg.use_linear_projection

    b.conv2d("conv_in", "conv_in")
    b.linear("time_embedding.linear_1", "time_embedding/linear_1")
    b.linear("time_embedding.linear_2", "time_embedding/linear_2")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            _ad_resnet(b, f"down_blocks.{i}.resnets.{j}", f"down_{i}_resnet_{j}")
            if cfg.down_block_has_attn[i]:
                _unet_transformer(
                    b, f"down_blocks.{i}.attentions.{j}", f"down_{i}_attn_{j}", lin
                )
        if i < n - 1:
            b.conv2d(f"down_blocks.{i}.downsamplers.0.conv", f"down_{i}_downsample")
    _ad_resnet(b, "mid_block.resnets.0", "mid_resnet_0")
    _ad_resnet(b, "mid_block.resnets.1", "mid_resnet_1")
    _unet_transformer(b, "mid_block.attentions.0", "mid_attn_0", lin)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            _ad_resnet(b, f"up_blocks.{i}.resnets.{j}", f"up_{i}_resnet_{j}")
            if cfg.up_block_has_attn[i]:
                _unet_transformer(b, f"up_blocks.{i}.attentions.{j}", f"up_{i}_attn_{j}", lin)
        if i < n - 1:
            b.conv2d(f"up_blocks.{i}.upsamplers.0.conv", f"up_{i}_upsample")
    b.norm("conv_norm_out", "conv_norm_out")
    b.conv2d("conv_out", "conv_out")
    return b.finish()


def convert_motion_module(state_dict: Mapping[str, np.ndarray], cfg) -> Dict:
    """AnimateDiff motion-module ckpt (mm_sd_v15_v2-style keys) -> Flax tree.

    Mirrors load_weights' zero-unexpected-keys assertion
    (animatediff/utils/util.py:119-120): every motion_modules.* key must map.
    """
    b = _TreeBuilder({k: v for k, v in state_dict.items() if "motion_modules" in k})

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
    # pos_encoder.pe buffers are non-persistent in the reference; tolerate them
    return b.finish(allow_unused_prefixes=tuple(
        k for k in b.src if k.endswith("pos_encoder.pe")
    ))


# ---------------------------------------------------------------------------
# SD3 MMDiT (diffusers SD3Transformer2DModel checkpoint)
# ---------------------------------------------------------------------------


def convert_mmdit(state_dict: Mapping[str, np.ndarray], cfg) -> Dict:
    """diffusers SD3Transformer2DModel -> Flax MMDiT tree.

    The positional embedding is recomputed (fixed sin-cos) rather than loaded;
    diffusers persists it as pos_embed.pos_embed, tolerated below."""
    b = _TreeBuilder(state_dict)

    # patchify conv (p x p, stride p) == Dense over (p, p, C)-flattened patches
    w = b.take("pos_embed.proj.weight")  # [D, C, p, p]
    d_out = w.shape[0]
    k = np.transpose(w, (2, 3, 1, 0)).reshape(-1, d_out)
    b.put("patch_proj/kernel", np.ascontiguousarray(k))
    b.put("patch_proj/bias", b.take("pos_embed.proj.bias"))

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
            _convert_mmdit_dual(b, cfg, i)
        b.linear(f"{s}.norm1_context.linear", f"{d}/norm1_context/linear")
        a_s, a_d = f"{s}.attn", f"{d}/attn"
        for p in ("to_q", "to_k", "to_v"):
            b.linear(f"{a_s}.{p}", f"{a_d}/{p}")
        for p in ("add_q_proj", "add_k_proj", "add_v_proj"):
            b.linear(f"{a_s}.{p}", f"{a_d}/{p}")
        b.linear(f"{a_s}.to_out.0", f"{a_d}/to_out")
        if not pre_only:
            b.linear(f"{a_s}.to_add_out", f"{a_d}/to_add_out")
        if cfg.qk_norm == "rms":
            for src, dst in (("norm_q", "norm_q"), ("norm_k", "norm_k"),
                             ("norm_added_q", "norm_added_q"),
                             ("norm_added_k", "norm_added_k")):
                b.put(f"{a_d}/{dst}/scale", b.take(f"{a_s}.{src}.weight"))
        b.linear(f"{s}.ff.net.0.proj", f"{d}/ff/fc1")
        b.linear(f"{s}.ff.net.2", f"{d}/ff/fc2")
        if not pre_only:
            b.linear(f"{s}.ff_context.net.0.proj", f"{d}/ff_context/fc1")
            b.linear(f"{s}.ff_context.net.2", f"{d}/ff_context/fc2")

    b.linear("norm_out.linear", "norm_out_linear")
    b.linear("proj_out", "proj_out")
    return b.finish(allow_unused_prefixes=("pos_embed.pos_embed",))


# ---------------------------------------------------------------------------
# T5 encoder (HF T5EncoderModel checkpoint)
# ---------------------------------------------------------------------------


def convert_t5(state_dict: Mapping[str, np.ndarray], cfg) -> Dict:
    b = _TreeBuilder(state_dict)
    emb = b.take("shared.weight") if b.has("shared.weight") else b.take(
        "encoder.embed_tokens.weight"
    )
    b.put("token_embedding/embedding", emb)
    b.put(
        "rel_bias",
        b.take("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"),
    )
    for i in range(cfg.num_layers):
        s = f"encoder.block.{i}"
        for src, dst in (("q", "q"), ("k", "k"), ("v", "v"), ("o", "o")):
            b.linear(f"{s}.layer.0.SelfAttention.{src}", f"layer_{i}_{dst}", bias=False)
        b.put(f"layer_{i}_norm_attn/scale", b.take(f"{s}.layer.0.layer_norm.weight"))
        b.linear(f"{s}.layer.1.DenseReluDense.wi_0", f"layer_{i}_wi0", bias=False)
        b.linear(f"{s}.layer.1.DenseReluDense.wi_1", f"layer_{i}_wi1", bias=False)
        b.linear(f"{s}.layer.1.DenseReluDense.wo", f"layer_{i}_wo", bias=False)
        b.put(f"layer_{i}_norm_ff/scale", b.take(f"{s}.layer.1.layer_norm.weight"))
    b.put("final_norm/scale", b.take("encoder.final_layer_norm.weight"))
    return b.finish(allow_unused_prefixes=("encoder.embed_tokens.weight", "shared.weight"))


# ---------------------------------------------------------------------------
# RAFT (princeton-vl checkpoint layout: fnet.* / cnet.* / update_block.*)
# ---------------------------------------------------------------------------


def _fold_bn(b: _TreeBuilder, src: str, dst: str, eps: float = 1e-5):
    """BatchNorm (weight, bias, running stats) -> inference scale/bias."""
    w = b.take(src + ".weight")
    bias = b.take(src + ".bias")
    mean = b.take(src + ".running_mean")
    var = b.take(src + ".running_var")
    if b.has(src + ".num_batches_tracked"):
        b.take(src + ".num_batches_tracked")
    scale = w / np.sqrt(var + eps)
    b.put(dst + "/scale", scale)
    b.put(dst + "/bias", bias - mean * scale)


def _torchvision_raft_to_princeton(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """torchvision Raft_Large_Weights layout -> princeton-vl key names.

    The reference smoother loads torchvision's ``raft_large`` weights
    (src/cal_optica_flow.py:4,53-54). torchvision's module tree
    (feature_encoder/context_encoder with Conv2dNormActivation children,
    update_block.motion_encoder / .recurrent_block / .flow_head, top-level
    mask_predictor) is an exact architectural match for princeton-vl RAFT —
    only names differ. This renames keys so :func:`convert_raft`'s princeton
    mapping applies.
    """
    renames = [
        ("feature_encoder.convnormrelu.0", "fnet.conv1"),
        ("feature_encoder.convnormrelu.1", "fnet.norm1"),
        ("context_encoder.convnormrelu.0", "cnet.conv1"),
        ("context_encoder.convnormrelu.1", "cnet.norm1"),
        ("update_block.motion_encoder.convcorr1.0", "update_block.encoder.convc1"),
        ("update_block.motion_encoder.convcorr2.0", "update_block.encoder.convc2"),
        ("update_block.motion_encoder.convflow1.0", "update_block.encoder.convf1"),
        ("update_block.motion_encoder.convflow2.0", "update_block.encoder.convf2"),
        ("update_block.motion_encoder.conv.0", "update_block.encoder.conv"),
        ("update_block.recurrent_block.convgru1.convz", "update_block.gru.convz1"),
        ("update_block.recurrent_block.convgru1.convr", "update_block.gru.convr1"),
        ("update_block.recurrent_block.convgru1.convq", "update_block.gru.convq1"),
        ("update_block.recurrent_block.convgru2.convz", "update_block.gru.convz2"),
        ("update_block.recurrent_block.convgru2.convr", "update_block.gru.convr2"),
        ("update_block.recurrent_block.convgru2.convq", "update_block.gru.convq2"),
        ("update_block.flow_head.", "update_block.flow_head."),
        ("mask_predictor.convrelu.0", "update_block.mask.0"),
        ("mask_predictor.conv", "update_block.mask.2"),
    ]
    for enc_src, enc_dst in (("feature_encoder", "fnet"), ("context_encoder", "cnet")):
        for stage in (1, 2, 3):
            for blk in (0, 1):
                s = f"{enc_src}.layer{stage}.{blk}"
                d = f"{enc_dst}.layer{stage}.{blk}"
                renames += [
                    (f"{s}.convnormrelu1.0", f"{d}.conv1"),
                    (f"{s}.convnormrelu1.1", f"{d}.norm1"),
                    (f"{s}.convnormrelu2.0", f"{d}.conv2"),
                    (f"{s}.convnormrelu2.1", f"{d}.norm2"),
                    (f"{s}.downsample.0", f"{d}.downsample.0"),
                    (f"{s}.downsample.1", f"{d}.downsample.1"),
                ]
        renames.append((f"{enc_src}.conv.", f"{enc_dst}.conv2."))
    # longest-prefix-first so block renames win over encoder-stem renames
    renames.sort(key=lambda ab: -len(ab[0]))
    out = {}
    for k, v in sd.items():
        nk = k
        for a, bnew in renames:
            if nk.startswith(a):
                nk = bnew + nk[len(a):]
                break
        out[nk] = v
    return out


def convert_raft(state_dict: Mapping[str, np.ndarray], cfg=None) -> Dict:
    """RAFT checkpoint -> Flax tree. Accepts BOTH layouts:

    * princeton-vl (raft-things/sintel .pth): ``fnet.* / cnet.* /
      update_block.*``; ``module.`` DataParallel prefixes stripped.
    * torchvision ``Raft_Large_Weights`` (what the reference smoother loads,
      src/cal_optica_flow.py:53-54): auto-detected by the
      ``feature_encoder.`` prefix and renamed via
      :func:`_torchvision_raft_to_princeton`.

    fnet uses instance norm (affine=False -> no params in the ckpt); cnet uses
    BatchNorm, folded to inference scale/bias.
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    if any(k.startswith("feature_encoder.") for k in sd):
        sd = _torchvision_raft_to_princeton(sd)
    b = _TreeBuilder(sd)

    def encoder(src: str, dst: str, norm: str):
        b.conv2d(f"{src}.conv1", f"{dst}/conv1")
        if norm == "batch":
            _fold_bn(b, f"{src}.norm1", f"{dst}/norm1")
        for stage in (1, 2, 3):
            for blk in (0, 1):
                s = f"{src}.layer{stage}.{blk}"
                d = f"{dst}/layer{stage}_{blk}"
                b.conv2d(f"{s}.conv1", f"{d}/conv1")
                b.conv2d(f"{s}.conv2", f"{d}/conv2")
                if norm == "batch":
                    _fold_bn(b, f"{s}.norm1", f"{d}/norm1")
                    _fold_bn(b, f"{s}.norm2", f"{d}/norm2")
                if b.has(f"{s}.downsample.0.weight"):
                    b.conv2d(f"{s}.downsample.0", f"{d}/downsample")
                    if norm == "batch":
                        _fold_bn(b, f"{s}.downsample.1", f"{d}/norm3")
        b.conv2d(f"{src}.conv2", f"{dst}/conv2")

    encoder("fnet", "fnet", "instance")
    encoder("cnet", "cnet", "batch")

    enc = "update_block.encoder"
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        b.conv2d(f"{enc}.{name}", f"update_block/{name}")
    for name in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        b.conv2d(f"update_block.gru.{name}", f"update_block/gru/{name}")
    b.conv2d("update_block.flow_head.conv1", "update_block/flow_head_conv1")
    b.conv2d("update_block.flow_head.conv2", "update_block/flow_head_conv2")
    b.conv2d("update_block.mask.0", "update_block/mask_conv1")
    b.conv2d("update_block.mask.2", "update_block/mask_conv2")
    return b.finish()


def _convert_mmdit_dual(b: _TreeBuilder, cfg, i: int):
    """Extra params of an SD3.5-medium dual-attention block."""
    s = f"transformer_blocks.{i}.attn2"
    d = f"block_{i}/attn2"
    for p in ("to_q", "to_k", "to_v"):
        b.linear(f"{s}.{p}", f"{d}/{p}")
    b.linear(f"{s}.to_out.0", f"{d}/to_out")
    if cfg.qk_norm == "rms":
        b.put(f"{d}/norm_q/scale", b.take(f"{s}.norm_q.weight"))
        b.put(f"{d}/norm_k/scale", b.take(f"{s}.norm_k.weight"))
