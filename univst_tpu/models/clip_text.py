"""CLIP text encoder (Flax) + tokenizer shim.

The SD / AnimateDiff runners build ``CLIPTextModel`` + ``CLIPTokenizer``
(src/sd/run_content_inversion_sd.py:39-40); SD3 adds a second CLIP
(text_encoder_2, OpenCLIP bigG) with projection. Every prompt the reference
CLIs ever encode is the empty string (init_prompt with prompt="",
inversion_tools/ddim_inversion.py:171-187), so the tokenizer shim supports
null prompts natively even with no vocab files on disk; real prompts use a
user-provided HF tokenizer directory.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BOS_TOKEN = 49406
EOS_TOKEN = 49407
MAX_LEN = 77


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = MAX_LEN
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"  # SD-2.1 uses "gelu"
    # text_projection dim; None for plain CLIPTextModel
    projection_dim: Optional[int] = None

    @staticmethod
    def sd15(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(**kw)

    @staticmethod
    def sd21(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1024, num_layers=23, num_heads=16,
            intermediate_size=4096, hidden_act="gelu", **kw
        )

    @staticmethod
    def sd3_clip_l(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(projection_dim=768, **kw)

    @staticmethod
    def sd3_clip_g(**kw) -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280, num_layers=32, num_heads=20,
            intermediate_size=5120, hidden_act="gelu", projection_dim=1280, **kw
        )

    @staticmethod
    def tiny(**kw) -> "CLIPTextConfig":
        # full vocab so the real BOS/EOS token ids (49406/49407) stay in range
        return CLIPTextConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64, **kw
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d = self.cfg.hidden_size
        h = self.cfg.num_heads
        dh = d // h
        b, l, _ = x.shape
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
        logits = logits * (dh**-0.5) + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(self.cfg.hidden_act)(h)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (hidden_state, pooled) like HF CLIPTextModel[WithProjection].

    ``hidden_state_index`` selects which hidden state to return, indexing the
    HF-style ``output_hidden_states`` list (embeddings output + each layer
    output, num_layers+1 entries, no final LayerNorm applied):
      * ``None`` — the final-LayerNormed last layer (HF ``last_hidden_state``;
        what SD-1.5/2.1 consume).
      * ``-2`` — the penultimate hidden state, which diffusers'
        SD3/SDXL ``encode_prompt`` uses (``clip_skip=None`` maps to
        ``hidden_states[-2]``; ``clip_skip=k`` to ``hidden_states[-(k+2)]``) —
        the semantics the reference inherits via
        video_diffusion_sd3/pipelines/custom_pipeline.py:17.

    The pooled output always comes from the final-normed last layer at the
    first EOS position (HF pooling), regardless of ``hidden_state_index``.
    """

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, hidden_state_index: Optional[int] = None):
        cfg = self.cfg
        b, l = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
            jnp.float32,
        )
        x = tok + pos[None, :l].astype(self.dtype)
        causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)[None, None]
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, self.dtype, name=f"layer_{i}")(x, causal)
            hidden_states.append(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        # pooled: hidden state at the first EOS position per sequence
        eos_pos = jnp.argmax((input_ids == EOS_TOKEN).astype(jnp.int32), axis=1)
        pooled = x[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        out = x if hidden_state_index is None else hidden_states[hidden_state_index]
        return out, pooled


class Tokenizer:
    """CLIP tokenizer shim (reference surface: arbitrary ``--prompt``
    strings, run_content_inversion_sd.py:39).

    * With ``hf_dir`` pointing at an HF checkpoint's ``tokenizer`` folder,
      uses the native :class:`~univst_tpu.models.bpe.ClipBPE` on the real
      ``vocab.json``/``merges.txt`` — ids identical to transformers'
      CLIPTokenizer (pinned by tests/test_bpe.py).
    * Without it, the empty prompt keeps its exact encoding
      ([BOS, EOS, EOS, ...]; CLIP pads with EOS), and non-empty prompts fall
      back to the synthetic real-structure byte-level vocab (valid in-range
      ids for any string; semantically meaningful only with synthetic
      weights — a one-time warning says so).
    """

    def __init__(self, hf_dir: Optional[str] = None, max_len: int = MAX_LEN):
        self.max_len = max_len
        self._bpe = None
        self._synthetic = hf_dir is None
        self._warned = False
        if hf_dir is not None:
            from univst_tpu.models.bpe import ClipBPE

            self._bpe = ClipBPE.from_dir(hf_dir)

    def __call__(self, prompts) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        if self._bpe is None and any(p.strip() for p in prompts):
            from univst_tpu.models.bpe import ClipBPE

            self._bpe = ClipBPE.synthetic()
            if not self._warned:
                print(
                    "[tokenizer] no checkpoint vocab — non-empty prompts use "
                    "the synthetic byte-level CLIP vocabulary (structurally "
                    "valid ids; pass --pretrained_model_path for real-"
                    "checkpoint token ids)", flush=True,
                )
                self._warned = True
        if self._bpe is not None:
            return self._bpe(prompts, max_len=self.max_len)
        row = [BOS_TOKEN, EOS_TOKEN] + [EOS_TOKEN] * (self.max_len - 2)
        return np.asarray([row for _ in prompts], np.int32)
