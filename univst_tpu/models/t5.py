"""T5 text encoder (Flax) for SD3/SD3.5 (the reference loads T5-XXL as
text_encoder_3 via diffusers StableDiffusion3Pipeline; SURVEY.md C25).

Standard T5-v1.1 encoder: RMS layer norm (no mean subtraction), relative
position bias on layer 0 shared by all layers, gated-gelu MLP, no biases.
Offline tokenizer shim: empty prompts only (ids = [</s>, pad...]), which is
the only prompt the reference CLIs use; real prompts need the HF tokenizer
files from a checkpoint dir.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

T5_EOS = 1
T5_PAD = 0


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    head_dim: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128

    @staticmethod
    def xxl(**kw) -> "T5Config":
        return T5Config(**kw)

    @staticmethod
    def tiny(**kw) -> "T5Config":
        base = dict(d_model=32, d_ff=64, num_layers=2, num_heads=2, head_dim=16)
        base.update(kw)
        return T5Config(**base)


def _rel_bucket(rel_pos, num_buckets: int, max_distance: int):
    """Bidirectional relative position bucketing (HF T5 _relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5RMSNorm(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
        return (xf * scale).astype(x.dtype)


class T5Encoder(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        b, l = input_ids.shape
        inner = c.num_heads * c.head_dim
        x = nn.Embed(c.vocab_size, c.d_model, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        # relative position bias, computed once, shared by all layers
        pos = jnp.arange(l)
        rel = pos[None, :] - pos[:, None]
        buckets = _rel_bucket(rel, c.rel_buckets, c.rel_max_distance)
        bias_table = self.param(
            "rel_bias", nn.initializers.normal(1.0), (c.rel_buckets, c.num_heads),
            jnp.float32,
        )
        bias = bias_table[buckets].transpose(2, 0, 1)[None]  # [1, H, L, L]

        for i in range(c.num_layers):
            h = T5RMSNorm(dtype=self.dtype, name=f"layer_{i}_norm_attn")(x)
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name=f"layer_{i}_q")(h)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name=f"layer_{i}_k")(h)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name=f"layer_{i}_v")(h)

            def split(y):
                return y.reshape(b, l, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

            # T5 attention is unscaled (scale folded into init)
            logits = jnp.einsum(
                "bhtd,bhsd->bhts", split(q), split(k),
                preferred_element_type=jnp.float32,
            ) + bias
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhts,bhsd->bhtd", probs, split(v))
            o = o.transpose(0, 2, 1, 3).reshape(b, l, inner)
            x = x + nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                             name=f"layer_{i}_o")(o)

            h = T5RMSNorm(dtype=self.dtype, name=f"layer_{i}_norm_ff")(x)
            wi0 = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                           name=f"layer_{i}_wi0")(h)
            wi1 = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype,
                           name=f"layer_{i}_wi1")(h)
            h = nn.gelu(wi0, approximate=True) * wi1
            x = x + nn.Dense(c.d_model, use_bias=False, dtype=self.dtype,
                             name=f"layer_{i}_wo")(h)

        return T5RMSNorm(dtype=self.dtype, name="final_norm")(x)


class T5TokenizerShim:
    """Null-prompt tokenizer; real prompts require HF tokenizer files."""

    def __init__(self, hf_dir: Optional[str] = None, max_len: int = 256):
        self.max_len = max_len
        self._tok = None
        if hf_dir is not None:
            from transformers import T5TokenizerFast

            self._tok = T5TokenizerFast.from_pretrained(hf_dir)

    def __call__(self, prompts) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        if self._tok is not None:
            out = self._tok(
                prompts, padding="max_length", max_length=self.max_len,
                truncation=True, return_tensors="np",
            )
            return out["input_ids"].astype(np.int32)
        if any(p.strip() for p in prompts):
            # offline structural fallback: T5's sentencepiece model cannot be
            # reconstructed without the checkpoint; bytes map into the low id
            # range (bpe.py t5_byte_fallback_ids — valid ids for synthetic
            # weights, real checkpoints take the T5TokenizerFast branch)
            from univst_tpu.models.bpe import t5_byte_fallback_ids

            return t5_byte_fallback_ids(
                prompts, self.max_len, eos_id=T5_EOS, pad_id=T5_PAD)
        ids = [[T5_EOS] + [T5_PAD] * (self.max_len - 1) for _ in prompts]
        return np.asarray(ids, np.int32)
