"""Live LoRA adapters (C16).

The reference ships two pieces of LoRA machinery:

  * a weight-merge path (``convert_lora``,
    backbones/animatediff/utils/convert_lora_safetensor_to_diffusers.py:24-100)
    — ``W <- W + alpha * up @ down`` baked into the checkpoint at load. Its
    rebuild is :func:`univst_tpu.models.convert_ldm.merge_lora`.
  * "live" attention processors
    (backbones/video_diffusion_sd/models/lora.py:28-137) that add the adapter
    at runtime. Those classes are dead code in the reference — no CLI ever
    instantiates them, and ``LoRALinearLayer`` is built on ``nn.Conv1d`` whose
    channel axis would be the TOKEN axis of the ``[B, L, C]`` tensors it is
    called on (lora.py:36-43), so they cannot run as written.

The TPU-native live path here keeps the semantics the merge path defines while
staying functional and jit-friendly: the LoRA is converted ONCE into a Flax
**delta tree** (alpha=1), and :func:`apply_lora` produces adapted parameters
as ``base + scale * delta`` — a cheap elementwise op, so the scale can change
at runtime without re-reading or mutating any checkpoint. By construction the
adapted parameters are bit-identical to the merge path at the same alpha
(tests/test_lora.py).

:class:`LoRALinearLayer` is the module-level counterpart (rank-factorized
down/up with zero-init up, the standard LoRA init) for models that want the
factorized form in the forward pass.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.models.convert_ldm import merge_lora


class LoRALinearLayer(nn.Module):
    """Rank-factorized adapter: ``delta(x) = x @ down^T @ up^T``.

    ``up`` is zero-initialized so the adapter is exactly inert at init
    (reference lora.py:47 ``nn.init.zeros_(self.up.weight)``); ``down`` uses
    the reference's normal(std=1/rank) init (lora.py:44).
    """

    features: int
    rank: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        rank = min(self.rank, min(x.shape[-1], self.features))
        down = nn.Dense(
            rank, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.normal(1.0 / rank), name="down",
        )
        up = nn.Dense(
            self.features, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="up",
        )
        return up(down(x))


def lora_delta_params(
    base_sd: Mapping[str, np.ndarray],
    lora_sd: Mapping[str, np.ndarray],
    convert_fn: Callable[[Mapping[str, np.ndarray]], Dict],
) -> Dict:
    """Convert a webui-format LoRA into a Flax parameter DELTA tree (alpha=1).

    ``convert_fn`` is the strict torch->Flax converter for the target model
    (e.g. ``convert.convert_sd_unet`` / ``convert_ad_unet`` partially applied
    with its config). The delta is computed as
    ``convert(merge(base, lora, 1)) - convert(base)``, so every converter
    transpose/reshape rule applies to the adapter exactly as it applies to the
    base weights.
    """
    merged = merge_lora(base_sd, lora_sd, alpha=1.0)
    tree_base = convert_fn(base_sd)
    tree_merged = convert_fn(merged)
    return jax.tree_util.tree_map(
        lambda m, b: np.asarray(m, np.float32) - np.asarray(b, np.float32),
        tree_merged,
        tree_base,
    )


def apply_lora(params, delta, scale: float = 1.0):
    """``base + scale * delta`` over the keys present in ``delta`` (a partial
    tree with the same structure as the matching ``params`` subtree). Pure and
    jit-able; call again with a different ``scale`` to re-weight the adapter
    at runtime — the base parameters are never mutated."""

    def rec(p, d):
        if isinstance(d, dict):
            out = dict(p)
            for k, v in d.items():
                out[k] = rec(p[k], v)
            return out
        return (jnp.asarray(p, jnp.float32) + scale * jnp.asarray(d, jnp.float32)).astype(
            jnp.asarray(p).dtype
        )

    return rec(params, delta)
