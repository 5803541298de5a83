"""LPIPS perceptual distance (Zhang et al. 2018) in Flax, with a converter
from the torch checkpoints the original implementation ships.

SURVEY §6 pins the rebuild's quality north star as LPIPS <= 0.02 vs the
reference's outputs; this module is the machinery for that comparison on
weights-day (no pretrained weights are available in this offline
environment, so the unit tests validate the converter + forward against a
torch oracle on random weights — the same methodology as the RAFT
converter, models/raft.py).

Architecture (matching `lpips.LPIPS(net='alex')`):
  * torchvision AlexNet `features` trunk; activations are tapped after each
    of the 5 ReLUs;
  * inputs scaled to [-1, 1] then normalized with the fixed shift/scale the
    original hardcodes;
  * per tap: channel-unit-normalize, squared difference, a learned
    non-negative 1x1 conv ("lin" head) to 1 channel, spatial mean;
  * the distance is the sum of the 5 per-tap means.

Weight sources: `alexnet-owt-*.pth` (torchvision state_dict) for the trunk
and the `lin` state_dict from the lpips release. Layout conversion is
OIHW -> HWIO; everything runs NHWC like the rest of the package.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad) of the torchvision AlexNet features convs;
# taps are the ReLU outputs right after each conv.
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# maxpool(kernel 3, stride 2) sits after taps 0, 1 and 4 in the trunk; only
# the ones before later taps matter for LPIPS (the final pool feeds nothing).
_POOL_AFTER = (0, 1)

# fixed input normalization (lpips ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _maxpool_3x3s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _alex_taps(params: Mapping[str, Any], x: jnp.ndarray) -> list:
    """AlexNet trunk on NHWC input; returns the 5 ReLU tap activations."""
    taps = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        w, b = params[f"conv{i}"]["w"], params[f"conv{i}"]["b"]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool_3x3s2(x)
    return taps


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def lpips_distance(params: Mapping[str, Any], a: jnp.ndarray,
                   b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch element.

    ``a``/``b``: NHWC RGB in [-1, 1] (map uint8 frames with x/127.5 - 1).
    Returns shape [N] fp32 distances.
    """
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    an = (a.astype(jnp.float32) - shift) / scale
    bn = (b.astype(jnp.float32) - shift) / scale
    dist = 0.0
    for i, (ta, tb) in enumerate(zip(_alex_taps(params, an),
                                     _alex_taps(params, bn))):
        diff = (_unit_normalize(ta) - _unit_normalize(tb)) ** 2
        lin = params[f"lin{i}"]["w"]  # [C, 1] non-negative head
        contrib = jnp.einsum("nhwc,co->nhwo", diff, lin)
        dist = dist + contrib.mean(axis=(1, 2))[:, 0]
    return dist


def lpips_params_from_torch(alexnet_sd: Mapping[str, Any],
                            lin_sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert torch state dicts to this module's param tree.

    ``alexnet_sd``: torchvision AlexNet state_dict (uses the
    ``features.{0,3,6,8,10}.{weight,bias}`` conv entries, OIHW).
    ``lin_sd``: the lpips ``lin`` heads — accepts both the release layout
    ``lin{i}.model.1.weight`` and a bare ``{i}.weight``, shape [1, C, 1, 1].
    """
    import torch

    def t2n(t):
        return np.asarray(t.detach().cpu().to(torch.float32).numpy())

    params: Dict[str, Any] = {}
    feat_idx = (0, 3, 6, 8, 10)
    for i, fi in enumerate(feat_idx):
        w = t2n(alexnet_sd[f"features.{fi}.weight"])  # OIHW
        b = t2n(alexnet_sd[f"features.{fi}.bias"])
        params[f"conv{i}"] = {"w": w.transpose(2, 3, 1, 0), "b": b}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"{i}.weight",
                    f"lins.{i}.model.1.weight"):
            if key in lin_sd:
                w = t2n(lin_sd[key])  # [1, C, 1, 1]
                params[f"lin{i}"] = {"w": w[:, :, 0, 0].T}  # -> [C, 1]
                break
        else:
            raise KeyError(f"no lin head {i} in lin state_dict "
                           f"(keys: {sorted(lin_sd)[:4]}...)")
    return params


def load_lpips_params(alexnet_path: str, lin_path: str) -> Dict[str, Any]:
    """Load + convert the two torch checkpoint files."""
    import torch

    alex = torch.load(alexnet_path, map_location="cpu", weights_only=True)
    lin = torch.load(lin_path, map_location="cpu", weights_only=True)
    return lpips_params_from_torch(alex, lin)


def random_lpips_params(seed: int = 0) -> Dict[str, Any]:
    """Random-weight param tree (converter-shaped) for offline tests."""
    rng = np.random.default_rng(seed)
    params: Dict[str, Any] = {}
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX_CONVS):
        params[f"conv{i}"] = {
            "w": rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32),
            "b": rng.normal(0, 0.01, (cout,)).astype(np.float32),
        }
        cin = cout
        params[f"lin{i}"] = {
            "w": np.abs(rng.normal(0, 0.1, (cout, 1))).astype(np.float32),
        }
    return params
