"""Shared CLI plumbing: platform selection, dtype parsing, output trees."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def setup_jax(platform: Optional[str] = None, cache_dir: str = "/root/.cache/univst_jax_cache"):
    """Select the JAX platform and enable the persistent compile cache.

    On this machine a sitecustomize pins ``jax_platforms='axon,cpu'`` (remote
    TPU first); pass platform='cpu' to force host execution.
    """
    import jax

    import os

    if platform:
        jax.config.update("jax_platforms", platform)
    # multi-host pods: one-time jax.distributed.initialize() before the
    # backend starts (no-op unless JAX_COORDINATOR_ADDRESS/UNIVST_MULTIHOST
    # is set — a v5e-8 is single-host and needs none of this)
    from univst_tpu.distributed.mesh import maybe_init_distributed

    maybe_init_distributed()
    if not os.environ.get("PYTEST_CURRENT_TEST"):
        # Leave the test harness's cache policy alone: the full suite runs
        # with persistent-cache WRITES disabled (tests/conftest.py — jaxlib's
        # CPU executable.serialize() segfaults after ~250 compiles in one
        # process), and the in-process CLI e2e tests must not re-enable them.
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    return jax


def parse_dtype(name: str):
    import jax.numpy as jnp

    return {
        "bf16": jnp.bfloat16,
        "bfloat16": jnp.bfloat16,
        "fp16": jnp.bfloat16,  # fp16 requests map to bf16 on TPU
        "torch.float16": jnp.bfloat16,
        "fp32": jnp.float32,
        "float32": jnp.float32,
    }[str(name)]


def make_output_tree(output_path: str, backbone: str, name: str):
    """{out}/{backbone}/{name}/{inversion,reconstruction,features}
    (reference run_content_inversion_sd.py:60-66)."""
    base = os.path.join(output_path, backbone, name)
    paths = {
        "base": base,
        "inversion": os.path.join(base, "inversion"),
        "reconstruction": os.path.join(base, "reconstruction"),
        "features": os.path.join(base, "features"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    return paths


def save_feature_pt(feature: np.ndarray, features_dir: str, ft_index: int, ft_timestep: int):
    """Save the captured decoder feature in the reference's format:
    ``inversion_feature_map_{i}_block_{t}_step.pt`` holding [F, H, W, C]
    (unet_3d_condition.py:429-436)."""
    import torch

    path = os.path.join(
        features_dir, f"inversion_feature_map_{ft_index}_block_{ft_timestep}_step.pt"
    )
    torch.save(torch.from_numpy(np.asarray(feature, np.float16)), path)
    print(f"save feature map at: {path}")
    return path


def load_feature_pt(path: str) -> np.ndarray:
    import torch

    return torch.load(path, weights_only=True, map_location="cpu").float().numpy()


def build_pipeline_from_args(args, capture_up_block=None):
    """Construct the right backbone pipeline from shared CLI flags."""
    from univst_tpu.cli.common import parse_dtype as _pd

    kw = dict(
        pretrained_model_path=args.pretrained_model_path,
        num_frames=args.num_frames,
        height=args.height,
        width=args.width,
        dtype=_pd(args.weight_dtype),
        capture_up_block=capture_up_block,
        seed=args.seed or 0,
    )
    if args.backbone == "animatediff":
        from univst_tpu.pipelines.animatediff import build_animatediff

        pipe = build_animatediff(
            motion_module_path=getattr(args, "motion_module_path", None),
            dreambooth_path=getattr(args, "dreambooth_path", None),
            lora_path=getattr(args, "lora_path", None),
            lora_alpha=getattr(args, "lora_alpha", 0.8),
            variant="tiny" if args.variant == "tiny" else "ad",
            **kw,
        )
    else:
        from univst_tpu.pipelines.sd import SDVideoPipeline

        pipe = SDVideoPipeline.build(variant=args.variant, **kw)
    return apply_mesh_arg(pipe, args)


def apply_mesh_arg(pipe, args):
    """Attach the --mesh flag's device mesh (``data=N[,tensor=M]``) to a
    pipeline; no-op when the flag is absent/empty."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return pipe
    from univst_tpu.distributed.mesh import parse_mesh_spec

    return pipe.with_mesh(parse_mesh_spec(spec))


def add_mesh_flag(parser):
    parser.add_argument(
        "--mesh", type=str, default=None,
        help="multi-chip device mesh, e.g. 'data=8' (frame-parallel) or "
             "'data=4,tensor=2' (SD3 tensor parallelism); requires that many "
             "JAX devices",
    )
    return parser


def singleton_style_or_fallback(pipe, style_rev, style_inv_path, time_steps):
    """Style-singleton precondition guard shared by the transfer CLIs.

    The fast path slices the style trajectory to one frame — exact only when
    all its frames are identical (true for run_style_inversion_* outputs: a
    repeated style image). A trajectory that violates this (e.g. a content
    inversion passed as --style_inv_path) falls back to the exact legacy
    3-branch batch with a warning instead of silently dropping frames 1..F-1.

    Returns the (possibly replaced) pipeline and style trajectory.
    """
    import dataclasses
    import warnings

    from univst_tpu.core.trajectory import style_frames_identical

    if style_frames_identical(style_inv_path, time_steps):
        # one frame per step -> 16x less host->device traffic, and the
        # singleton fast path runs the 2-branch batch
        return pipe, style_rev[:, :1]
    warnings.warn(
        f"style trajectory at {style_inv_path} has non-identical frames; "
        "disabling the style-singleton fast path"
    )
    return dataclasses.replace(pipe, style_singleton=False), style_rev
