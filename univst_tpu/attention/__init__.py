"""Attention: functional ops (style shift, sparse-causal KV) and Pallas kernels."""

from univst_tpu.attention.ops import (  # noqa: F401
    sdpa,
    cross_frame_kv,
    apply_style_shift,
    apply_style_shift_sd3,
)
