"""UniVST-TPU: a TPU-native JAX framework for training-free, localized video style transfer.

A from-scratch rebuild (not a port) of the capabilities of QuanjianSong/UniVST
(TPAMI 2025, arXiv 2410.20084): DDIM / rectified-flow inversion, point-matching
mask propagation, and three-branch AdaIN-guided localized stylization over five
diffusion backbones (SD-1.5, SD-2.1, AnimateDiff-v2, SD-3.0, SD-3.5).

Design principles (see ARCHITECTURE.md):
  * All denoising loops are jit-compiled ``lax.scan``s with on-device latent
    trajectories (the reference re-reads per-step ``.pt`` files from disk).
  * The reference's runtime attention monkey-patching becomes an explicit
    ``StyleCtx`` pytree threaded through the model as a function argument.
  * fp32 scheduler math, bf16 model compute, NHWC layouts, static shapes.
  * Frames shard across a ``jax.sharding.Mesh``; sparse-causal cross-frame
    attention needs only a frame-0 broadcast plus a +/-1 halo exchange.
"""

__version__ = "0.1.0"
