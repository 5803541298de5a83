"""SD-1.5 / SD-2.1 video pipeline (rebuild of
SpatioTemporalStableDiffusionPipeline,
backbones/video_diffusion_sd/pipelines/stable_diffusion.py:45-876).

The pipeline owns parameters and exposes jitted stage functions; the denoise
loops live in univst_tpu/methods as single-compile scans. Weight sources:
  * a diffusers-layout checkpoint directory (unet/, vae/, text_encoder/,
    tokenizer/) converted via univst_tpu/models/convert.py, or
  * deterministic random init (no network access in this environment) — same
    architecture, used for throughput benches and smoke tests.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from univst_tpu.core.config import (
    SD_BASE_FRAME_INDICES,
    SD_PNP_FRAME_INDICES,
    SD_STYLE_SHIFT,
    StyleShiftConfig,
    StyleTransferConfig,
)
from univst_tpu.core.scheduler import DDIMConfig, DDIMSchedule, EasyInvConfig
from univst_tpu.methods import inversion as inv
from univst_tpu.methods.style_transfer import style_transfer_ddim_steps
from univst_tpu.models import convert as cv
from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel, Tokenizer
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.unet_sd import UNetPseudo3D, UNetSDConfig
from univst_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latent
from univst_tpu.pipelines.segments import exec_chunk, phase_segments


def _find_weights(dirpath: str) -> Optional[str]:
    for pat in ("*.safetensors", "*.bin", "*.pt"):
        hits = sorted(glob.glob(os.path.join(dirpath, pat)))
        if hits:
            return hits[0]
    return None


@dataclasses.dataclass
class SDVideoPipeline:
    """Also serves AnimateDiff via build_animatediff(): the two epsilon
    backbones share every stage; only the denoiser module, DDIM beta schedule
    (linear vs scaled_linear), shift constants and frame-index sets differ."""

    unet: object  # UNetPseudo3D | UNetAnimateDiff (same call signature)
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    text_encoder: CLIPTextModel
    text_params: dict
    tokenizer: Tokenizer
    schedule: DDIMSchedule
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16
    style_shift_cfg: StyleShiftConfig = SD_STYLE_SHIFT
    base_frame_indices: tuple = SD_BASE_FRAME_INDICES
    pnp_frame_indices: tuple = SD_PNP_FRAME_INDICES
    # Run the style branch as a single frame with its PnP K/V precomputed for
    # all steps in one batched pre-pass (exact: style-trajectory frames are
    # identical — the style image is repeated, ddim_inversion.py:51, and
    # inversion is frame-symmetric). False for AnimateDiff, whose motion
    # modules add per-frame positional encodings that break frame identity.
    style_singleton: bool = True
    # optical-flow function for the pixel smoother: None -> built-in
    # Lucas-Kanade pyramid; set to make_raft_flow(params) for RAFT (the
    # reference smoother's flow, src/cal_optica_flow.py:53-54)
    flow_fn: Optional[object] = None
    # Non-singleton (AnimateDiff) phase-1 alternative: batch the style
    # branch's capture forwards for this many steps into ONE [chunk*F]-row
    # call before the 2-branch scan (motion-module PEs vary per frame, not
    # per step, so extra steps batch as extra videos — exact). None = the
    # default per-step capture inside the scan (_stylize_chunk_capture).
    # HBM bounds the chunk: the captured PnP K/V is ~440 MB/step at 512px/16f.
    style_prepass_chunk: Optional[int] = None
    # device mesh for multi-chip serving (set via with_mesh): the frame axis
    # shards over the 'data' axis, params replicate, and XLA's SPMD
    # partitioner inserts the collectives (frame-0 broadcast + halo permutes
    # for sparse-causal KV; psums for the cross-frame AdaIN/GroupNorm stats —
    # asserted by tests/test_comm_pattern.py). The reference has no
    # parallelism at all (SURVEY.md §2 preamble).
    mesh: Optional[object] = None

    # -- construction --------------------------------------------------------

    @classmethod
    def build(
        cls,
        pretrained_model_path: Optional[str] = None,
        variant: str = "sd15",
        num_frames: int = 16,
        height: int = 512,
        width: int = 512,
        dtype=jnp.bfloat16,
        capture_up_block: Optional[int] = None,
        seed: int = 0,
        unet_cfg: Optional[UNetSDConfig] = None,
        vae_cfg: Optional[VAEConfig] = None,
        clip_cfg: Optional[CLIPTextConfig] = None,
    ) -> "SDVideoPipeline":
        """Build models; convert weights when a checkpoint dir is given.

        The reference pairs the SD UNet with the SVD temporal-decoder VAE
        (run_content_inversion_sd.py:41-43); we default the same way.
        """
        if unet_cfg is None:
            mk = {"sd15": UNetSDConfig.sd15, "sd21": UNetSDConfig.sd21,
                  "tiny": UNetSDConfig.tiny}[variant]
            # temporal layers stay at their identity init in this
            # training-free framework (2D checkpoints carry no temporal
            # weights; load_2d_state_dict skips them) — elide them
            unet_cfg = mk(capture_up_block=capture_up_block, temporal_identity=True)
        elif capture_up_block is not None:
            unet_cfg = dataclasses.replace(unet_cfg, capture_up_block=capture_up_block)
        if vae_cfg is None:
            vae_cfg = (
                VAEConfig.svd() if variant in ("sd15", "sd21") else VAEConfig.tiny(
                    temporal_decoder=True
                )
            )
        if clip_cfg is None:
            mk = {"sd15": CLIPTextConfig.sd15, "sd21": CLIPTextConfig.sd21,
                  "tiny": CLIPTextConfig.tiny}[variant]
            clip_cfg = mk()

        unet = UNetPseudo3D(unet_cfg, dtype=dtype)
        vae = AutoencoderKL(vae_cfg, dtype=dtype)
        text = CLIPTextModel(clip_cfg, dtype=dtype)

        h8, w8 = height // 8, width // 8
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        vctx = VideoCtx(num_frames=num_frames, frame_indices=SD_BASE_FRAME_INDICES)
        with jax.default_device(jax.devices()[0]):
            unet_params = jax.jit(unet.init, static_argnums=(4,))(
                k1,
                jnp.zeros((num_frames, h8, w8, unet_cfg.in_channels), dtype),
                jnp.asarray(0),
                jnp.zeros((1, 77, unet_cfg.cross_attention_dim), dtype),
                vctx,
            )["params"]
            # init with the real frame count so temporal decoder params exist
            vae_params = jax.jit(vae.init, static_argnums=(2,))(
                k2, jnp.zeros((num_frames, 64, 64, 3), dtype), num_frames
            )["params"]
            text_params = jax.jit(text.init)(k3, jnp.zeros((1, 77), jnp.int32))["params"]

        tok_dir = None
        if pretrained_model_path and os.path.isdir(
            os.path.join(pretrained_model_path, "tokenizer")
        ):
            tok_dir = os.path.join(pretrained_model_path, "tokenizer")
        tokenizer = Tokenizer(tok_dir)

        if pretrained_model_path:
            uw = _find_weights(os.path.join(pretrained_model_path, "unet"))
            if uw:
                unet_params = cv.merge_into_params(
                    unet_params, cv.convert_sd_unet(cv.load_torch_state_dict(uw), unet_cfg)
                )
            vw = _find_weights(os.path.join(pretrained_model_path, "vae"))
            if vw:
                vae_params = cv.merge_into_params(
                    vae_params, cv.convert_vae(cv.load_torch_state_dict(vw), vae_cfg)
                )
            tw = _find_weights(os.path.join(pretrained_model_path, "text_encoder"))
            if tw:
                text_params = cv.merge_into_params(
                    text_params, cv.convert_clip_text(cv.load_torch_state_dict(tw), clip_cfg)
                )

        return cls(
            unet=unet,
            unet_params=unet_params,
            vae=vae,
            vae_params=vae_params,
            text_encoder=text,
            text_params=text_params,
            tokenizer=tokenizer,
            schedule=DDIMSchedule(DDIMConfig()),
            num_frames=num_frames,
            dtype=dtype,
        )

    # -- multi-chip -----------------------------------------------------------

    def with_mesh(self, mesh) -> "SDVideoPipeline":
        """Return a pipeline running frame-parallel over ``mesh``.

        Params replicate across the mesh; every workflow entry point then
        shards its frame-axis inputs over 'data' and jit-compiles SPMD
        programs whose collectives XLA derives from the shardings (the
        scaling-book recipe). Serves both SD and AnimateDiff (the motion
        modules' temporal attention over the sharded frame axis becomes
        in-graph collectives)."""
        if mesh is None:
            return self
        from univst_tpu.distributed.mesh import replicate

        return dataclasses.replace(
            self,
            mesh=mesh,
            unet_params=replicate(self.unet_params, mesh),
            vae_params=replicate(self.vae_params, mesh),
            text_params=replicate(self.text_params, mesh),
        )

    def _shard(self, x, axis: int = 0):
        from univst_tpu.distributed.mesh import shard_input

        return shard_input(self.mesh, x, axis)

    def _replicated(self, x):
        from univst_tpu.distributed.mesh import replicate_input

        return replicate_input(self.mesh, x)

    # -- stages ---------------------------------------------------------------
    # Parameters always flow through jit as ARGUMENTS (never closed over):
    # closure capture bakes the 1.7GB of weights into the HLO as constants.

    def encode_text(self, prompt: str):
        ids = jnp.asarray(self.tokenizer(prompt))
        return _encode_text(self, self.text_params, ids)

    def encode_frames(self, frames, key):
        """[F, H, W, 3] in [-1,1] -> sampled latents [F, h, w, 4] * scaling."""
        return _encode_frames(self, self.vae_params, self._shard(frames), key)

    def decode_latents(self, latents):
        """latents [F, h, w, 4] -> frames [F, H, W, 3] in [0, 1] (reference
        decode_latents, stable_diffusion.py:369-394)."""
        return _decode_latents(self, self.vae_params, self._shard(latents))

    def decode_latents_uint8(self, latents):
        """Same decode, quantized to uint8 ON DEVICE: the consumer is PNG/mp4
        writing (uint8 anyway), and shipping fp32 pixels through the remote-TPU
        tunnel costs ~4x the bytes (~1 s for 16 frames @512)."""
        return _decode_latents_u8(self, self.vae_params, self._shard(latents))

    def decode_latents_uint8_chunks(self, latents, chunk: int):
        """Chunked temporal-VAE decode (the reference's ``decode_chunk_size``
        knob, stable_diffusion.py:369-385: each chunk passes its own frame
        count to the temporal decoder). Returns one device array per chunk —
        dispatched async, so the host can fetch chunk i while chunk i+1
        decodes (overlaps the slow tunnel transfer with compute)."""
        n = latents.shape[0]
        if chunk >= n:
            return [_decode_latents_u8(self, self.vae_params, latents)]
        assert n % chunk == 0, (n, chunk)
        return [
            _decode_slice_u8(self, self.vae_params, latents, s, chunk)
            for s in range(0, n, chunk)
        ]

    # -- denoiser closures ----------------------------------------------------

    def _denoise_fn(self, unet_params, context, frame_indices,
                    style_cfg: Optional[StyleShiftConfig], pnp_plain: bool = False):
        """``pnp_plain=True`` builds the stylized-only denoiser for steps past
        the shift window: the 8 patched layers keep their PnP index set (the
        reference's patched forward always uses it — the window only gates the
        AdaIN shift, pnp_utils.py:25,47) but no shift is applied and the batch
        is a single branch."""
        if style_cfg is None and not pnp_plain:
            # inversion / reconstruction: unpatched model, default indices
            vctx = VideoCtx(num_frames=self.num_frames,
                            frame_indices=frame_indices, mesh=self.mesh)
        else:
            # stylization: only the 8 patched decoder layers use the PnP set;
            # everything else keeps the model default (reference patches just
            # up-blocks {1,2,3}, pnp_utils.py:104-111)
            vctx = VideoCtx(
                num_frames=self.num_frames,
                frame_indices=self.base_frame_indices,
                pnp_frame_indices=frame_indices,
                mesh=self.mesh,
            )

        def denoise(latents, t, step_idx, style_kv=None):
            if style_cfg is not None:
                sctx = StyleCtx(step_idx=step_idx, cfg=style_cfg, style_kv=style_kv)
            elif pnp_plain:
                sctx = StyleCtx(step_idx=jnp.asarray(step_idx))
            else:
                sctx = None
            eps, feat = self.unet.apply(
                {"params": unet_params},
                latents.astype(self.dtype),
                t,
                context.astype(self.dtype),
                vctx,
                sctx,
            )
            return eps.astype(jnp.float32), feat

        return denoise

    # -- top-level workflows (jitted with params as args) ----------------------

    # 26-step segments: one ~11 s dispatch per phase at 512px (SD) and ~20 s
    # for the AnimateDiff 3-branch batch — both well under the tunnel
    # watchdog, and the phase boundary lands exactly on the SD shift window.
    exec_chunk_default: int = 26

    def _exec_chunk(self, num_steps: int) -> int:
        """See pipelines/segments.py (TPU tunnel watchdog)."""
        return exec_chunk(num_steps, self.exec_chunk_default)

    def invert(self, latents, context, num_steps: int = 50, is_opt: bool = True,
               capture_timestep: Optional[int] = None):
        """Content/style inversion -> (trajectory [N+1,...], captured feature).
        (reference ddim_inversion, inversion_tools/ddim_inversion.py:71-84)"""
        import numpy as np

        chunk = self._exec_chunk(num_steps)
        # host-side schedule: per-chunk slices are free numpy ops that ship
        # with the jit call (an eager device slice is a remote dispatch)
        ts = self.schedule.timesteps(num_steps)[::-1].copy()
        steps = np.arange(num_steps)
        latents = self._shard(latents).astype(jnp.float32)
        context = self._replicated(context)
        captured = None
        if capture_timestep is not None and self.unet.cfg.capture_up_block is not None:
            denoise = self._denoise_fn(
                self.unet_params, context, self.base_frame_indices, None
            )
            feat = jax.eval_shape(lambda l: denoise(l, ts[0], 0)[1], latents)
            captured = jnp.zeros(feat.shape, feat.dtype)
        carry = (latents, latents, captured)
        chunks = []
        for s0 in range(0, num_steps, chunk):
            carry, traj = _invert_segment(
                self, self.unet_params, carry, steps[s0 : s0 + chunk],
                ts[s0 : s0 + chunk], context, num_steps, is_opt, capture_timestep,
            )
            chunks.append(traj)
        trajectory = jnp.concatenate([latents[None]] + chunks, axis=0)
        return trajectory, carry[2]

    def reconstruct_latents(self, latents_T, context, num_steps: int = 50,
                            guidance_scale: float = 1.0, uncond_context=None):
        """xT -> x0 reconstruction with classifier-free guidance.

        The reference ``reconstruction()`` always runs the uncond/cond double
        batch (stable_diffusion.py:560-614) but its drivers pass
        ``guidance_scale=1.0`` (ddim_inversion.py:40,63), where CFG is
        mathematically the identity — so the doubled batch is skipped at
        scale 1 as a pure optimization. ``guidance_scale > 1`` runs the
        faithful [uncond | cond] batch; ``uncond_context`` defaults to the
        null-prompt embedding."""
        import numpy as np

        chunk = self._exec_chunk(num_steps)
        ts = self.schedule.timesteps(num_steps).copy()
        steps = np.arange(num_steps)
        latent = self._shard(latents_T).astype(jnp.float32)
        context = self._replicated(context)
        if guidance_scale > 1.0:
            uc = uncond_context if uncond_context is not None else self.encode_text("")
            context2 = jnp.concatenate([uc, context], axis=0)
            for s0 in range(0, num_steps, chunk):
                latent = _reconstruct_segment_cfg(
                    self, self.unet_params, latent, steps[s0 : s0 + chunk],
                    ts[s0 : s0 + chunk], context2, num_steps, float(guidance_scale),
                )
            return latent
        for s0 in range(0, num_steps, chunk):
            latent = _reconstruct_segment(
                self, self.unet_params, latent, steps[s0 : s0 + chunk],
                ts[s0 : s0 + chunk], context, num_steps,
            )
        return latent

    def stylize_latents(
        self,
        content_traj_rev,
        style_traj_rev,
        init_latents,
        context3,
        mask=None,
        cfg: StyleTransferConfig = StyleTransferConfig(),
        style_cfg: Optional[StyleShiftConfig] = None,
    ):
        """3-branch stylization (reference video_style_transfer,
        stable_diffusion.py:630-766).

        The loop executes in host-driven segments (UNIVST_EXEC_CHUNK steps,
        default 10): the remote-TPU tunnel enforces a ~2 minute per-execution
        watchdog and the full 50-step 3-branch scan exceeds it. All segments
        share one compiled graph (step indices are data, shapes equal)."""
        scfg = style_cfg if style_cfg is not None else self.style_shift_cfg
        n = cfg.num_steps
        # host-side schedule; ships as a jit ARGUMENT (no eager transfer op)
        ts_np = self.schedule.timesteps(n).copy()
        smooth_lo, smooth_hi = cfg.smoother_steps

        # frame-parallel inputs: trajectories shard on their frame axis (1),
        # working latents/mask on axis 0, the text context replicates; XLA
        # propagates the shardings through every segment graph below
        content_traj_rev = self._shard(content_traj_rev, axis=1)
        style_traj_rev = self._shard(style_traj_rev, axis=1)
        init_latents = self._shard(init_latents)
        mask = self._shard(mask)
        context3 = self._replicated(context3)

        # Past the shift window the content/style branches are dead compute
        # (StyleShiftConfig.window_end) — those steps run the stylized-only
        # batch. The smoother steps must stay inside phase 1 (they take the
        # full 3-branch step); the default (20, 25) window always is.
        window_end = scfg.window_end()
        if cfg.smoother is not None:
            window_end = max(window_end, smooth_hi)
        phase1, phase2 = phase_segments(n, window_end, self.exec_chunk_default)
        k1 = phase2[0][0] if phase2 else n

        # Style-singleton fast path: one batched pre-pass computes the style
        # branch's PnP K/V for the multi-branch steps; the scan then runs the
        # 2-branch [content | stylized] batch. Exact — see style_singleton.
        if self.style_singleton and cfg.smoother is None:
            # ZERO eager device ops on this path: every slice/cast/index runs
            # inside the jitted graphs (an eager op is a remote dispatch
            # through the TPU tunnel, ~30-50 ms each), and host inputs (the
            # timestep schedule, python step offsets) ride along as call
            # arguments.
            latents = init_latents
            style_kv_all = _style_prepass(
                self, self.unet_params, style_traj_rev, ts_np[:k1], context3, k1
            )
            for s0, c in phase1:
                latents = _stylize_chunk_singleton(
                    self, self.unet_params, content_traj_rev, style_traj_rev,
                    style_kv_all, latents, ts_np[:k1], s0, context3, mask,
                    cfg, scfg, c, k1,
                )
            for s0, c in phase2:
                latents = _stylize_chunk_solo(
                    self, self.unet_params, content_traj_rev,
                    style_traj_rev[:, :1], latents, ts_np, s0,
                    context3, mask, cfg, c, n,
                )
            return latents

        # Non-singleton backbones (AnimateDiff: motion-module PEs make style
        # frames distinct). Default: capture-and-inject — per step, a style-
        # only forward captures the PnP K/V, then the 2-branch
        # [content | stylized] batch consumes it. Exact vs the reference's
        # 3-branch batch, and branch-aligned under frame-parallel meshes
        # (see _stylize_chunk_capture). The pixel smoother keeps the legacy
        # in-batch 3-branch steps.
        import numpy as np

        latents = init_latents.astype(jnp.float32)
        steps_np = np.arange(n)
        if style_traj_rev.shape[1] == 1 and self.num_frames > 1:
            style_traj_rev = jnp.broadcast_to(
                style_traj_rev, style_traj_rev.shape[:1] + content_traj_rev.shape[1:]
            )
        for s0, c in phase1:
            seg = range(s0, s0 + c)
            if cfg.smoother is None:
                pc = self.style_prepass_chunk
                if pc:
                    for t0 in range(s0, s0 + c, pc):
                        latents = _stylize_chunk_prepass(
                            self, self.unet_params, content_traj_rev,
                            style_traj_rev, latents, ts_np[:k1], t0, context3,
                            mask, cfg, scfg, min(pc, s0 + c - t0), k1,
                        )
                else:
                    latents = _stylize_chunk_capture(
                        self, self.unet_params, content_traj_rev, style_traj_rev,
                        latents, ts_np[:k1], s0, context3, mask, cfg, scfg,
                        c, k1,
                    )
            elif cfg.smoother == "pixel" and any(
                smooth_lo <= i < smooth_hi for i in seg
            ):
                # run this segment step-by-step; smoother steps get the
                # decode -> flow-warp-average -> re-encode treatment
                # (reference stable_diffusion.py:716-758, shipped disabled)
                for i in seg:
                    if smooth_lo <= i < smooth_hi:
                        latents = _stylize_smooth_step(
                            self, self.unet_params, self.vae_params,
                            content_traj_rev[i], style_traj_rev[i], latents,
                            steps_np[i], ts_np[i], context3, mask, cfg, scfg,
                        )
                    else:
                        latents = _stylize_chunk(
                            self, self.unet_params,
                            content_traj_rev[i : i + 1], style_traj_rev[i : i + 1],
                            latents, steps_np[i : i + 1], ts_np[i : i + 1],
                            context3, mask, cfg, scfg,
                        )
            else:
                latents = _stylize_chunk(
                    self, self.unet_params,
                    content_traj_rev[s0 : s0 + c], style_traj_rev[s0 : s0 + c],
                    latents, steps_np[s0 : s0 + c], ts_np[s0 : s0 + c],
                    context3, mask, cfg, scfg,
                )
        # full per-frame style latents: AnimateDiff style trajectories are
        # NOT frame-identical (motion-module PEs), and the AdaIN re-anchor
        # stats span frames (latent_adain dims [0,3,4])
        for s0, c in phase2:
            latents = _stylize_chunk_solo(
                self, self.unet_params, content_traj_rev, style_traj_rev,
                latents, ts_np, s0, context3, mask, cfg, c, n,
            )
        return latents

    def __hash__(self):  # allow use as a static jit argument
        return id(self)

    def __eq__(self, other):
        return self is other


@partial(jax.jit, static_argnames=("pipe",))
def _encode_text(pipe, text_params, ids):
    hidden, _ = pipe.text_encoder.apply({"params": text_params}, ids)
    return hidden  # [1, 77, D]


@partial(jax.jit, static_argnames=("pipe",))
def _encode_frames(pipe, vae_params, frames, key):
    mean, logvar = pipe.vae.apply(
        {"params": vae_params}, frames.astype(pipe.dtype), method=AutoencoderKL.encode
    )
    z = sample_latent(mean.astype(jnp.float32), logvar.astype(jnp.float32), key)
    return z * pipe.vae.cfg.scaling_factor


@partial(jax.jit, static_argnames=("pipe",))
def _decode_latents(pipe, vae_params, latents):
    z = (latents / pipe.vae.cfg.scaling_factor).astype(pipe.dtype)
    px = pipe.vae.apply(
        {"params": vae_params}, z, pipe.num_frames, method=AutoencoderKL.decode
    )
    return jnp.clip(px.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


@partial(jax.jit, static_argnames=("pipe",))
def _decode_latents_u8(pipe, vae_params, latents):
    px = _decode_latents(pipe, vae_params, latents)
    return jnp.round(px * 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("pipe", "count"))
def _decode_slice_u8(pipe, vae_params, latents, start, count):
    """One decode chunk: frames [start, start+count) with the temporal
    decoder seeing ``count`` frames (reference decode_latents chunking,
    stable_diffusion.py:378-385)."""
    z = jax.lax.dynamic_slice_in_dim(latents, start, count, axis=0)
    z = (z / pipe.vae.cfg.scaling_factor).astype(pipe.dtype)
    px = pipe.vae.apply(
        {"params": vae_params}, z, count, method=AutoencoderKL.decode
    )
    px = jnp.clip(px.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    return jnp.round(px * 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("pipe", "num_steps", "is_opt", "capture_timestep"))
def _invert_segment(pipe, unet_params, carry, steps, ts, context, num_steps,
                    is_opt, capture_timestep):
    denoise = pipe._denoise_fn(unet_params, context, pipe.base_frame_indices, None)
    return inv.ddim_invert_segment(
        denoise, carry, steps, ts, pipe.schedule, num_steps,
        easyinv=EasyInvConfig() if is_opt else None,
        capture_timestep=capture_timestep,
    )


@partial(jax.jit, static_argnames=("pipe", "num_steps"))
def _reconstruct_segment(pipe, unet_params, latent, steps, ts, context, num_steps):
    denoise = pipe._denoise_fn(unet_params, context, pipe.base_frame_indices, None)
    return inv.ddim_sample_segment(denoise, latent, steps, ts, pipe.schedule, num_steps)


@partial(jax.jit, static_argnames=("pipe", "num_steps", "guidance_scale"))
def _reconstruct_segment_cfg(pipe, unet_params, latent, steps, ts, context2,
                             num_steps, guidance_scale):
    """Classifier-free-guidance reconstruction segment: the [uncond | cond]
    double batch and eps combination of the reference reconstruction loop
    (stable_diffusion.py:588-614)."""
    denoise = pipe._denoise_fn(unet_params, context2, pipe.base_frame_indices, None)

    def denoise_cfg(lat, t, i):
        f = lat.shape[0]
        eps2, _ = denoise(jnp.concatenate([lat, lat], axis=0), t, i)
        eps_u, eps_c = eps2[:f], eps2[f:]
        return eps_u + guidance_scale * (eps_c - eps_u), None

    return inv.ddim_sample_segment(denoise_cfg, latent, steps, ts, pipe.schedule,
                                   num_steps)


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg"))
def _stylize_smooth_step(pipe, unet_params, vae_params, cnt_t, sty_t, latents,
                         i, t, context3, mask, cfg, style_cfg):
    """One stylization step with sliding-window pixel smoothing
    (reference stable_diffusion.py:713-758): predict eps, estimate x0, decode,
    flow-warp-average a +/-r window per frame, keep the masked object region,
    re-encode (posterior mean), convert back to eps via return_to_timestep,
    then the ordinary DDIM step."""
    from univst_tpu.core.adain import latent_adain
    from univst_tpu.methods.flow import lucas_kanade_flow, sliding_window_smooth
    from univst_tpu.methods.style_transfer import _resize_mask

    n = cfg.num_steps
    f, h, w, c = latents.shape
    m = None if mask is None else _resize_mask(mask, h, w).astype(latents.dtype)
    fi = i.astype(jnp.float32)
    cnt_t = cnt_t.astype(latents.dtype)
    sty_t = sty_t.astype(latents.dtype)
    if m is not None:
        blended = (1.0 - m) * latents + m * cnt_t
        latents = jnp.where(fi <= cfg.blend_hi * n, blended, latents)
    anchored = latent_adain(latents, sty_t)
    if m is not None:
        anchored = (1.0 - m) * anchored + m * cnt_t
    gate = jnp.logical_and(fi > cfg.adain_lo * n, fi <= cfg.adain_hi * n)
    latents = jnp.where(gate, anchored.astype(latents.dtype), latents)

    denoise = pipe._denoise_fn(unet_params, context3, pipe.pnp_frame_indices, style_cfg)
    eps3, _ = denoise(jnp.concatenate([cnt_t, sty_t, latents], axis=0), t, i)
    eps = eps3[2 * f :]

    x0 = pipe.schedule.pred_original(eps, t, latents)
    px = pipe.vae.apply(
        {"params": vae_params}, (x0 / pipe.vae.cfg.scaling_factor).astype(pipe.dtype),
        pipe.num_frames, method=AutoencoderKL.decode,
    )
    px = jnp.clip(px.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    px = sliding_window_smooth(
        px, radius=cfg.smoother_radius,
        flow_fn=pipe.flow_fn if pipe.flow_fn is not None else lucas_kanade_flow,
        mask=None if mask is None else mask.astype(jnp.float32),
    )
    mean, _ = pipe.vae.apply(
        {"params": vae_params}, (px * 2.0 - 1.0).astype(pipe.dtype),
        method=AutoencoderKL.encode,
    )
    x0_s = mean.astype(jnp.float32) * pipe.vae.cfg.scaling_factor
    eps = pipe.schedule.return_to_timestep(t, latents, x0_s)
    return pipe.schedule.step(eps, t, latents, n)


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg"))
def _stylize_chunk(pipe, unet_params, content_chunk, style_chunk, latents,
                   steps, ts, context3, mask, cfg, style_cfg):
    denoise = pipe._denoise_fn(unet_params, context3, pipe.pnp_frame_indices, style_cfg)

    def denoise3(x3, t, i):
        eps, _ = denoise(x3, t, i)
        return eps

    return style_transfer_ddim_steps(
        denoise3, content_chunk, style_chunk, latents.astype(jnp.float32),
        steps, ts, pipe.schedule, cfg, mask=mask,
    )


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg", "chunk", "n"))
def _stylize_chunk_capture(pipe, unet_params, content_full, style_full,
                           latents, ts_full, s0, context3, mask, cfg,
                           style_cfg, chunk, n):
    """Capture-and-inject decomposition of the legacy 3-branch segment: per
    step, run the style branch alone (F rows, capturing its PnP K/V), then the
    2-branch [content | stylized] batch with that K/V injected. Exact — the
    three branches only couple through the attention shift, which reads the
    style branch's raw projected K/V (apply_style_shift; reference
    pnp_utils.py:47-57) — and unlike the singleton pre-pass it does NOT
    require identical style frames, so it serves AnimateDiff (whose motion
    modules give every style frame a distinct positional encoding).

    Under a frame-parallel mesh this is also the comm-correct layout: a [3F]
    row axis cannot be branch-aligned on 2^k shards (48 rows / 8 shards = 6,
    misaligned with branch boundaries at 16/32), which makes GSPMD all-gather
    the full activation at every branch-chunking reshape — measured 11 GB per
    3-branch step at 512px/16f; the [F] + [2F] calls shard cleanly.

    ``content_full``/``style_full``/``ts_full`` arrive UNSLICED with ``s0`` a
    host int: all per-segment slicing runs in-graph (an eager slice of a
    device array is a ~30-50 ms remote dispatch through the TPU tunnel —
    same pattern as _stylize_chunk_solo)."""
    from univst_tpu.models.unet_sd import extract_pnp_kv

    context2 = jnp.concatenate([context3[:1], context3[2:3]], axis=0)
    denoise = pipe._denoise_fn(unet_params, context2, pipe.pnp_frame_indices, style_cfg)
    context_sty = context3[1:2]
    vctx = VideoCtx(
        num_frames=pipe.num_frames,
        frame_indices=pipe.base_frame_indices,
        pnp_frame_indices=pipe.pnp_frame_indices,
        mesh=pipe.mesh,
    )

    def denoise2(x2, t, i, sty_lat):
        sctx = StyleCtx(step_idx=i, cfg=style_cfg, capture=True)
        _, state = pipe.unet.apply(
            {"params": unet_params},
            sty_lat.astype(pipe.dtype),
            t,
            context_sty.astype(pipe.dtype),
            vctx,
            sctx,
            mutable=["pnp_kv"],
        )
        kv = extract_pnp_kv(state["pnp_kv"])
        eps, _ = denoise(x2, t, i, style_kv=kv)
        return eps

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a[:n], s0, chunk, axis=0)

    steps = sl(jax.lax.iota(jnp.int32, n))
    return style_transfer_ddim_steps(
        denoise2, sl(content_full), sl(style_full),
        latents.astype(jnp.float32), steps, sl(ts_full),
        pipe.schedule, cfg, mask=mask, capture=True,
    )


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg", "chunk", "n"))
def _stylize_chunk_prepass(pipe, unet_params, content_full, style_full,
                           latents, ts_full, s0, context3, mask, cfg,
                           style_cfg, chunk, n):
    """Batched-capture variant of :func:`_stylize_chunk_capture`: the style
    branch's PnP K/V for all ``chunk`` steps of this segment are computed in
    ONE [chunk*F]-row forward before the scan, then the 2-branch
    [content | stylized] scan consumes per-step K/V slices.

    Exact vs the per-step capture: AnimateDiff's motion-module positional
    encodings vary per FRAME, not per step, and every per-row op (2D convs,
    per-frame GroupNorm, spatial attention) is batch-local while the
    per-video ops (temporal attention) see ``num_frames``-row groups — so
    steps batch as extra videos. The timestep embedding is per-video
    (UNetAnimateDiff broadcasts timestep to batch//num_frames rows).

    FLOPs are identical to the per-step form; the candidate win is MXU/batch
    efficiency of one [chunk*F]-row forward vs ``chunk`` [F]-row forwards.
    HBM bounds ``chunk``: the captured K/V of the 8 PnP layers is ~440 MB per
    step at 512px/16f (see SDVideoPipeline.style_prepass_chunk)."""
    from univst_tpu.models.unet_sd import extract_pnp_kv

    f = pipe.num_frames

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a[:n], s0, chunk, axis=0)

    style_seg = sl(style_full)          # [chunk, F, h, w, C]
    ts_seg = sl(jnp.asarray(ts_full))   # [chunk]
    vctx = VideoCtx(
        num_frames=f,
        frame_indices=pipe.base_frame_indices,
        pnp_frame_indices=pipe.pnp_frame_indices,
        mesh=pipe.mesh,
    )
    sctx_cap = StyleCtx(step_idx=jnp.zeros((), jnp.int32), cfg=style_cfg,
                        capture=True)
    rows = style_seg.reshape((chunk * f,) + style_seg.shape[2:])
    ctx_sty = jnp.broadcast_to(
        context3[1:2], (chunk * f,) + context3.shape[1:]
    )
    _, state = pipe.unet.apply(
        {"params": unet_params}, rows.astype(pipe.dtype), ts_seg,
        ctx_sty.astype(pipe.dtype), vctx, sctx_cap, mutable=["pnp_kv"],
    )
    kv_all = jax.tree_util.tree_map(
        lambda a: a.reshape((chunk, f) + a.shape[1:]),
        extract_pnp_kv(state["pnp_kv"]),
    )

    context2 = jnp.concatenate([context3[:1], context3[2:3]], axis=0)
    denoise = pipe._denoise_fn(unet_params, context2, pipe.pnp_frame_indices,
                               style_cfg)

    def denoise2(x2, t, i, kv_t):
        # kv_t leaves are [F, L, D] — the same injected-KV layout the
        # per-step capture produces (extract_pnp_kv on an F-row forward)
        eps, _ = denoise(x2, t, i, style_kv=kv_t)
        return eps

    steps = sl(jax.lax.iota(jnp.int32, n))
    return style_transfer_ddim_steps(
        denoise2, sl(content_full), style_seg, latents.astype(jnp.float32),
        steps, ts_seg, pipe.schedule, cfg, mask=mask, style_kv=kv_all,
    )


@partial(jax.jit, static_argnames=("pipe", "cfg", "chunk", "n"))
def _stylize_chunk_solo(pipe, unet_params, content_full, style_full, latents,
                        ts_full, s0, context3, mask, cfg, chunk, n):
    """Stylized-only segment for steps past the shift window: the content and
    style branches are dead compute there (the shift gate is False, so the
    patched attention falls back to the stylized branch's own q/k/v and the
    reference discards the other two epsilon chunks, stable_diffusion.py:712).
    The batch drops from 3F/2F to F; the trajectory latents are still consumed
    by the mask blend / AdaIN re-anchor, which need no forward pass.

    ``content_full``/``style_full`` arrive UNSLICED ([>=n, F|1, h, w, C]) with
    ``ts_full`` the full host-side schedule and ``s0`` a host int: all
    slicing/casting runs in-graph (eager ops are remote dispatches)."""
    context1 = context3[2:3]
    denoise = pipe._denoise_fn(
        unet_params, context1, pipe.pnp_frame_indices, None, pnp_plain=True
    )

    def denoise1(x, t, i):
        eps, _ = denoise(x, t, i)
        return eps

    steps_full = jax.lax.iota(jnp.int32, n)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a[:n], s0, chunk, axis=0)

    return style_transfer_ddim_steps(
        denoise1, sl(content_full), sl(style_full), latents.astype(jnp.float32),
        sl(steps_full), sl(jnp.asarray(ts_full)), pipe.schedule, cfg, mask=mask,
        solo=True,
    )


@partial(jax.jit, static_argnames=("pipe", "k1"))
def _style_prepass(pipe, unet_params, style_traj_rev, ts, context3, k1):
    """Precompute the style branch's projected PnP K/V for ALL steps in one
    batched single-frame call (valid because style-trajectory frames are
    identical; see SDVideoPipeline.style_singleton). One batch-k1 call replaces
    k1 full style-branch forwards — a 1/3 FLOP cut on the reference's 3-branch
    step (stable_diffusion.py:704-710).

    Args:
      style_traj_rev: ``[>=k1, 1|F, h, w, C]`` reversed style trajectory
        (frame 0 is taken in-graph — style frames are identical).
      ts: ``[k1]`` per-step timesteps (host array; ships with the call).
      context3: ``[3, 77, Dt]`` — the style branch embedding is row 1.
    Returns: tuple over PNP_SLOT_ORDER of (k, v), each ``[k1, L, D]``.
    """
    from univst_tpu.models.unet_sd import extract_pnp_kv

    style_lats = style_traj_rev[:k1, 0]
    context = context3[1:2]
    vctx = VideoCtx(num_frames=1, frame_indices=())
    sctx = StyleCtx(step_idx=jnp.zeros((), jnp.int32), cfg=pipe.style_shift_cfg,
                    capture=True)
    ctxn = jnp.broadcast_to(context, (k1,) + context.shape[1:])
    _, state = pipe.unet.apply(
        {"params": unet_params},
        style_lats.astype(pipe.dtype),
        jnp.asarray(ts),
        ctxn.astype(pipe.dtype),
        vctx,
        sctx,
        mutable=["pnp_kv"],
    )
    return extract_pnp_kv(state["pnp_kv"])


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg", "chunk", "k1"))
def _stylize_chunk_singleton(pipe, unet_params, content_full, style_full,
                             style_kv_all, latents, ts_k1, s0,
                             context3, mask, cfg, style_cfg, chunk, k1):
    """Phase-1 singleton segment. Unsliced trajectories + host-side schedule
    and step offset arrive as arguments; all slicing runs in-graph."""
    context2 = jnp.concatenate([context3[:1], context3[2:3]], axis=0)
    denoise = pipe._denoise_fn(unet_params, context2, pipe.pnp_frame_indices, style_cfg)

    steps_k1 = jax.lax.iota(jnp.int32, k1)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a[:k1], s0, chunk, axis=0)

    def denoise2(x2, t, i, kv):
        # scan unstacks the leading step axis; injected K/V wants [1, L, D]
        kv = jax.tree_util.tree_map(lambda a: a[None], kv)
        eps, _ = denoise(x2, t, i, style_kv=kv)
        return eps

    return style_transfer_ddim_steps(
        denoise2, sl(content_full), sl(style_full[:, :1]),
        latents.astype(jnp.float32), sl(steps_k1), sl(jnp.asarray(ts_k1)),
        pipe.schedule, cfg, mask=mask,
        style_kv=jax.tree_util.tree_map(sl, style_kv_all),
    )
