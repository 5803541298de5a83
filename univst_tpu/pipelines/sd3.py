"""SD3 / SD3.5 video pipeline (rebuild of CustomStableDiffusion3Pipeline,
backbones/video_diffusion_sd3/pipelines/custom_pipeline.py:17-445, plus the
runner model build, src/sd3/run_content_inversion_sd3.py:42-68).

Text encoding follows diffusers SD3.encode_prompt: CLIP-L and CLIP-bigG
hidden states concatenated on features and zero-padded to the T5 width, then
concatenated with the T5 sequence along tokens; pooled = [pooled_l, pooled_g].
Frames are the batch axis (the SD3 reference batches frames directly,
flow_inversion.py:149-159).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.config import (
    SD3_FRAME_INDICES,
    SD3_STYLE_SHIFT,
    StyleShiftConfig,
    StyleTransferConfig,
)
from univst_tpu.core.scheduler import (
    FlowMatchConfig,
    FlowMatchSchedule,
    calculate_shift,
    generate_eta_values,
    scale_eta_window,
)
from univst_tpu.methods import inversion as inv
from univst_tpu.methods.style_transfer import style_transfer_rf_steps
from univst_tpu.models import convert as cv
from univst_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel, Tokenizer
from univst_tpu.models.layers import StyleCtx, VideoCtx
from univst_tpu.models.mmdit import MMDiT, MMDiTConfig
from univst_tpu.models.t5 import T5Config, T5Encoder, T5TokenizerShim
from univst_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latent
from univst_tpu.pipelines.sd import _find_weights
from univst_tpu.pipelines.segments import exec_chunk, phase_segments


@dataclasses.dataclass
class SD3VideoPipeline:
    mmdit: MMDiT
    mmdit_params: dict
    vae: AutoencoderKL
    vae_params: dict
    clip_l: CLIPTextModel
    clip_l_params: dict
    clip_g: CLIPTextModel
    clip_g_params: dict
    t5: T5Encoder
    t5_params: dict
    tokenizer: Tokenizer
    tokenizer_3: T5TokenizerShim
    schedule: FlowMatchSchedule
    num_frames: int
    dtype: jnp.dtype = jnp.bfloat16
    max_sequence_length: int = 256
    # diffusers clip_skip semantics: CLIP context comes from
    # hidden_states[-(clip_skip + 2)] — the PENULTIMATE layer by default, not
    # the final-normed output (SD3.encode_prompt behavior the reference
    # inherits via custom_pipeline.py:17). None == 0.
    clip_skip: Optional[int] = None
    # run the style branch as a single frame per step (identical style frames
    # — a repeated style image; MMDiT has no per-frame positional state, so
    # this is exact like the SD path). The style K/V is captured by an
    # in-scan single-frame forward (NOT a hoisted all-steps pre-pass: at
    # 1024px the per-step K/V of all 24 blocks is ~600 MB, x50 steps won't
    # fit HBM).
    style_singleton: bool = True
    # device mesh (set via with_mesh): frames shard over 'data'; MMDiT params
    # optionally shard Megatron-style over 'tensor' (distributed/tp.py).
    mesh: Optional[object] = None

    @classmethod
    def build(
        cls,
        pretrained_model_path: Optional[str] = None,
        variant: str = "sd3",  # sd3 | sd35 | tiny
        num_frames: int = 16,
        height: int = 1024,
        width: int = 1024,
        dtype=jnp.bfloat16,
        capture_block: Optional[int] = None,
        seed: int = 0,
    ) -> "SD3VideoPipeline":
        if variant == "sd3":
            mcfg = MMDiTConfig.sd3_medium(capture_block=capture_block)
            vcfg = VAEConfig.sd3()
            lcfg, gcfg = CLIPTextConfig.sd3_clip_l(), CLIPTextConfig.sd3_clip_g()
            tcfg = T5Config.xxl()
            max_seq = 256
        elif variant == "sd35":
            mcfg = MMDiTConfig.sd35_large(capture_block=capture_block)
            vcfg = VAEConfig.sd3()
            lcfg, gcfg = CLIPTextConfig.sd3_clip_l(), CLIPTextConfig.sd3_clip_g()
            tcfg = T5Config.xxl()
            max_seq = 256
        elif variant == "sd35m":
            # the reference CLI default checkpoint (SD3.5-medium, dual blocks)
            mcfg = MMDiTConfig.sd35_medium(capture_block=capture_block)
            vcfg = VAEConfig.sd3()
            lcfg, gcfg = CLIPTextConfig.sd3_clip_l(), CLIPTextConfig.sd3_clip_g()
            tcfg = T5Config.xxl()
            max_seq = 256
        else:
            mcfg = MMDiTConfig.tiny(capture_block=capture_block)
            vcfg = VAEConfig.tiny(latent_channels=16, scaling_factor=1.5305,
                                  shift_factor=0.0609)
            lcfg = CLIPTextConfig.tiny(projection_dim=16)
            gcfg = CLIPTextConfig.tiny(projection_dim=mcfg.pooled_projection_dim - 16)
            tcfg = T5Config.tiny(d_model=mcfg.joint_attention_dim)
            max_seq = 16

        if mcfg.capture_block is not None and not (
            0 <= mcfg.capture_block < mcfg.num_layers
        ):
            raise ValueError(
                f"--ft_indices {mcfg.capture_block} is outside this model's "
                f"{mcfg.num_layers} transformer blocks (reference default 20 "
                "assumes the 24-block SD3-medium; pick a block that exists)"
            )

        mmdit = MMDiT(mcfg, dtype=dtype)
        vae = AutoencoderKL(vcfg, dtype=dtype)
        clip_l = CLIPTextModel(lcfg, dtype=dtype)
        clip_g = CLIPTextModel(gcfg, dtype=dtype)
        t5 = T5Encoder(tcfg, dtype=dtype)

        # The reference loads the whole SD3 stack in bfloat16
        # (run_content_inversion_sd3.py:106) — and fp32 residency does not fit
        # a 16 GB chip anyway (T5-XXL alone is 19 GB fp32). Params are cast
        # inside the init jit so no fp32 copy ever lands in HBM. The tiny
        # test variant keeps fp32 for exactness tests.
        param_dtype = dtype if variant != "tiny" else jnp.float32

        def init_cast(module, *a):
            def go(key):
                p = module.init(key, *a)["params"]
                return jax.tree_util.tree_map(
                    lambda x: x.astype(param_dtype), p
                )

            return jax.jit(go)

        hp, wp = height // 8, width // 8
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        vctx = VideoCtx(num_frames=num_frames, frame_indices=SD3_FRAME_INDICES)
        ctx_len = 2 * 77 + max_seq if variant != "tiny" else 2 * 7 + max_seq
        mmdit_params = init_cast(
            mmdit,
            jnp.zeros((num_frames, hp, wp, mcfg.in_channels), dtype),
            jnp.asarray(0.0),
            jnp.zeros((1, ctx_len, mcfg.joint_attention_dim), dtype),
            jnp.zeros((1, mcfg.pooled_projection_dim), dtype),
            vctx,
        )(k1)
        vae_params = init_cast(
            vae, jnp.zeros((num_frames, 64, 64, 3), dtype), num_frames
        )(k2)
        seq = 77 if variant != "tiny" else 7
        clip_l_params = init_cast(clip_l, jnp.zeros((1, seq), jnp.int32))(k3)
        clip_g_params = init_cast(clip_g, jnp.zeros((1, seq), jnp.int32))(k4)
        t5_params = init_cast(t5, jnp.zeros((1, max_seq), jnp.int32))(k5)

        tok_dir = t5_dir = None
        if pretrained_model_path:
            td = os.path.join(pretrained_model_path, "tokenizer")
            tok_dir = td if os.path.isdir(td) else None
            t3 = os.path.join(pretrained_model_path, "tokenizer_3")
            t5_dir = t3 if os.path.isdir(t3) else None
            mw = _find_weights(os.path.join(pretrained_model_path, "transformer"))
            if mw:
                mmdit_params = cv.merge_into_params(
                    mmdit_params,
                    cv.convert_mmdit(cv.load_torch_state_dict(mw), mcfg),
                )
            vw = _find_weights(os.path.join(pretrained_model_path, "vae"))
            if vw:
                vae_params = cv.merge_into_params(
                    vae_params, cv.convert_vae(cv.load_torch_state_dict(vw), vcfg)
                )
            for sub, params_name, ccfg in (
                ("text_encoder", "clip_l_params", lcfg),
                ("text_encoder_2", "clip_g_params", gcfg),
            ):
                w = _find_weights(os.path.join(pretrained_model_path, sub))
                if w:
                    converted = cv.convert_clip_text(cv.load_torch_state_dict(w), ccfg)
                    if params_name == "clip_l_params":
                        clip_l_params = cv.merge_into_params(clip_l_params, converted)
                    else:
                        clip_g_params = cv.merge_into_params(clip_g_params, converted)
            w = _find_weights(os.path.join(pretrained_model_path, "text_encoder_3"))
            if w:
                t5_params = cv.merge_into_params(
                    t5_params, cv.convert_t5(cv.load_torch_state_dict(w), tcfg)
                )

        seq_len = 7 if variant == "tiny" else 77
        return cls(
            mmdit=mmdit, mmdit_params=mmdit_params,
            vae=vae, vae_params=vae_params,
            clip_l=clip_l, clip_l_params=clip_l_params,
            clip_g=clip_g, clip_g_params=clip_g_params,
            t5=t5, t5_params=t5_params,
            tokenizer=Tokenizer(tok_dir, max_len=seq_len),
            tokenizer_3=T5TokenizerShim(t5_dir, max_len=max_seq),
            schedule=FlowMatchSchedule(FlowMatchConfig()),
            num_frames=num_frames,
            dtype=dtype,
            max_sequence_length=max_seq,
        )

    # -- multi-chip -----------------------------------------------------------

    def with_mesh(self, mesh) -> "SD3VideoPipeline":
        """Return a pipeline running dp(xtp) over ``mesh``: the frame axis
        shards over 'data'; when the mesh has a tensor axis > 1 the MMDiT
        attention/MLP kernels shard column/row-parallel (distributed/tp.py —
        SD3.5-large at 8B params wants this; XLA inserts the row-parallel
        psums). VAE/text params replicate."""
        if mesh is None:
            return self
        from univst_tpu.distributed.mesh import replicate
        from univst_tpu.distributed.tp import shard_mmdit_params

        return dataclasses.replace(
            self,
            mesh=mesh,
            mmdit_params=shard_mmdit_params(self.mmdit_params, mesh),
            vae_params=replicate(self.vae_params, mesh),
            clip_l_params=None if self.clip_l_params is None
            else replicate(self.clip_l_params, mesh),
            clip_g_params=None if self.clip_g_params is None
            else replicate(self.clip_g_params, mesh),
            t5_params=None if self.t5_params is None
            else replicate(self.t5_params, mesh),
        )

    def _shard(self, x, axis: int = 0):
        from univst_tpu.distributed.mesh import shard_input

        return shard_input(self.mesh, x, axis)

    def _replicated(self, x):
        from univst_tpu.distributed.mesh import replicate_input

        return replicate_input(self.mesh, x)

    # -- text -----------------------------------------------------------------

    def free_text_encoders(self):
        """Release the text-encoder parameters (T5-XXL alone is ~9.5 GB
        bf16). Prompts are encoded once per run, so serving on a 16 GB chip
        encodes first and frees these before the denoise loop; the reference
        keeps everything resident on its 80 GB GPU. encode_prompt raises
        after this."""
        self.t5_params = None
        self.clip_l_params = None
        self.clip_g_params = None

    def encode_prompt(self, prompt: str):
        """-> (context [1, 2*Lclip..., wait see body], pooled [1, pooled_dim]).

        diffusers SD3.encode_prompt: clip_embeds = cat([clip_l_h, clip_g_h],
        feature axis) zero-padded to the T5 width; context = cat([clip_embeds,
        t5_embeds], token axis); pooled = cat([pooled_l, pooled_g])."""
        ids = jnp.asarray(self.tokenizer(prompt))
        ids3 = jnp.asarray(self.tokenizer_3(prompt))
        return _encode_prompt(
            self, self.clip_l_params, self.clip_g_params, self.t5_params, ids, ids3
        )

    # -- vae -------------------------------------------------------------------

    def encode_frames(self, frames, key):
        return _encode_frames3(self, self.vae_params, self._shard(jnp.asarray(frames)), key)

    def decode_latents(self, latents):
        return _decode_latents3(self, self.vae_params, self._shard(latents))

    # -- denoiser ---------------------------------------------------------------

    def _denoise_fn(self, params, context, pooled, frame_indices,
                    style_cfg: Optional[StyleShiftConfig]):
        vctx = VideoCtx(num_frames=self.num_frames, frame_indices=frame_indices)

        def denoise(latents, t, step_idx):
            sctx = (
                StyleCtx(step_idx=step_idx, cfg=style_cfg)
                if style_cfg is not None else None
            )
            v, feat = self.mmdit.apply(
                {"params": params}, latents.astype(self.dtype), t,
                context.astype(self.dtype), pooled.astype(self.dtype), vctx, sctx,
            )
            return v.astype(jnp.float32), feat

        return denoise

    # SD3 at 1024px runs ~8 s/step on one v5e — segments stay small so each
    # dispatch fits the tunnel watchdog (pipelines/segments.py)
    exec_chunk_default: int = 4

    def _exec_chunk(self, num_steps: int) -> int:
        """See pipelines/segments.py (TPU tunnel watchdog)."""
        return exec_chunk(num_steps, self.exec_chunk_default)

    def _mu(self, height_latent: int, width_latent: int) -> Optional[float]:
        if not self.schedule.cfg.use_dynamic_shifting:
            return None
        seq = (height_latent // self.mmdit.cfg.patch_size) * (
            width_latent // self.mmdit.cfg.patch_size
        )
        return calculate_shift(seq)

    # -- workflows ---------------------------------------------------------------

    def invert(self, img_latents, context, pooled, num_steps: int = 50,
               is_rf_solver: bool = False, capture_step: Optional[int] = None,
               gamma: float = 0.0, noise_key=None):
        """RF-Inversion / RF-Solver inversion -> (trajectory, captured feature)
        (reference flow_inversion.py:122-264)."""
        sigmas = self.schedule.sigmas(num_steps, mu=self._mu(*img_latents.shape[1:3]))
        fwd = jnp.asarray(np.flip(sigmas).copy())
        t_curr_full, t_prev_full = fwd[:-1], fwd[1:]
        n = len(t_curr_full)
        chunk = self._exec_chunk(n)
        steps = jnp.arange(n)
        latents = self._shard(img_latents).astype(jnp.float32)
        context = self._replicated(context)
        pooled = self._replicated(pooled)
        captured = None
        if capture_step is not None and self.mmdit.cfg.capture_block is not None:
            denoise = self._denoise_fn(
                self.mmdit_params, context, pooled, SD3_FRAME_INDICES, None
            )
            feat = jax.eval_shape(lambda l: denoise(l, fwd[0], 0)[1], latents)
            captured = jnp.zeros(feat.shape, feat.dtype)
        target_noise = (
            jax.random.normal(noise_key, latents.shape, latents.dtype)
            if gamma > 0.0 else jnp.zeros_like(latents)
        )
        carry = (latents, captured)
        chunks = []
        for s0 in range(0, n, chunk):
            carry, traj = _invert3_segment(
                self, self.mmdit_params, carry, steps[s0 : s0 + chunk],
                t_curr_full[s0 : s0 + chunk], t_prev_full[s0 : s0 + chunk],
                context, pooled, target_noise, gamma, is_rf_solver, capture_step,
            )
            chunks.append(traj)
        return jnp.concatenate([latents[None]] + chunks, axis=0), carry[1]

    def reconstruct_latents(self, inversed_latents, img_latents, context, pooled,
                            num_steps: int = 50, eta_base: float = 0.85,
                            eta_trend: str = "constant", start_step: int = 25,
                            end_step: int = 39):
        """Controlled-velocity reconstruction (custom_pipeline.py:46-124)."""
        mu = self._mu(*img_latents.shape[1:3])
        sigmas = jnp.asarray(self.schedule.sigmas(num_steps, mu=mu))
        ts = self.schedule.timesteps(num_steps, mu=mu)
        start_step, end_step = scale_eta_window(start_step, end_step, num_steps)
        etas = jnp.asarray(
            generate_eta_values(ts, start_step, end_step, eta_base, eta_trend)
        )
        n = num_steps
        chunk = self._exec_chunk(n)
        steps = jnp.arange(n)
        latent = self._shard(inversed_latents).astype(jnp.float32)
        img_latents = self._shard(img_latents)
        context = self._replicated(context)
        pooled = self._replicated(pooled)
        for s0 in range(0, n, chunk):
            latent = _reconstruct3_segment(
                self, self.mmdit_params, latent, steps[s0 : s0 + chunk],
                sigmas[s0 : s0 + chunk], sigmas[s0 + 1 : s0 + chunk + 1],
                etas[s0 : s0 + chunk], img_latents, context, pooled,
            )
        return latent

    def stylize_latents(
        self,
        content_traj_rev,
        style_traj_rev,
        init_latents,
        img_latents,
        context3,
        pooled3,
        mask=None,
        cfg: StyleTransferConfig = StyleTransferConfig(),
        style_cfg: StyleShiftConfig = SD3_STYLE_SHIFT,
    ):
        """3-branch stylization with controlled velocity
        (custom_pipeline.py:126-371)."""
        n = cfg.num_steps
        mu = self._mu(*init_latents.shape[1:3])
        sigmas = jnp.asarray(self.schedule.sigmas(n, mu=mu))
        ts = self.schedule.timesteps(n, mu=mu)
        e_start, e_end = scale_eta_window(cfg.eta_start_step, cfg.eta_end_step, n)
        etas = jnp.asarray(
            generate_eta_values(ts, e_start, e_end, cfg.eta_base, cfg.eta_trend)
        )
        steps = jnp.arange(n)
        # frame-parallel inputs (no-ops without a mesh)
        content_traj_rev = self._shard(content_traj_rev, axis=1)
        style_traj_rev = self._shard(style_traj_rev, axis=1)
        img_latents = self._shard(img_latents)
        mask = self._shard(mask)
        context3 = self._replicated(context3)
        pooled3 = self._replicated(pooled3)
        latents = self._shard(init_latents).astype(jnp.float32)
        seg_fn = _stylize2_segment if self.style_singleton else _stylize3_segment
        if self.style_singleton:
            style_traj_rev = style_traj_rev[:, :1]
        elif style_traj_rev.shape[1] == 1 and self.num_frames > 1:
            style_traj_rev = jnp.broadcast_to(
                style_traj_rev, style_traj_rev.shape[:1] + content_traj_rev.shape[1:]
            )
        # Past the shift window the content/style forwards are dead compute
        # (StyleShiftConfig.window_end; the reference keeps only the stylized
        # velocity chunk, custom_pipeline.py:317-320) — run stylized-only.
        phase1, phase2 = phase_segments(n, style_cfg.window_end(),
                                        self.exec_chunk_default)
        # per-segment slicing happens INSIDE the jitted graphs (traced start
        # index): eager slices dispatch one remote op per pytree leaf through
        # the TPU tunnel (see pipelines/sd.py)
        img32 = img_latents.astype(jnp.float32)
        for s0, c in phase1:
            latents = seg_fn(
                self, self.mmdit_params, content_traj_rev, style_traj_rev,
                latents, steps, sigmas, etas, jnp.asarray(s0, jnp.int32),
                img32, context3, pooled3, mask, cfg, style_cfg, c,
            )
        for s0, c in phase2:
            latents = _stylize1_segment(
                self, self.mmdit_params, content_traj_rev, style_traj_rev,
                latents, steps, sigmas, etas, jnp.asarray(s0, jnp.int32),
                img32, context3, pooled3, mask, cfg, c,
            )
        return latents

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@partial(jax.jit, static_argnames=("pipe",))
def _encode_prompt(pipe, lp, gp, tp, ids, ids3):
    # diffusers SD3 takes the penultimate CLIP hidden state (clip_skip analog)
    hs_index = -((pipe.clip_skip or 0) + 2)
    hl, pl = pipe.clip_l.apply({"params": lp}, ids, hs_index)
    hg, pg = pipe.clip_g.apply({"params": gp}, ids, hs_index)
    ht = pipe.t5.apply({"params": tp}, ids3)
    clip = jnp.concatenate([hl, hg], axis=-1)
    pad = pipe.mmdit.cfg.joint_attention_dim - clip.shape[-1]
    clip = jnp.pad(clip.astype(jnp.float32), ((0, 0), (0, 0), (0, pad)))
    context = jnp.concatenate([clip, ht.astype(jnp.float32)], axis=1)
    pooled = jnp.concatenate([pl, pg], axis=-1).astype(jnp.float32)
    return context, pooled


@partial(jax.jit, static_argnames=("pipe",))
def _encode_frames3(pipe, vae_params, frames, key):
    mean, logvar = pipe.vae.apply(
        {"params": vae_params}, frames.astype(pipe.dtype), method=AutoencoderKL.encode
    )
    z = sample_latent(mean.astype(jnp.float32), logvar.astype(jnp.float32), key)
    # SD3 latent normalization (flow_inversion.py:29-30)
    return (z - pipe.vae.cfg.shift_factor) * pipe.vae.cfg.scaling_factor


@partial(jax.jit, static_argnames=("pipe",))
def _decode_latents3(pipe, vae_params, latents):
    z = (latents / pipe.vae.cfg.scaling_factor + pipe.vae.cfg.shift_factor).astype(
        pipe.dtype
    )
    px = pipe.vae.apply(
        {"params": vae_params}, z, pipe.num_frames, method=AutoencoderKL.decode
    )
    return jnp.clip(px.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


@partial(jax.jit, static_argnames=("pipe", "gamma", "is_rf_solver", "capture_step"))
def _invert3_segment(pipe, params, carry, steps, t_curr, t_prev, context, pooled,
                     target_noise, gamma, is_rf_solver, capture_step):
    denoise = pipe._denoise_fn(params, context, pooled, SD3_FRAME_INDICES, None)
    scale = pipe.schedule.cfg.num_train_timesteps
    if is_rf_solver:
        return inv.rf_solver_segment(
            denoise, carry, steps, t_curr, t_prev, scale, capture_step
        )
    return inv.rf_invert_segment(
        denoise, carry, steps, t_curr, t_prev, scale, gamma, target_noise, capture_step
    )


@partial(jax.jit, static_argnames=("pipe",))
def _reconstruct3_segment(pipe, params, latent, steps, s_curr, s_next, etas,
                          img_latents, context, pooled):
    denoise = pipe._denoise_fn(params, context, pooled, SD3_FRAME_INDICES, None)
    return inv.rf_sample_segment(
        denoise, latent, steps, s_curr, s_next, etas,
        img_latents.astype(jnp.float32), pipe.schedule.cfg.num_train_timesteps,
    )


def _seg_slices(steps_full, sigmas_full, etas_full, s0, chunk):
    """In-jit per-segment views: steps/sigma-pair/etas for [s0, s0+chunk)."""
    sl = lambda a, o=0: jax.lax.dynamic_slice_in_dim(a, s0 + o, chunk, axis=0)
    return sl(steps_full), sl(sigmas_full), sl(sigmas_full, 1), sl(etas_full)


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg", "chunk"))
def _stylize3_segment(pipe, params, content_full, style_full, latents, steps_full,
                      sigmas_full, etas_full, s0, img_latents, context3, pooled3,
                      mask, cfg, style_cfg, chunk):
    denoise = pipe._denoise_fn(params, context3, pooled3, SD3_FRAME_INDICES, style_cfg)

    def denoise3(x3, t, i):
        v, _ = denoise(x3, t, i)
        return v

    steps, s_curr, s_next, etas = _seg_slices(steps_full, sigmas_full, etas_full,
                                              s0, chunk)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, chunk, axis=0)
    return style_transfer_rf_steps(
        denoise3, sl(content_full), sl(style_full), latents, steps, s_curr,
        s_next, etas, img_latents, pipe.schedule, cfg, mask=mask,
    )


@partial(jax.jit, static_argnames=("pipe", "cfg", "style_cfg", "chunk"))
def _stylize2_segment(pipe, params, content_full, style_full, latents, steps_full,
                      sigmas_full, etas_full, s0, img_latents, context3, pooled3,
                      mask, cfg, style_cfg, chunk):
    """Style-singleton segment: 2-branch [content | stylized] batch; the style
    branch runs per step as ONE frame in capture mode and its per-block K/V
    are injected (see SD3VideoPipeline.style_singleton)."""
    from univst_tpu.models.mmdit import extract_mmdit_style_kv

    ctx2 = context3[jnp.asarray([0, 2])]
    pooled2 = pooled3[jnp.asarray([0, 2])]
    ctx1 = context3[1:2]
    pooled1 = pooled3[1:2]
    vctx = VideoCtx(num_frames=pipe.num_frames, frame_indices=SD3_FRAME_INDICES)
    vctx1 = VideoCtx(num_frames=1, frame_indices=())

    def denoise2(x2, t, i, sty_lat):
        sctx_cap = StyleCtx(step_idx=i, cfg=style_cfg, capture=True)
        _, state = pipe.mmdit.apply(
            {"params": params}, sty_lat.astype(pipe.dtype), t,
            ctx1.astype(pipe.dtype), pooled1.astype(pipe.dtype), vctx1, sctx_cap,
            mutable=["pnp_kv"],
        )
        kv = extract_mmdit_style_kv(state["pnp_kv"])
        sctx = StyleCtx(step_idx=i, cfg=style_cfg, style_kv=kv)
        v, _ = pipe.mmdit.apply(
            {"params": params}, x2.astype(pipe.dtype), t,
            ctx2.astype(pipe.dtype), pooled2.astype(pipe.dtype), vctx, sctx,
        )
        return v.astype(jnp.float32)

    steps, s_curr, s_next, etas = _seg_slices(steps_full, sigmas_full, etas_full,
                                              s0, chunk)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, chunk, axis=0)
    return style_transfer_rf_steps(
        denoise2, sl(content_full), sl(style_full), latents, steps, s_curr,
        s_next, etas, img_latents, pipe.schedule, cfg, mask=mask,
        singleton=True,
    )


@partial(jax.jit, static_argnames=("pipe", "cfg", "chunk"))
def _stylize1_segment(pipe, params, content_full, style_full, latents, steps_full,
                      sigmas_full, etas_full, s0, img_latents, context3, pooled3,
                      mask, cfg, chunk):
    """Stylized-only segment for steps past the shift window: the shift gate
    is False, so the processors fall back to the stylized branch's own q/k/v
    and the content/style velocity chunks are discarded (custom_pipeline.py:
    317-320) — their forwards are dead compute. Cross-frame KV expansion
    still applies (the SD3 CrossFrameProcessor is installed on every layer
    regardless of the window, run_content_inversion_sd3.py:58-68); the
    controlled-velocity pull and mask blending still run on trajectory data."""
    denoise = pipe._denoise_fn(
        params, context3[2:3], pooled3[2:3], SD3_FRAME_INDICES, None
    )

    def denoise1(x, t, i):
        v, _ = denoise(x, t, i)
        return v

    steps, s_curr, s_next, etas = _seg_slices(steps_full, sigmas_full, etas_full,
                                              s0, chunk)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, chunk, axis=0)
    return style_transfer_rf_steps(
        denoise1, sl(content_full), sl(style_full), latents, steps, s_curr,
        s_next, etas, img_latents, pipe.schedule, cfg, mask=mask,
        solo=True,
    )
