"""End-to-end generation: one jitted XLA graph from tokens to waveform.

The product path of the reference (inference call stack SURVEY.md section
3.2: T5 encode -> 1-NFE consistency UNet -> VAE decode -> HiFi-GAN) executes
here as a single `jax.jit`-compiled function — no Python between the text
encoder and the waveform. Behavior parity targets:

  * models/audio_consistency_model.py:429-548 (`AudioLCM.inference`)
  * easy_inference/consistencytta.py:135-200 (the deployment shape)

Multi-step consistency sampling re-noises at the coarser num_steps schedule's
odd duplicated timesteps, i.e. the unique timesteps [1:] (reference
`timesteps[1::2]` over the duplicated array, :499-507).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import (
    make_ddim_schedule,
    make_heun_schedule,
)


@dataclass(frozen=True)
class GenerateConfig:
    """Static generation options (baked into the compiled graph)."""

    num_steps: int = 1
    guidance_post: float = 1.0  # >1 enables external CFG on the student
    use_ema: bool = True  # student_ema weights (--use_ema, the shipped eval)
    use_edm: bool = True  # Heun/EDM schedule (--use_edm, the shipped eval)
    init_steps: int = 18  # first query uses set_timesteps(18) (:486)
    truncate_seconds: Optional[float] = 10.0  # inference.py:208
    use_karras: bool = False
    # decode the batch in sub-chunks (VAE decoder + vocoder activations are
    # the HBM peak; chunking unlocks batch 64 on one 16 GB chip). None: off.
    decode_chunk: Optional[int] = None
    # stage-3 FTVAE: decode through the EMA decoder pair (params.vae_ema).
    # None follows use_ema — the reference couples them
    # (inference.py:204-206: use_ema_decoder = args.use_ema and vae has EMA);
    # True/False overrides explicitly (decode(use_ema=...),
    # autoencoder.py:91-103).
    use_ema_decoder: Optional[bool] = None


def _with_truncation(
    fn: Callable, pipeline: Pipeline, truncate_seconds: Optional[float]
) -> Callable:
    """Apply the 10-s output truncation OUTSIDE the compiled graph (the
    reference slices host-side too, inference.py:208). Keeping the slice out
    of the jitted function means one compiled executable serves every
    truncation setting — truncate_seconds never forces a recompile."""
    if truncate_seconds is None:
        return fn
    n = int(pipeline.config.sample_rate * truncate_seconds)

    def truncated(*args, **kwargs):
        return fn(*args, **kwargs)[:, :n]

    return truncated


def build_generate_fn(
    pipeline: Pipeline, gen: GenerateConfig = GenerateConfig(), jit: bool = True
) -> Callable:
    """Returns generate(params, ids, mask, uncond_ids, uncond_mask, rng,
    guidance) -> waveform [B, samples].

    `guidance` is the CFG weight embedded into the guided UNet (w_input,
    guidance_scale_input); `gen.guidance_post` is the external CFG mix
    (guidance_scale_post). ids/uncond_ids must share a fixed length.
    """
    sched_cfg = pipeline.config.scheduler
    use_cfg_post = gen.guidance_post > 1.0

    # schedule family follows --use_edm like the reference's
    # inference_scheduler (inference.py:160): Heun sigmas vs DDIM abar grid.
    if gen.use_edm:
        sched_init = make_heun_schedule(sched_cfg, gen.init_steps, gen.use_karras)
        sched_multi = (
            make_heun_schedule(sched_cfg, gen.num_steps, gen.use_karras)
            if gen.num_steps > 1
            else None
        )
    else:
        sched_init = make_ddim_schedule(sched_cfg, gen.init_steps)
        sched_multi = (
            make_ddim_schedule(sched_cfg, gen.num_steps)
            if gen.num_steps > 1
            else None
        )

    def calc_zhat_0(params: PipelineParams, z_n, t, level, text, text_mask, guidance):
        """One consistency-model query with optional external CFG
        (audio_consistency_model.py:435-457). `level` is the noise-level
        argument of the schedule family: sigma for Heun, integer t for DDIM
        (where scale_model_input is the identity)."""
        unet_params = params.student_ema if gen.use_ema else params.student_target
        if use_cfg_post:
            z_in = jnp.concatenate([z_n, z_n], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            level_in = jnp.concatenate([level, level], axis=0)
            g_in = jnp.concatenate([guidance, guidance], axis=0)
        else:
            z_in, t_in, level_in, g_in = z_n, t, level, guidance

        z_scaled = sched_init.scale_model_input(z_in, level_in)
        zhat_0 = pipeline.query_student(
            unet_params, z_scaled, t_in, text, text_mask, g_in
        )
        if use_cfg_post:
            b = z_n.shape[0]
            uncond, cond = zhat_0[:b], zhat_0[b:]
            zhat_0 = (1.0 - gen.guidance_post) * uncond + gen.guidance_post * cond
        return zhat_0

    def generate(
        params: PipelineParams,
        ids,
        mask,
        uncond_ids,
        uncond_mask,
        rng: jax.Array,
        guidance,
    ):
        b = ids.shape[0]
        guidance = jnp.broadcast_to(
            jnp.asarray(guidance, jnp.float32).reshape(-1), (b,)
        )

        # 1. text encoding (uncond half only when external CFG is on)
        if use_cfg_post:
            text_cf, mask_cf, _, _ = pipeline.encode_text_cfg(
                params.t5, ids, mask, uncond_ids, uncond_mask
            )
            text, text_mask = text_cf, mask_cf
        else:
            text = pipeline.encode_text(params.t5, ids, mask)
            text_mask = mask

        # 2. initial 1-NFE query from pure noise at the max noise level
        rng, noise_rng = jax.random.split(rng)
        noise = jax.random.normal(
            noise_rng, pipeline.latent_shape(b), jnp.float32
        )
        z_n = noise * sched_init.init_noise_sigma
        t0 = jnp.full((b,), sched_init.timesteps[0])
        level0 = (
            jnp.full((b,), sched_init.sigmas[0]) if gen.use_edm else t0
        )
        zhat_0 = calc_zhat_0(params, z_n, t0, level0, text, text_mask, guidance)

        # 3. optional re-noise / re-denoise refinement at the coarse schedule
        # (`timesteps[1::order]` over the reference's duplicated Heun array
        # == unique timesteps [1:]; all remaining timesteps for DDIM)
        if sched_multi is not None:
            for i in range(1, gen.num_steps):
                rng, step_rng = jax.random.split(rng)
                t_i = jnp.full((b,), sched_multi.timesteps[i])
                level_i = (
                    jnp.full((b,), sched_multi.sigmas[i]) if gen.use_edm else t_i
                )
                eps = jax.random.normal(step_rng, zhat_0.shape, zhat_0.dtype)
                z_n = sched_multi.add_noise(zhat_0, eps, level_i)
                zhat_0 = calc_zhat_0(
                    params, z_n, t_i, level_i, text, text_mask, guidance
                )

        # 4. decode to waveform (FTVAE checkpoints: params.vae already holds
        # the fine-tuned decoder; use_ema additionally selects the EMA pair)
        ema_dec = gen.use_ema if gen.use_ema_decoder is None else gen.use_ema_decoder
        wav = pipeline.decode_latents(
            params.vae, params.vocoder, zhat_0, chunk=gen.decode_chunk,
            vae_ema=params.vae_ema, use_ema_decoder=ema_dec,
        )
        return wav

    return _with_truncation(
        jax.jit(generate) if jit else generate,
        pipeline, gen.truncate_seconds,
    )


def build_guided_student_generate_fn(
    pipeline: Pipeline,
    num_steps: int = 20,
    guidance_post: float = 1.0,
    use_ema: bool = True,
    use_edm: bool = False,
    truncate_seconds: Optional[float] = 10.0,
    jit: bool = True,
) -> Callable:
    """Multi-step iterative denoising with the stage-1 guided student —
    the AudioGDM inference path (models/audio_guided_model.py:171-244):
    the guidance weight is embedded (guidance_scale_input) and optionally a
    further external CFG is applied on the guided student
    (guidance_scale_post > 1).
    """
    sched_cfg = pipeline.config.scheduler
    use_cfg_post = guidance_post > 1.0

    def generate(params, ids, mask, uncond_ids, uncond_mask, rng, guidance):
        b = ids.shape[0]
        guidance = jnp.broadcast_to(
            jnp.asarray(guidance, jnp.float32).reshape(-1), (b,)
        )
        if use_cfg_post:
            text, text_mask, _, _ = pipeline.encode_text_cfg(
                params.t5, ids, mask, uncond_ids, uncond_mask
            )
        else:
            text = pipeline.encode_text(params.t5, ids, mask)
            text_mask = mask

        unet_params = params.student_ema if use_ema else params.student

        def query(z_scaled, t):
            if use_cfg_post:
                z_in = jnp.concatenate([z_scaled, z_scaled], axis=0)
                t_in = jnp.concatenate([t, t], axis=0)
                g_in = jnp.concatenate([guidance, guidance], axis=0)
                pred = pipeline.query_student(
                    unet_params, z_in, t_in, text, text_mask, g_in
                )
                uncond, cond = pred[:b], pred[b:]
                return uncond + guidance_post * (cond - uncond)
            return pipeline.query_student(
                unet_params, z_scaled, t, text, text_mask, guidance
            )

        noise = jax.random.normal(rng, pipeline.latent_shape(b), jnp.float32)

        if use_edm:
            sched = make_heun_schedule(sched_cfg, num_steps)
            z0 = sched.sample_loop(
                noise * sched.init_noise_sigma,
                lambda z_scaled, t, sigma: query(z_scaled, t),
            )
        else:
            sched = make_ddim_schedule(sched_cfg, num_steps)

            def body(z, t_scalar):
                t = jnp.full((b,), t_scalar)
                pred = query(z, t.astype(jnp.float32))
                return sched.step(pred, t, z), None

            z0, _ = jax.lax.scan(body, noise, sched.timesteps)

        wav = pipeline.decode_latents(params.vae, params.vocoder, z0)
        return wav

    return _with_truncation(
        jax.jit(generate) if jit else generate, pipeline, truncate_seconds
    )


def build_teacher_generate_fn(
    pipeline: Pipeline,
    num_steps: int = 18,
    use_edm: bool = True,
    use_karras: bool = False,
    truncate_seconds: Optional[float] = 10.0,
    jit: bool = True,
) -> Callable:
    """Multi-step CFG diffusion sampling with the teacher UNet — the
    LightweightLDM baseline (models/audio_consistency_model.py:513-534 and
    models/audio_guided_model.py:171-244).

    Returns teacher_generate(params, ids, mask, uncond_ids, uncond_mask,
    rng, guidance) -> waveform. NFE = 2 * num_steps - 1 (Heun) or num_steps
    (DDIM).
    """
    sched_cfg = pipeline.config.scheduler

    def generate(params, ids, mask, uncond_ids, uncond_mask, rng, guidance):
        b = ids.shape[0]
        guidance = jnp.broadcast_to(
            jnp.asarray(guidance, jnp.float32).reshape(-1), (b,)
        )
        text_cf, mask_cf, _, _ = pipeline.encode_text_cfg(
            params.t5, ids, mask, uncond_ids, uncond_mask
        )

        noise = jax.random.normal(rng, pipeline.latent_shape(b), jnp.float32)

        if use_edm:
            sched = make_heun_schedule(sched_cfg, num_steps, use_karras)

            def model_fn(z_scaled, t, sigma):
                return pipeline.query_teacher_cfg(
                    params.teacher, z_scaled, t, text_cf, mask_cf, guidance
                )

            z0 = sched.sample_loop(noise * sched.init_noise_sigma, model_fn)
        else:
            sched = make_ddim_schedule(sched_cfg, num_steps)

            def body(z, t_scalar):
                t = jnp.full((b,), t_scalar)
                eps_pred = pipeline.query_teacher_cfg(
                    params.teacher, z, t, text_cf, mask_cf, guidance
                )
                return sched.step(eps_pred, t, z), None

            z0, _ = jax.lax.scan(body, noise, sched.timesteps)

        wav = pipeline.decode_latents(params.vae, params.vocoder, z0)
        return wav

    return _with_truncation(
        jax.jit(generate) if jit else generate, pipeline, truncate_seconds
    )
