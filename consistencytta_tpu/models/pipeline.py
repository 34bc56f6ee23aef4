"""The model bundle: module definitions + parameter pytrees for the whole
TTA pipeline, and the text-encoding helpers shared by training & inference.

This replaces the reference's nn.Module orchestration wrappers
(models/audio_distilled_model.py): instead of a stateful module owning
teacher/student/EMA submodules, the pipeline is a set of flax module
*definitions* (static) plus a `PipelineParams` pytree holding every
parameter collection. Training updates only `params.student` (plus EMA
shadows via tree lerp); everything else is frozen by construction — the
functional equivalent of the reference's `check_eval_mode` assertions
(:273-284), enforced by never passing frozen trees to the optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from consistencytta_tpu.configs import PipelineConfig, UNetConfig
from consistencytta_tpu.nn.hifigan import HiFiGANGenerator, vocoder_postprocess
from consistencytta_tpu.nn.t5 import T5Encoder
from consistencytta_tpu.nn.unet import UNet2DConditionGuided
from consistencytta_tpu.nn.vae import AutoencoderKL
from consistencytta_tpu.ops.stft import MelFrontend

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclass
class PipelineParams:
    """All parameter trees of the pipeline (a pytree).

    Roles follow the reference naming (audio_distilled_model.py:58-78,
    audio_consistency_model.py:64-67):
      teacher         — frozen diffusion teacher UNet
      student         — trainable student UNet
      student_target  — EMA(0.95) target network (stage 2)
      student_ema     — EMA(0.999) weights used at inference
    Any role may be None when unused (e.g. teacher at pure inference).
    """

    student: Optional[Params] = None
    student_target: Optional[Params] = None
    student_ema: Optional[Params] = None
    teacher: Optional[Params] = None
    vae: Optional[Params] = None
    vocoder: Optional[Params] = None
    t5: Optional[Params] = None
    vae_ema: Optional[Params] = None  # stage-3 EMA decoder pair
    # stage-3 CLAP towers: threaded through the step as arguments rather
    # than closed over — closure trees serialize into the AOT compile
    # request (HTTP 413 on GB-scale trees; PERF.md gotcha)
    clap_audio: Optional[Params] = None
    clap_text: Optional[Params] = None


@dataclass(frozen=True)
class Pipeline:
    """Static module bundle; construct once from a PipelineConfig."""

    config: PipelineConfig
    student_unet: UNet2DConditionGuided
    teacher_unet: UNet2DConditionGuided
    vae: AutoencoderKL
    vocoder: HiFiGANGenerator
    t5: T5Encoder
    frontend: MelFrontend

    @classmethod
    def create(
        cls, config: PipelineConfig = PipelineConfig(), dtype=jnp.float32
    ) -> "Pipeline":
        teacher_cfg = UNetConfig.from_dict({**config.unet.to_dict(), "guided": False})
        return cls(
            config=config,
            student_unet=UNet2DConditionGuided(config.unet, dtype=dtype),
            teacher_unet=UNet2DConditionGuided(teacher_cfg, dtype=dtype),
            vae=AutoencoderKL(config.vae, dtype=dtype),
            vocoder=HiFiGANGenerator(config.vocoder, dtype=dtype),
            t5=T5Encoder(config.t5, dtype=dtype),
            frontend=MelFrontend(config.stft),
        )

    # -- text ---------------------------------------------------------------

    def encode_text(self, t5_params: Params, ids, mask) -> jax.Array:
        return self.t5.apply({"params": t5_params}, ids, mask)

    def encode_text_cfg(
        self, t5_params: Params, ids, mask, uncond_ids, uncond_mask
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Returns (embeds_cf [2B,...], mask_cf [2B,...], embeds [B,...],
        mask [B,...]) with the uncond half FIRST, matching the reference
        concatenation order (audio_distilled_model.py:245-246)."""
        both_ids = jnp.concatenate([uncond_ids, ids], axis=0)
        both_mask = jnp.concatenate([uncond_mask, mask], axis=0)
        embeds_cf = self.encode_text(t5_params, both_ids, both_mask)
        b = ids.shape[0]
        return embeds_cf, both_mask, embeds_cf[b:], mask

    # -- UNet queries -------------------------------------------------------

    def query_student(
        self, params: Params, z_scaled, t, text_embeds, text_mask, guidance
    ) -> jax.Array:
        return self.student_unet.apply(
            {"params": params}, z_scaled, t, text_embeds, text_mask, guidance
        )

    def query_teacher_cfg(
        self,
        teacher_params: Params,
        z_scaled,
        t,
        text_embeds_cf,
        text_mask_cf,
        guidance_scale,
    ) -> jax.Array:
        """CFG teacher query (audio_distilled_model.py:286-322): stacked
        [uncond; cond] batch through the plain teacher UNet, then
        (1 - w) * uncond + w * cond with per-sample w."""
        z_cat = jnp.concatenate([z_scaled, z_scaled], axis=0)
        t_cat = jnp.concatenate([t, t], axis=0)
        pred = self.teacher_unet.apply(
            {"params": teacher_params}, z_cat, t_cat, text_embeds_cf, text_mask_cf
        )
        b = z_scaled.shape[0]
        uncond, cond = pred[:b], pred[b:]
        w = jnp.asarray(guidance_scale, pred.dtype).reshape(
            (-1,) + (1,) * (pred.ndim - 1)
        )
        return (1.0 - w) * uncond + w * cond

    # -- decode -------------------------------------------------------------

    def decode_latents(
        self, vae_params: Params, vocoder_params: Params, z_scaled,
        chunk: Optional[int] = None,
        vae_ema: Optional[Params] = None,
        use_ema_decoder: bool = False,
    ) -> jax.Array:
        """scaled latent [B, t, f, c] -> waveform [B, samples]; fuses
        vae.decode_first_stage + decode_to_waveform + global DC centering
        (autoencoder.py:103-111, hifigan/utilities.py:76-91).

        `use_ema_decoder` + `vae_ema`: decode through the stage-3 FTVAE EMA
        decoder pair instead of vae_params' decoder — the reference's
        `decode(z, use_ema=True)` (autoencoder.py:91-103). Like the
        reference, a missing EMA pair silently falls back to the non-EMA
        decoder.

        `chunk`: decode in batch sub-chunks via lax.map so the VAE-decoder /
        HiFi-GAN upsample activations (the HBM peak of generation) scale with
        the chunk, not the batch — unlocks batch 64 on one 16 GB chip. The
        DC centering stays batch-global (reference vocoder_infer semantics),
        so chunked and unchunked results are identical."""
        if use_ema_decoder and vae_ema is not None:
            vae_params = {**vae_params, **vae_ema}

        def decode_one(z):
            mel = self.vae.apply(
                {"params": vae_params}, z, method=self.vae.decode_first_stage
            )
            return self.vocoder.apply({"params": vocoder_params}, mel[..., 0])

        b = z_scaled.shape[0]
        if chunk and 0 < chunk < b and b % chunk == 0:
            z_chunks = z_scaled.reshape((b // chunk, chunk) + z_scaled.shape[1:])
            wav = jax.lax.map(decode_one, z_chunks)
            wav = wav.reshape(b, wav.shape[-1])
        else:
            wav = decode_one(z_scaled)
        return vocoder_postprocess(wav)

    # -- encode (training) --------------------------------------------------

    def encode_audio(self, vae_params: Params, wav, rng) -> jax.Array:
        """waveform [B, samples] -> scaled latent [B, t, f, c]
        (the reference's wav_to_fbank -> encode_first_stage ->
        get_first_stage_encoding chain, tools/train_utils.py:150-163)."""
        mel_img = self.frontend.wav_to_mel_image(
            wav, self.config.target_mel_frames
        )
        return self.vae.apply(
            {"params": vae_params},
            mel_img,
            rng,
            method=self.vae.encode_to_latent,
        )

    def latent_shape(self, batch: int) -> Tuple[int, int, int, int]:
        ls = self.config.latent
        return (batch, ls.t, ls.f, ls.c)

    # -- initialization -----------------------------------------------------

    def init_params(
        self,
        rng: jax.Array,
        roles: Tuple[str, ...] = ("student", "student_target", "student_ema", "teacher"),
        text_len: int = 64,
    ) -> PipelineParams:
        """Random-init parameter trees for every module (for tests, benches,
        and training-from-scratch; production paths load checkpoints via
        consistencytta_tpu.io.torch_import)."""
        cfg = self.config
        k_unet, k_vae, k_voc, k_t5, k_lat = jax.random.split(rng, 5)

        z = jnp.zeros(self.latent_shape(1))
        t = jnp.zeros((1,))
        text = jnp.zeros((1, text_len, cfg.unet.cross_attention_dim))
        tmask = jnp.ones((1, text_len), jnp.int32)

        # jit every init: one compiled program per module instead of
        # thousands of eager op dispatches (critical on remote TPU paths)
        student = jax.jit(self.student_unet.init)(
            k_unet, z, t, text, tmask, guidance=t
        )["params"]
        teacher = jax.jit(self.teacher_unet.init)(k_unet, z, t, text, tmask)[
            "params"
        ]

        mel_img = jnp.zeros((1, cfg.target_mel_frames, cfg.stft.n_mel_channels, 1))
        vae = jax.jit(self.vae.init)(k_vae, mel_img, k_lat)["params"]
        voc = jax.jit(self.vocoder.init)(
            k_voc, jnp.zeros((1, 8, cfg.vocoder.num_mels))
        )["params"]
        ids = jnp.zeros((1, text_len), jnp.int32)
        t5 = jax.jit(self.t5.init)(k_t5, ids, tmask)["params"]

        kw = dict(vae=vae, vocoder=voc, t5=t5)
        for role in roles:
            kw[role] = student if role != "teacher" else teacher
        return PipelineParams(**kw)
