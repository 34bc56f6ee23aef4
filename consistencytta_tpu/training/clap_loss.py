"""Stage-3 CLAP-score loss: end-to-end differentiable decode -> CLAP.

Parity target: tools/losses.py:259-316 (CLAPLoss) — per-instance
mse_weight * latent-MSE + clap_weight * (2 - cos(gen, text) - cos(gen, gt)),
where the generated latent decodes through the VAE decoder + HiFi-GAN with
gradients, truncates to 10 s, resamples 16 -> 48 kHz with the kaiser sinc
filter (the exact parameters of the reference's torchaudio call,
tools/losses.py:300-305), and embeds through the frozen CLAP audio tower.

The full backward graph (UNet -> VAE decoder -> vocoder -> resampler ->
HTSAT Swin) is deep; the CLAP tower is wrapped in jax.checkpoint
(rematerialization) to bound activation memory — the TPU-native answer to
the reference's memory pressure on this path.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from consistencytta_tpu.evaluation.clap_model import (
    CLAPAudioTower,
    CLAPMelFrontend,
    CLAPTextTower,
)
from consistencytta_tpu.models.pipeline import Pipeline
from consistencytta_tpu.ops.resample import resample
from consistencytta_tpu.training.losses import mse_instance


def build_clap_loss(
    pipeline: Pipeline,
    clap_audio_params: dict = None,
    clap_text_params: dict = None,
    mse_weight: float = 1.0,
    clap_weight: float = 0.1,
    sample_rate: int = 16000,
    htsat_config=None,
    roberta_config=None,
    clip_seconds: float = 10.0,
) -> Callable:
    """Returns instance_loss(pred_latent, target_latent, frozen, micro) for
    build_consistency_train_step's loss_fn_override.

    `micro` must carry the RoBERTa-tokenized captions as
    clap_text_ids / clap_text_mask (host-tokenized, max_len 77) alongside
    the ground-truth waveform `wav`.
    """
    from consistencytta_tpu.evaluation.clap_model import HTSATConfig, RobertaConfig

    htsat_config = htsat_config or HTSATConfig()
    roberta_config = roberta_config or RobertaConfig()
    audio_tower = CLAPAudioTower(htsat_config)
    text_tower = CLAPTextTower(roberta_config)
    frontend = CLAPMelFrontend(htsat_config)

    def embed_audio(audio_params, wav_16k):
        wav_16k = wav_16k[:, : int(sample_rate * clip_seconds)]
        wav_48k = resample(wav_16k, sample_rate, 48000)
        # pad/crop to the CLAP clip length (10 s at 48 kHz in production)
        n = wav_48k.shape[1]
        target = int(48000 * clip_seconds)
        if n < target:
            wav_48k = jnp.pad(wav_48k, ((0, 0), (0, target - n)))
        else:
            wav_48k = wav_48k[:, :target]
        logmel = frontend(wav_48k)
        return audio_tower.apply({"params": audio_params}, logmel)

    embed_audio = jax.checkpoint(embed_audio)

    def loss_fn(pred_latent, target_latent, frozen, micro):
        # prefer tower params threaded through `frozen` (jit arguments);
        # the build-time params are a closure fallback for small tests —
        # closing over the full towers overflows AOT compile requests
        audio_params = (
            frozen.clap_audio if frozen.clap_audio is not None else clap_audio_params
        )
        text_params = (
            frozen.clap_text if frozen.clap_text is not None else clap_text_params
        )
        mse = mse_instance(pred_latent, target_latent)

        wav_gen = pipeline.decode_latents(frozen.vae, frozen.vocoder, pred_latent)
        gen_emb = embed_audio(audio_params, wav_gen)
        gt_emb = jax.lax.stop_gradient(embed_audio(audio_params, micro["wav"]))
        text_emb = jax.lax.stop_gradient(
            text_tower.apply(
                {"params": text_params},
                micro["clap_text_ids"],
                micro["clap_text_mask"],
            )
        )

        # embeddings are L2-normalized; cosine = dot
        gen_text = jnp.sum(gen_emb * text_emb, axis=-1)
        gen_gt = jnp.sum(gen_emb * gt_emb, axis=-1)
        return mse_weight * mse + clap_weight * (2.0 - gen_text - gen_gt)

    return loss_fn
