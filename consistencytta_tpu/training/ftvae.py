"""Stage-3 FTVAE variant: CLAP fine-tune with a trainable VAE decoder.

Parity target: models/audio_consistency_model_ftvae.py (--finetune_vae):
the VAE decoder + post_quant_conv join the student UNet as trainable
parameters (tools/train_utils.py:31-37), carry EMA shadows at `ema_decay`
(:102-113), and the CLAP loss decodes the predicted latent through the
TRAINABLE decoder. Requires loss_type == 'clap' (:32).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.resample import resample
from consistencytta_tpu.training.ema import ema_update
from consistencytta_tpu.training.losses import mse_instance
from consistencytta_tpu.training.step import (
    ConsistencyStepConfig,
    _select_if_finite,
    _tree_finite,
    consistency_forward,
    min_snr_weights_stage2,
)

Params = Dict[str, Any]


def vae_decoder_subset(vae_params: Params) -> Params:
    """The trainable subset: decoder + post_quant_conv."""
    return {
        "decoder": vae_params["decoder"],
        "post_quant_conv": vae_params["post_quant_conv"],
    }


def merge_vae_decoder(vae_params: Params, dec: Params) -> Params:
    return {**vae_params, "decoder": dec["decoder"],
            "post_quant_conv": dec["post_quant_conv"]}


@jax.tree_util.register_dataclass
@dataclass
class FTVAETrainState:
    step: jax.Array
    student: Params
    student_target: Params
    student_ema: Params
    vae_dec: Params  # trainable decoder + post_quant_conv
    vae_dec_ema: Params
    opt_state: optax.OptState

    @classmethod
    def create(
        cls, params: PipelineParams, tx: optax.GradientTransformation
    ) -> "FTVAETrainState":
        # COPY the decoder subset: the state is donated every step, and the
        # frozen PipelineParams keeps referencing params.vae — aliased
        # buffers would be deleted out from under the frozen tree ("Array
        # has been deleted" at checkpoint save)
        dec = jax.tree_util.tree_map(
            jnp.array, vae_decoder_subset(params.vae)
        )
        trainable = {"unet": params.student, "vae_dec": dec}
        return cls(
            step=jnp.zeros((), jnp.int32),
            student=params.student,
            student_target=params.student_target,
            student_ema=params.student_ema,
            vae_dec=dec,
            vae_dec_ema=jax.tree_util.tree_map(jnp.array, dec),
            opt_state=tx.init(trainable),
        )


def build_ftvae_validation_step(
    pipeline: Pipeline,
    schedule,
    cfg: ConsistencyStepConfig,
) -> Callable:
    """FTVAE validation: the standard 4-loss stage-2 validation (the
    reference's eval_model path, tools/train_utils.py:84-139) plus
    `loss_decoder_mel` — the trainable decoder's mel reconstruction MSE on
    ground-truth latents. The extra term exercises the fine-tuned decoder so
    a diverging decoder is visible to best-checkpoint tracking (the
    reference's latent-only validation cannot see it)."""
    from consistencytta_tpu.training.step import build_validation_step

    base_validate = build_validation_step(pipeline, schedule, cfg)

    def validate(state: FTVAETrainState, frozen: PipelineParams, batch, rng):
        losses = base_validate(state, frozen, batch, rng)

        # one mel frontend pass serves both the reconstruction target and
        # the encoder input, and the POSTERIOR MODE replaces a sampled
        # latent — the health metric is deterministic (no posterior-noise
        # variance across validation runs) and needs no extra rng stream.
        wav = batch["wav"]
        mel_gt = pipeline.frontend.wav_to_mel_image(
            wav, pipeline.config.target_mel_frames
        )
        from consistencytta_tpu.nn.vae import DiagonalGaussian

        moments = pipeline.vae.apply(
            {"params": frozen.vae}, mel_gt, method=pipeline.vae.encode_moments
        )
        z0 = pipeline.config.vae.scale_factor * DiagonalGaussian(moments).mode()
        vae_params = merge_vae_decoder(frozen.vae, state.vae_dec)
        mel_rec = pipeline.vae.apply(
            {"params": vae_params}, z0, method=pipeline.vae.decode_first_stage
        )
        losses["loss_decoder_mel"] = mse_instance(mel_rec, mel_gt).mean()
        return losses

    return validate


def build_ftvae_train_step(
    pipeline: Pipeline,
    schedule,
    tx: optax.GradientTransformation,
    cfg: ConsistencyStepConfig,
    clap_audio_params: dict = None,
    clap_text_params: dict = None,
    mse_weight: float = 1.0,
    clap_weight: float = 0.1,
    htsat_config=None,
    roberta_config=None,
    clip_seconds: float = 10.0,
) -> Callable:
    """Returns step(state, frozen, batch, rng) -> (state, metrics); batch
    must carry clap_text_ids/clap_text_mask like the stage-3 CLAP loss."""
    from consistencytta_tpu.evaluation.clap_model import (
        CLAPAudioTower,
        CLAPMelFrontend,
        CLAPTextTower,
        HTSATConfig,
        RobertaConfig,
    )

    htsat_config = htsat_config or HTSATConfig()
    roberta_config = roberta_config or RobertaConfig()
    audio_tower = CLAPAudioTower(htsat_config)
    text_tower = CLAPTextTower(roberta_config)
    frontend = CLAPMelFrontend(htsat_config)
    sr = pipeline.config.sample_rate

    def embed_audio(audio_params, wav_16k):
        wav_16k = wav_16k[:, : int(sr * clip_seconds)]
        wav_48k = resample(wav_16k, sr, 48000)
        target = int(48000 * clip_seconds)
        n = wav_48k.shape[1]
        wav_48k = (
            jnp.pad(wav_48k, ((0, 0), (0, target - n)))
            if n < target
            else wav_48k[:, :target]
        )
        return audio_tower.apply({"params": audio_params}, frontend(wav_48k))

    embed_audio = jax.checkpoint(embed_audio)

    def micro_loss(trainable, state, frozen, micro, rng):
        # CLAP towers may ride in frozen (jit arguments) instead of the
        # build-time closure — GB-scale closures overflow AOT compile
        # requests (PERF.md gotcha)
        audio_p = (
            frozen.clap_audio if frozen.clap_audio is not None else clap_audio_params
        )
        text_p = (
            frozen.clap_text if frozen.clap_text is not None else clap_text_params
        )
        target_params = jax.lax.stop_gradient(state.student_target)
        pred, target, snr = consistency_forward(
            pipeline, schedule, cfg, trainable["unet"], target_params, frozen,
            micro, rng,
        )

        mse = mse_instance(pred, target)

        # decode through the TRAINABLE decoder
        vae_params = merge_vae_decoder(frozen.vae, trainable["vae_dec"])
        wav_gen = pipeline.decode_latents(vae_params, frozen.vocoder, pred)
        gen_emb = embed_audio(audio_p, wav_gen)
        gt_emb = jax.lax.stop_gradient(embed_audio(audio_p, micro["wav"]))
        text_emb = jax.lax.stop_gradient(
            text_tower.apply(
                {"params": text_p},
                micro["clap_text_ids"],
                micro["clap_text_mask"],
            )
        )
        gen_text = jnp.sum(gen_emb * text_emb, axis=-1)
        gen_gt = jnp.sum(gen_emb * gt_emb, axis=-1)
        inst = mse_weight * mse + clap_weight * (2.0 - gen_text - gen_gt)
        if cfg.snr_gamma is not None:
            inst = inst * min_snr_weights_stage2(snr, cfg.snr_gamma)
        return inst.mean()

    grad_fn = jax.value_and_grad(micro_loss)

    def step(state: FTVAETrainState, frozen: PipelineParams, batch, rng):
        trainable = {"unet": state.student, "vae_dec": state.vae_dec}
        a = cfg.accum_steps
        if a == 1:
            loss, grads = grad_fn(trainable, state, frozen, batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((a, x.shape[0] // a) + x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, a)

            def body(carry, xs):
                loss_acc, grad_acc = carry
                mb, r = xs
                l, g = grad_fn(trainable, state, frozen, mb, r)
                return (
                    loss_acc + l / a,
                    jax.tree_util.tree_map(lambda ga, gi: ga + gi / a, grad_acc, g),
                ), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero), (micro, rngs)
            )

        finite = jnp.isfinite(loss) & _tree_finite(grads)
        updates, new_opt = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_trainable = _select_if_finite(finite, new_trainable, trainable)
        new_opt = _select_if_finite(finite, new_opt, state.opt_state)

        new_student = new_trainable["unet"]
        new_dec = new_trainable["vae_dec"]
        new_state = FTVAETrainState(
            step=state.step + 1,
            student=new_student,
            student_target=ema_update(
                state.student_target, new_student, cfg.target_ema_decay
            ),
            student_ema=ema_update(state.student_ema, new_student, cfg.ema_decay),
            vae_dec=new_dec,
            vae_dec_ema=ema_update(state.vae_dec_ema, new_dec, cfg.ema_decay),
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "loss_finite": finite}

    return step
