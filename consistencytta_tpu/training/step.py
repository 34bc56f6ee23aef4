"""Jitted train/validation steps for the three-stage distillation recipe.

One compiled function per stage fuses the reference's per-step work
(SURVEY.md section 3.1) into a single device program: STFT/mel -> VAE encode
-> text encode -> teacher/target/student UNet queries -> loss -> grads ->
AdamW update -> EMA updates. Gradient accumulation runs as a lax.scan over
micro-batches inside the step, so the EMA update happens exactly once per
optimizer step — the reference's `sync_gradients` semantics
(tools/train_utils.py:177-190).

Stage coverage:
  * build_guided_train_step      — stage 1 (models/audio_guided_model.py:87-169)
  * build_consistency_train_step — stages 2-3 (models/audio_consistency_model.py:239-427)
  * build_validation_step        — the 4-loss stage-2 validation
    (models/audio_consistency_model.py:354-405)

NaN-loss protection matches the reference's skip-the-step behavior
(tools/train_utils.py:167-173): non-finite grads leave params/opt state
unchanged (the step counter still advances).

The reference's `--uncondition` flag (drop 10% of text) is unimplemented
upstream too (audio_consistency_model.py:302-304 raises NotImplementedError).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import (
    DDIMSchedule,
    DDPMSchedule,
    HeunSchedule,
    min_snr_weights_stage1,
    min_snr_weights_stage2,
)
from consistencytta_tpu.training.ema import ema_update
from consistencytta_tpu.training.losses import (
    MultiResolutionSTFTLoss,
    mel_loss_instance,
    mse_instance,
)

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    """Trainable state: the student tree, its two EMA shadows, opt state."""

    step: jax.Array
    student: Params
    student_target: Optional[Params]
    student_ema: Params
    opt_state: optax.OptState

    @classmethod
    def create(cls, params: PipelineParams, tx: optax.GradientTransformation,
               with_target: bool = True) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            student=params.student,
            student_target=params.student_target if with_target else None,
            student_ema=params.student_ema,
            opt_state=tx.init(params.student),
        )


@dataclass(frozen=True)
class ConsistencyStepConfig:
    """Static stage-2/3 options (train.sh stage-2 recipe defaults)."""

    snr_gamma: Optional[float] = 5.0
    teacher_guidance_scale: float = -1.0  # -1 -> w ~ Unif(0, max_rand)
    max_rand_guidance_scale: float = 6.0
    target_ema_decay: float = 0.95
    ema_decay: float = 0.999
    loss_type: str = "mse"  # mse | mel | stft  (clap wired via loss_fn override)
    use_edm: bool = True
    accum_steps: int = 1
    # --uncondition: drop 10% of text conditions per micro-batch (swap to the
    # uncond tokenization). The reference parses the flag but raises
    # NotImplementedError (audio_consistency_model.py:303-304); here it works.
    uncondition: bool = False
    # rematerialize the trainable student UNet forward (recompute in the
    # backward pass): trades ~1 extra forward of FLOPs for the activation
    # memory that otherwise pushes production-scale training past one
    # chip's HBM
    remat_student: bool = True


def _select_if_finite(finite, new_tree, old_tree):
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o), new_tree, old_tree
    )


def _tree_finite(tree) -> jax.Array:
    """True iff every leaf of the tree is all-finite. Guards the optimizer
    update against finite-loss/non-finite-grad steps (stricter than the
    reference's loss-only check, tools/train_utils.py:167-173)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]).all()


def _tree_mean(trees):
    return jax.tree_util.tree_map(lambda x: x.mean(axis=0), trees)


def consistency_forward(
    pipeline: Pipeline,
    schedule,
    cfg: "ConsistencyStepConfig",
    student_params: Params,
    target_params: Params,
    frozen: PipelineParams,
    micro,
    rng,
):
    """The stage-2/3 consistency forward shared by the standard and FTVAE
    steps (models/audio_consistency_model.py:239-427): sample adjacent
    solver steps, noise, run the CFG teacher solver step(s), evaluate the
    EMA target net (ground truth at t=0) and the trainable student.

    Returns (student_pred zhat_0_from_{n+1}, target zhat_0_from_n, snr [B]).
    """
    use_edm = cfg.use_edm
    n = schedule.num_steps if use_edm else schedule.num_inference_steps

    wav, ids, mask = micro["wav"], micro["ids"], micro["mask"]
    uids, umask = micro["uncond_ids"], micro["uncond_mask"]
    b = wav.shape[0]
    if cfg.uncondition:
        # 10% per-sample text-condition drop (train.py:119-120); split the
        # extra key only on this path so default RNG streams are unchanged
        rng, r_drop = jax.random.split(rng)
        drop = jax.random.bernoulli(r_drop, 0.1, (b, 1))
        ids = jnp.where(drop, uids, ids)
        mask = jnp.where(drop, umask, mask)
    r_enc, r_u, r_eps, r_w = jax.random.split(rng, 4)

    # ground-truth latents + text (both frozen paths)
    z0 = jax.lax.stop_gradient(pipeline.encode_audio(frozen.vae, wav, r_enc))
    text_cf, mask_cf, text, mask_c = pipeline.encode_text_cfg(
        frozen.t5, ids, mask, uids, umask
    )
    text_cf = jax.lax.stop_gradient(text_cf)
    text = jax.lax.stop_gradient(text)

    # adjacent solver steps t_{n+1}=t[u], t_n=t[u+1]
    # (audio_consistency_model.py:268-290; EDM samples even duplicated
    # indices == unique indices 0..n-2)
    u = jax.random.randint(r_u, (b,), 0, n - 1)

    # per-sample random guidance w ~ Unif(0, 6) (:325-329)
    if cfg.teacher_guidance_scale == -1.0:
        w = jax.random.uniform(r_w, (b,)) * cfg.max_rand_guidance_scale
    else:
        w = jnp.full((b,), cfg.teacher_guidance_scale)

    eps = jax.random.normal(r_eps, z0.shape)

    if use_edm:
        sigma_u = schedule.sigmas[u]
        sigma_next = schedule.sigmas[u + 1]
        t_u = schedule.timesteps[u]
        t_next = schedule.timesteps[u + 1]

        z_noisy = schedule.add_noise(z0, eps, sigma_u)
        # final-step resample to pure noise (:311-320)
        is_last = (u == 0).reshape((-1,) + (1,) * (z0.ndim - 1))
        z_np1 = jnp.where(is_last, eps * schedule.init_noise_sigma, z_noisy)

        def teacher_fn(z_scaled, t, sigma):
            return pipeline.query_teacher_cfg(
                frozen.teacher, z_scaled, t, text_cf, mask_cf, w
            )

        zhat_n, _ = schedule.heun_pair(
            z_np1, sigma_u, sigma_next, teacher_fn, t_u, t_next
        )
        zhat_n = jax.lax.stop_gradient(zhat_n)
        z_np1_scaled = schedule.scale_model_input(z_np1, sigma_u)
        zhat_n_scaled = schedule.scale_model_input(zhat_n, sigma_next)
        snr = schedule.snr(u)
    else:
        t_u = schedule.timesteps[u]
        t_next = schedule.timesteps[u + 1]
        z_noisy = schedule.add_noise(z0, eps, t_u)
        is_last = (u == 0).reshape((-1,) + (1,) * (z0.ndim - 1))
        z_np1 = jnp.where(is_last, eps, z_noisy)

        eps_pred = pipeline.query_teacher_cfg(
            frozen.teacher, z_np1, t_u, text_cf, mask_cf, w
        )
        zhat_n = jax.lax.stop_gradient(schedule.step(eps_pred, t_u, z_np1))
        z_np1_scaled = z_np1
        zhat_n_scaled = zhat_n
        snr = schedule.snr(t_u)

    # target network on the teacher-stepped latent; ground truth at t=0
    # (:409-418)
    zhat_0_from_n = pipeline.query_student(
        target_params, zhat_n_scaled, t_next, text, mask_c, w
    )
    at_zero = (t_next == 0.0).reshape((-1,) + (1,) * (z0.ndim - 1))
    zhat_0_from_n = jax.lax.stop_gradient(jnp.where(at_zero, z0, zhat_0_from_n))

    # trainable student on the noisier latent (:420-423)
    student_query = (
        jax.checkpoint(pipeline.query_student)
        if cfg.remat_student
        else pipeline.query_student
    )
    zhat_0_from_np1 = student_query(
        student_params, z_np1_scaled, t_u, text, mask_c, w
    )
    return zhat_0_from_np1, zhat_0_from_n, snr


def build_consistency_train_step(
    pipeline: Pipeline,
    schedule,  # HeunSchedule (use_edm) or DDIMSchedule
    tx: optax.GradientTransformation,
    cfg: ConsistencyStepConfig = ConsistencyStepConfig(),
    loss_fn_override: Optional[Callable] = None,
) -> Callable:
    """Returns step(state, frozen, batch, rng) -> (state, metrics).

    frozen: PipelineParams carrying teacher/vae/vocoder/t5 (never updated).
    batch: dict with wav [B, S], ids/mask/uncond_ids/uncond_mask [B, L];
    B = accum_steps * micro_batch.
    """
    use_edm = cfg.use_edm
    n = schedule.num_steps if use_edm else schedule.num_inference_steps
    stft_loss = MultiResolutionSTFTLoss(sr=pipeline.config.sample_rate)

    def instance_loss(pred, target, frozen, micro):
        if loss_fn_override is not None:
            return loss_fn_override(pred, target, frozen, micro)
        if cfg.loss_type == "mse":
            return mse_instance(pred, target)
        if cfg.loss_type == "mel":
            decode = lambda z: pipeline.vae.apply(
                {"params": frozen.vae}, z, method=pipeline.vae.decode_first_stage
            )
            return mel_loss_instance(pred, target, decode)
        if cfg.loss_type == "stft":
            # decode both latents to waveforms through the frozen decoder +
            # vocoder (grad-preserving float path), like the reference's
            # MultiResolutionSTFTLoss (tools/losses.py:187-256 — with its
            # unset-self.sr bug fixed; see training/losses.py docstring)
            decode_wav = lambda z: pipeline.decode_latents(
                frozen.vae, frozen.vocoder, z
            )
            return stft_loss(pred, target, decode_wav)
        raise ValueError(f"unsupported loss type {cfg.loss_type}")

    def micro_loss(student_params, state, frozen, micro, rng):
        target_params = jax.lax.stop_gradient(state.student_target)
        pred, target, snr = consistency_forward(
            pipeline, schedule, cfg, student_params, target_params, frozen,
            micro, rng,
        )
        inst = instance_loss(pred, target, frozen, micro)
        if cfg.snr_gamma is not None:
            inst = inst * min_snr_weights_stage2(snr, cfg.snr_gamma)
        return inst.mean()

    grad_fn = jax.value_and_grad(micro_loss)

    def step(state: TrainState, frozen: PipelineParams, batch, rng):
        a = cfg.accum_steps

        if a == 1:
            loss, grads = grad_fn(state.student, state, frozen, batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((a, x.shape[0] // a) + x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, a)

            def body(carry, xs):
                loss_acc, grad_acc = carry
                mb, r = xs
                l, g = grad_fn(state.student, state, frozen, mb, r)
                return (
                    loss_acc + l / a,
                    jax.tree_util.tree_map(lambda ga, gi: ga + gi / a, grad_acc, g),
                ), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.student)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero_grads), (micro, rngs)
            )

        finite = jnp.isfinite(loss) & _tree_finite(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.student)
        new_student = optax.apply_updates(state.student, updates)
        new_student = _select_if_finite(finite, new_student, state.student)
        new_opt = _select_if_finite(finite, new_opt, state.opt_state)

        new_target = ema_update(
            state.student_target, new_student, cfg.target_ema_decay
        )
        new_ema = ema_update(state.student_ema, new_student, cfg.ema_decay)

        new_state = TrainState(
            step=state.step + 1,
            student=new_student,
            student_target=new_target,
            student_ema=new_ema,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "loss_finite": finite}

    return step


def build_validation_step(
    pipeline: Pipeline,
    schedule,  # HeunSchedule or DDIMSchedule
    cfg: ConsistencyStepConfig = ConsistencyStepConfig(),
) -> Callable:
    """Stage-2 validation: start at t_0 (pure noise), run the teacher all the
    way to t=0, return the 4 diagnostic losses
    (models/audio_consistency_model.py:354-405 with
    validation_mode=num_diffusion_steps-1, tools/train_utils.py:97).
    Dispatches on the schedule kind: Heun/EDM (`--use_edm`) or DDIM — the
    reference validates regardless of solver (tools/train_utils.py:84-139).

    Returns validate(state, frozen, batch, rng) ->
    dict(loss_w_gt, loss_w_teacher, loss_consistency, loss_teacher).
    """
    if not hasattr(schedule, "heun_pair"):
        return _build_ddim_validation_step(pipeline, schedule, cfg)
    n = schedule.num_steps

    def validate(state: TrainState, frozen: PipelineParams, batch, rng):
        wav, ids, mask = batch["wav"], batch["ids"], batch["mask"]
        uids, umask = batch["uncond_ids"], batch["uncond_mask"]
        b = wav.shape[0]
        r_enc, r_eps, r_w = jax.random.split(rng, 3)

        z0 = pipeline.encode_audio(frozen.vae, wav, r_enc)
        text_cf, mask_cf, text, mask_c = pipeline.encode_text_cfg(
            frozen.t5, ids, mask, uids, umask
        )

        if cfg.teacher_guidance_scale == -1.0:
            w = jax.random.uniform(r_w, (b,)) * cfg.max_rand_guidance_scale
        else:
            w = jnp.full((b,), cfg.teacher_guidance_scale)

        eps = jax.random.normal(r_eps, z0.shape)
        z_np1 = eps * schedule.init_noise_sigma  # u=0: pure noise resample

        t0 = jnp.full((b,), schedule.timesteps[0])
        t1 = jnp.full((b,), schedule.timesteps[1])
        s0 = jnp.full((b,), schedule.sigmas[0])
        s1 = jnp.full((b,), schedule.sigmas[1])

        def teacher_fn(z_scaled, t, sigma):
            return pipeline.query_teacher_cfg(
                frozen.teacher, z_scaled, t, text_cf, mask_cf, w
            )

        zhat_n, _ = schedule.heun_pair(z_np1, s0, s1, teacher_fn, t0, t1)

        # target-net estimates from both ends of the first interval
        zhat0_from_np1 = pipeline.query_student(
            state.student_target,
            schedule.scale_model_input(z_np1, s0),
            t0, text, mask_c, w,
        )
        zhat0_from_n = pipeline.query_student(
            state.student_target,
            schedule.scale_model_input(zhat_n, s1),
            t1, text, mask_c, w,
        )

        # full teacher rollout for the remaining intervals + final Euler
        def body(z, i):
            t_i = jnp.full((b,), schedule.timesteps[i])
            t_ip1 = jnp.full((b,), schedule.timesteps[i + 1])
            s_i = jnp.full((b,), schedule.sigmas[i])
            s_ip1 = jnp.full((b,), schedule.sigmas[i + 1])
            z_next, _ = schedule.heun_pair(z, s_i, s_ip1, teacher_fn, t_i, t_ip1)
            return z_next, None

        z_teacher, _ = jax.lax.scan(body, zhat_n, jnp.arange(1, n - 1))
        t_last = jnp.full((b,), schedule.timesteps[n - 1])
        s_last = jnp.full((b,), schedule.sigmas[n - 1])
        out = teacher_fn(
            schedule.scale_model_input(z_teacher, s_last), t_last, s_last
        )
        z_teacher = schedule.euler_step(z_teacher, out, s_last, jnp.zeros((b,)))

        inst = mse_instance(zhat0_from_np1, zhat0_from_n)
        if cfg.snr_gamma is not None:
            inst = inst * min_snr_weights_stage2(
                schedule.snr(jnp.zeros((b,), jnp.int32)), cfg.snr_gamma
            )

        return {
            "loss_w_gt": mse_instance(zhat0_from_np1, z0).mean(),
            "loss_w_teacher": mse_instance(zhat0_from_np1, z_teacher).mean(),
            "loss_consistency": inst.mean(),
            "loss_teacher": mse_instance(z_teacher, z0).mean(),
        }

    return validate


def _build_ddim_validation_step(
    pipeline: Pipeline,
    schedule: DDIMSchedule,
    cfg: ConsistencyStepConfig = ConsistencyStepConfig(),
) -> Callable:
    """DDIM-solver variant of the 4-loss validation: pure noise at t_0, one
    teacher DDIM step for the target-net consistency pair, full teacher DDIM
    rollout for loss_w_teacher / loss_teacher."""
    n = schedule.num_inference_steps

    def validate(state: TrainState, frozen: PipelineParams, batch, rng):
        wav, ids, mask = batch["wav"], batch["ids"], batch["mask"]
        uids, umask = batch["uncond_ids"], batch["uncond_mask"]
        b = wav.shape[0]
        r_enc, r_eps, r_w = jax.random.split(rng, 3)

        z0 = pipeline.encode_audio(frozen.vae, wav, r_enc)
        text_cf, mask_cf, text, mask_c = pipeline.encode_text_cfg(
            frozen.t5, ids, mask, uids, umask
        )

        if cfg.teacher_guidance_scale == -1.0:
            w = jax.random.uniform(r_w, (b,)) * cfg.max_rand_guidance_scale
        else:
            w = jnp.full((b,), cfg.teacher_guidance_scale)

        eps = jax.random.normal(r_eps, z0.shape)
        z_np1 = eps * schedule.init_noise_sigma  # u=0: pure noise resample

        t0 = jnp.full((b,), schedule.timesteps[0])
        t1 = jnp.full((b,), schedule.timesteps[1])

        def teacher_fn(z, t):
            return pipeline.query_teacher_cfg(
                frozen.teacher, z, t, text_cf, mask_cf, w
            )

        zhat_n = schedule.step(teacher_fn(z_np1, t0), t0, z_np1)

        # target-net estimates from both ends of the first interval
        zhat0_from_np1 = pipeline.query_student(
            state.student_target, z_np1, t0, text, mask_c, w
        )
        zhat0_from_n = pipeline.query_student(
            state.student_target, zhat_n, t1, text, mask_c, w
        )

        # full teacher DDIM rollout over the remaining timesteps
        def body(z, i):
            t_i = jnp.full((b,), schedule.timesteps[i])
            return schedule.step(teacher_fn(z, t_i), t_i, z), None

        z_teacher, _ = jax.lax.scan(body, zhat_n, jnp.arange(1, n))

        inst = mse_instance(zhat0_from_np1, zhat0_from_n)
        if cfg.snr_gamma is not None:
            inst = inst * min_snr_weights_stage2(schedule.snr(t0), cfg.snr_gamma)

        return {
            "loss_w_gt": mse_instance(zhat0_from_np1, z0).mean(),
            "loss_w_teacher": mse_instance(zhat0_from_np1, z_teacher).mean(),
            "loss_consistency": inst.mean(),
            "loss_teacher": mse_instance(z_teacher, z0).mean(),
        }

    return validate


@dataclass(frozen=True)
class GuidedStepConfig:
    """Static stage-1 options (train.sh stage-1 recipe defaults)."""

    snr_gamma: Optional[float] = 5.0
    teacher_guidance_scale: float = -1.0
    max_rand_guidance_scale: float = 6.0
    ema_decay: float = 0.999
    accum_steps: int = 1


def guided_distill_loss(
    pipeline: Pipeline,
    schedule: DDPMSchedule,
    cfg: "GuidedStepConfig",
    student_params: Params,
    frozen: PipelineParams,
    micro,
    rng,
) -> jax.Array:
    """The stage-1 guided-distillation loss (models/audio_guided_model.py:
    87-169): distill the CFG teacher's noise prediction into the
    guidance-conditioned student at uniformly sampled DDPM timesteps.
    Shared by the train step and the stage-1 validation step."""
    n_train = schedule.num_train_timesteps
    wav, ids, mask = micro["wav"], micro["ids"], micro["mask"]
    uids, umask = micro["uncond_ids"], micro["uncond_mask"]
    b = wav.shape[0]
    r_enc, r_t, r_eps, r_w = jax.random.split(rng, 4)

    z0 = jax.lax.stop_gradient(pipeline.encode_audio(frozen.vae, wav, r_enc))
    text_cf, mask_cf, text, mask_c = pipeline.encode_text_cfg(
        frozen.t5, ids, mask, uids, umask
    )
    text_cf = jax.lax.stop_gradient(text_cf)
    text = jax.lax.stop_gradient(text)

    t = jax.random.randint(r_t, (b,), 0, n_train)
    eps = jax.random.normal(r_eps, z0.shape)
    z_noisy = schedule.add_noise(z0, eps, t)
    is_last = (t == n_train - 1).reshape((-1,) + (1,) * (z0.ndim - 1))
    z_n = jnp.where(is_last, eps * schedule.init_noise_sigma, z_noisy)

    if cfg.teacher_guidance_scale == -1.0:
        w = jax.random.uniform(r_w, (b,)) * cfg.max_rand_guidance_scale
    else:
        w = jnp.full((b,), cfg.teacher_guidance_scale)

    teacher_pred = jax.lax.stop_gradient(
        pipeline.query_teacher_cfg(
            frozen.teacher, z_n, t.astype(jnp.float32), text_cf, mask_cf, w
        )
    )
    student_pred = pipeline.query_student(
        student_params, z_n, t.astype(jnp.float32), text, mask_c, w
    )

    inst = mse_instance(student_pred, teacher_pred)
    if cfg.snr_gamma is not None:
        inst = inst * min_snr_weights_stage1(
            schedule.snr(t), cfg.snr_gamma, schedule.prediction_type
        )
    return inst.mean()


def build_guided_validation_step(
    pipeline: Pipeline,
    schedule: DDPMSchedule,
    cfg: "GuidedStepConfig",
) -> Callable:
    """Stage-1 validation: the distillation loss on a held-out batch
    (reference eval_model, tools/train_utils.py:84-139 stage-1 branch); the
    loop tracks best checkpoints on `val_loss`."""

    def validate(state: TrainState, frozen: PipelineParams, batch, rng):
        loss = guided_distill_loss(
            pipeline, schedule, cfg, state.student, frozen, batch, rng
        )
        return {"val_loss": loss}

    return validate


def build_guided_train_step(
    pipeline: Pipeline,
    schedule: DDPMSchedule,
    tx: optax.GradientTransformation,
    cfg: GuidedStepConfig = GuidedStepConfig(),
) -> Callable:
    """Stage-1 guided distillation step; see guided_distill_loss."""

    def micro_loss(student_params, frozen, micro, rng):
        return guided_distill_loss(
            pipeline, schedule, cfg, student_params, frozen, micro, rng
        )

    grad_fn = jax.value_and_grad(micro_loss)

    def step(state: TrainState, frozen: PipelineParams, batch, rng):
        a = cfg.accum_steps
        if a == 1:
            loss, grads = grad_fn(state.student, frozen, batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((a, x.shape[0] // a) + x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, a)

            def body(carry, xs):
                loss_acc, grad_acc = carry
                mb, r = xs
                l, g = grad_fn(state.student, frozen, mb, r)
                return (
                    loss_acc + l / a,
                    jax.tree_util.tree_map(lambda ga, gi: ga + gi / a, grad_acc, g),
                ), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.student)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero), (micro, rngs)
            )

        finite = jnp.isfinite(loss) & _tree_finite(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.student)
        new_student = optax.apply_updates(state.student, updates)
        new_student = _select_if_finite(finite, new_student, state.student)
        new_opt = _select_if_finite(finite, new_opt, state.opt_state)

        new_state = TrainState(
            step=state.step + 1,
            student=new_student,
            student_target=state.student_target,
            student_ema=ema_update(state.student_ema, new_student, cfg.ema_decay),
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "loss_finite": finite}

    return step
