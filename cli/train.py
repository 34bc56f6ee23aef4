"""Three-stage distillation trainer CLI.

TPU-native equivalent of reference train.py: same flag surface (train.sh
recipes apply verbatim), but the training step is one jitted device program
over a data-parallel mesh instead of an Accelerate DDP loop.

Stage 1: guided diffusion distillation (AudioGDM equivalent).
Stage 2: consistency distillation (AudioLCM), --use_edm for the shipped
         Heun/EDM recipe; stage 3 is stage 2 with --loss_type clap.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train ConsistencyTTA-TPU")
    # data
    p.add_argument("--stage", type=int, choices=[1, 2], default=2)
    p.add_argument("--train_file", type=str, default="data/train_audiocaps.json")
    p.add_argument("--validation_file", type=str, default="data/valid_audiocaps.json")
    p.add_argument("--test_file", type=str, default="data/test_audiocaps_subset.json")
    p.add_argument("--num_examples", type=int, default=-1)
    p.add_argument("--text_column", type=str, default="captions")
    p.add_argument("--audio_column", type=str, default="location")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--uncondition", action="store_true")
    p.add_argument("--prefix", type=str, default=None)
    # models
    p.add_argument("--text_encoder_name", type=str, default="google/flan-t5-large")
    p.add_argument("--scheduler_name", type=str, default="stabilityai/stable-diffusion-2-1")
    p.add_argument("--unet_model_config", type=str, default=None)
    p.add_argument("--pipeline_config", type=str, default=None,
                   help='pipeline base config: "tiny" or a config json path')
    p.add_argument("--tango_model", type=str, default=None)
    p.add_argument("--stage1_model", type=str, default=None)
    p.add_argument("--vae_checkpoint", type=str, default=None,
                   help="audioldm-s-full.ckpt (VAE + vocoder weights)")
    p.add_argument("--clap_checkpoint", type=str,
                   default="ckpt/music_audioset_epoch_15_esc_90.14.pt",
                   help="LAION-CLAP checkpoint for --loss_type clap")
    p.add_argument("--random_init", action="store_true",
                   help="random-init any missing weights (dev/smoke mode)")
    # T5 is always frozen here (text-encoder fine-tuning is unimplemented,
    # as in the reference); the flag must be passed explicitly so recipes
    # stay compatible and the unsupported mode is rejected loudly
    # (reference train.py:362 hard-asserts the same).
    p.add_argument("--freeze_text_encoder", action="store_true", default=False)
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--finetune_vae", action="store_true")
    # recipe
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--loss_type", type=str, default="mse",
                   choices=["mse", "mel", "stft", "clap"])
    p.add_argument("--use_edm", action="store_true")
    p.add_argument("--use_karras", action="store_true")
    p.add_argument("--use_bf16", action="store_true")
    p.add_argument("--num_diffusion_steps", type=int, default=18)
    p.add_argument("--teacher_guidance_scale", type=float, default=1)
    p.add_argument("--target_ema_decay", type=float, default=0.95)
    p.add_argument("--ema_decay", type=float, default=0.999)
    # optimization
    p.add_argument("--per_device_train_batch_size", type=int, default=2)
    p.add_argument("--per_device_eval_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    # restrict the mesh to the first N local devices (debug/bring-up on a
    # chip subset; the reference equivalent is CUDA_VISIBLE_DEVICES)
    p.add_argument("--num_devices", type=int, default=None)
    # disable student-forward rematerialization: ~9% faster steps when the
    # activations fit HBM (measured 507 -> 465 ms for the LoRA step; keep
    # remat for full-param single-chip runs)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--num_train_epochs", type=int, default=40)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--lr_scheduler_type", type=str, default="linear")
    p.add_argument("--num_warmup_steps", type=int, default=0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    # checkpointing / logging
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--checkpointing_steps", type=str, default="best")
    p.add_argument("--save_every", type=int, default=5)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--starting_epoch", type=int, default=0)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--with_tracking", action="store_true")
    p.add_argument("--text_len", type=int, default=64,
                   help="fixed tokenized text length (static shapes)")
    return p.parse_args(argv)


def consistency_step_config_from_args(args):
    """args -> the stage-2/3 step config the jitted step consumes.

    Module-level (not inlined in main) so the flag audit can assert
    BEHAVIORALLY that each recipe flag lands in the artifact
    (tests/test_flag_audit.py) — mirroring how the reference threads
    train.py args into AudioLCM's constructor (reference train.py:331-358)."""
    from consistencytta_tpu.training.step import ConsistencyStepConfig

    return ConsistencyStepConfig(
        snr_gamma=args.snr_gamma,
        teacher_guidance_scale=args.teacher_guidance_scale,
        target_ema_decay=args.target_ema_decay,
        ema_decay=args.ema_decay,
        loss_type=args.loss_type if args.loss_type != "clap" else "mse",
        use_edm=args.use_edm,
        accum_steps=args.gradient_accumulation_steps,
        remat_student=not args.no_remat,
        uncondition=args.uncondition,
    )


def guided_step_config_from_args(args):
    """args -> the stage-1 step config (reference train.py:318-330)."""
    from consistencytta_tpu.training.step import GuidedStepConfig

    return GuidedStepConfig(
        snr_gamma=args.snr_gamma,
        teacher_guidance_scale=args.teacher_guidance_scale,
        ema_decay=args.ema_decay,
        accum_steps=args.gradient_accumulation_steps,
    )


def optimizer_config_from_args(args, max_steps):
    """args -> OptimizerConfig (reference train.py:364-377 AdamW wiring +
    tools/train_utils.py get_scheduler)."""
    from consistencytta_tpu.training.optim import OptimizerConfig

    return OptimizerConfig(
        learning_rate=args.learning_rate,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_epsilon=args.adam_epsilon,
        weight_decay=args.adam_weight_decay,
        num_warmup_steps=args.num_warmup_steps,
        max_train_steps=max_steps,
        lr_scheduler_type=args.lr_scheduler_type,
    )


def schedule_from_args(args, scheduler_config):
    """args -> the solver schedule the step consumes: DDPM for stage 1,
    Heun(/Karras) for --use_edm stage 2, DDIM otherwise
    (reference train.py:306-316, inference_scheduler selection)."""
    from consistencytta_tpu.ops.schedulers import (
        make_ddim_schedule,
        make_ddpm_schedule,
        make_heun_schedule,
    )

    if args.stage == 1:
        return make_ddpm_schedule(scheduler_config)
    if args.use_edm:
        return make_heun_schedule(
            scheduler_config, args.num_diffusion_steps, args.use_karras
        )
    return make_ddim_schedule(scheduler_config, args.num_diffusion_steps)


def main(argv=None):
    from cli.common import (
        append_config_replay,
        build_pipeline_config,
        load_frozen_and_roles,
    )
    from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
    from consistencytta_tpu.parallel.mesh import (
        make_mesh,
        device_put_replicated,
        shard_train_state,
        sharded_step,
    )
    from consistencytta_tpu.text.tokenizer import load_tokenizer
    from consistencytta_tpu.training.data import DataLoader, T2ADataset
    from consistencytta_tpu.training.loop import LoopConfig, train_loop
    from consistencytta_tpu.training.optim import make_optimizer
    from consistencytta_tpu.training.step import (
        TrainState,
        build_consistency_train_step,
        build_guided_train_step,
        build_guided_validation_step,
        build_validation_step,
    )
    from consistencytta_tpu.io.checkpoints import load_checkpoint

    args = parse_args(argv)
    assert args.freeze_text_encoder, (
        "Text encoder finetuning has not been implemented; "
        "pass --freeze_text_encoder (reference train.py:362)."
    )
    # the noise-schedule constants (scaled_linear beta 0.00085->0.012, 1000
    # steps, v_prediction) are baked into PipelineConfig.scheduler; the
    # reference pulls them from this hub repo (train.py:69), so any other
    # value would silently train with the wrong schedule
    if args.scheduler_name != "stabilityai/stable-diffusion-2-1":
        raise ValueError(
            f"--scheduler_name {args.scheduler_name!r} is not supported: the "
            "SD-2.1 schedule constants are built in "
            "(stabilityai/stable-diffusion-2-1)"
        )
    if args.output_dir is None:
        args.output_dir = f"saved/stage{args.stage}_run"
    append_config_replay(args.output_dir, args)

    seed = args.seed if args.seed is not None else 0
    config = build_pipeline_config(args)
    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    pipeline = Pipeline.create(config, dtype=dtype)

    params = load_frozen_and_roles(
        pipeline,
        tango_model=args.tango_model,
        stage1_model=args.stage1_model,
        vae_checkpoint=args.vae_checkpoint,
        random_init_rng=jax.random.PRNGKey(seed) if args.random_init else None,
        text_len=args.text_len,
    )
    frozen = PipelineParams(
        teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
        t5=params.t5,
    )

    # data
    tokenizer = load_tokenizer(args.text_encoder_name, vocab_size=config.t5.vocab_size)
    devices = jax.devices()
    if args.num_devices is not None:
        if not 1 <= args.num_devices <= len(devices):
            raise ValueError(
                f"--num_devices {args.num_devices} out of range "
                f"(1..{len(devices)} local devices)"
            )
        devices = devices[: args.num_devices]
    n_dev = len(devices)
    mesh = make_mesh(devices=devices)
    global_batch = (
        args.per_device_train_batch_size * n_dev * args.gradient_accumulation_steps
    )
    train_ds = T2ADataset.from_json(
        args.train_file, args.text_column, args.audio_column, args.num_examples,
        prefix=args.prefix, segment_length=config.segment_samples,
    )
    val_ds = T2ADataset.from_json(
        args.validation_file, args.text_column, args.audio_column,
        prefix=args.prefix, segment_length=config.segment_samples,
    )

    clap_tok = None
    clap_sd = None
    clap_cfgs = (None, None)  # (HTSATConfig, RobertaConfig)
    if args.loss_type == "clap":
        # stage-3: load the CLAP checkpoint up front — structural dims infer
        # from its tensor shapes so any laion_clap-format checkpoint (incl.
        # tiny test ones) works, and the tokenizer is bounded by the text
        # tower's actual vocab. HF RoBERTa when resolvable, hash fallback
        # offline — never None (None used to surface as
        # KeyError('clap_text_ids') mid-step).
        from consistencytta_tpu.evaluation.clap_model import infer_clap_configs
        from consistencytta_tpu.io.torch_import import load_torch_state_dict
        from consistencytta_tpu.text.tokenizer import load_clap_tokenizer

        if not os.path.exists(args.clap_checkpoint):
            raise FileNotFoundError(
                f"--loss_type clap needs --clap_checkpoint; "
                f"{args.clap_checkpoint} does not exist "
                "(see tools/fetch_checkpoints.sh)"
            )
        clap_sd = load_torch_state_dict(args.clap_checkpoint)
        clap_cfgs = infer_clap_configs(clap_sd)
        clap_tok = load_clap_tokenizer(vocab_size=clap_cfgs[1].vocab_size)

    def make_train_loader(epoch):
        return DataLoader(
            train_ds, tokenizer, global_batch, args.text_len,
            augment=args.augment, shuffle=True, seed=seed + epoch,
            clap_tokenizer=clap_tok,
        )

    def make_eval_loader():
        return DataLoader(
            val_ds, tokenizer, args.per_device_eval_batch_size * n_dev,
            args.text_len, augment=False, shuffle=False, seed=seed,
            clap_tokenizer=clap_tok,
        )

    # optimizer
    steps_per_epoch = max(len(train_ds) // global_batch, 1)
    max_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch
    tx = make_optimizer(optimizer_config_from_args(args, max_steps))

    # steps
    if args.stage == 1:
        if args.use_lora:
            raise ValueError("--use_lora applies to stage 2/3 only")
        sched = schedule_from_args(args, config.scheduler)
        step_cfg1 = guided_step_config_from_args(args)
        step_fn = build_guided_train_step(pipeline, sched, tx, step_cfg1)
        validate_fn = jax.jit(
            build_guided_validation_step(pipeline, sched, step_cfg1)
        )
        state = TrainState.create(params, tx, with_target=False)
    else:
        sched = schedule_from_args(args, config.scheduler)
        step_cfg = consistency_step_config_from_args(args)

        loss_override = None
        # one clip policy for every CLAP-tower consumer (plain stage-3 loss
        # and the FTVAE step must clip audio identically)
        clip_seconds = min(10.0, config.segment_samples / config.sample_rate)
        if args.loss_type == "clap":
            from consistencytta_tpu.evaluation.clap_model import (
                convert_clap_audio,
                convert_clap_text,
            )
            from consistencytta_tpu.training.clap_loss import build_clap_loss

            # towers ride in frozen.clap_audio/clap_text (jit arguments) —
            # closing them into the step overflows AOT compile requests
            loss_override = build_clap_loss(
                pipeline, None, None,
                htsat_config=clap_cfgs[0], roberta_config=clap_cfgs[1],
                clip_seconds=clip_seconds,
            )
            frozen = dataclasses.replace(
                frozen,
                clap_audio=convert_clap_audio(clap_sd, clap_cfgs[0]),
                clap_text=convert_clap_text(clap_sd, clap_cfgs[1]),
            )

        if args.use_lora and args.finetune_vae:
            raise ValueError("--use_lora and --finetune_vae are exclusive")

        if args.use_lora:
            # LoRA fine-tune: only rank-4 A/B factors train; the base student
            # weights ride in frozen.student (training/lora.py)
            from consistencytta_tpu.training.lora import (
                build_lora_consistency_train_step,
                init_lora_params,
            )

            step_fn = build_lora_consistency_train_step(
                pipeline, sched, tx, step_cfg, loss_fn_override=loss_override
            )
        elif args.loss_type == "clap" and args.finetune_vae:
            from consistencytta_tpu.training.ftvae import (
                FTVAETrainState,
                build_ftvae_train_step,
            )

            # towers ride in frozen.clap_audio/clap_text
            step_fn = build_ftvae_train_step(
                pipeline, sched, tx, step_cfg,
                htsat_config=clap_cfgs[0], roberta_config=clap_cfgs[1],
                clip_seconds=clip_seconds,
            )
        else:
            step_fn = build_consistency_train_step(
                pipeline, sched, tx, step_cfg, loss_fn_override=loss_override
            )

        # 4-loss validation runs for both solver recipes (the reference
        # validates regardless of --use_edm, tools/train_utils.py:84-139).
        if args.use_lora:
            # merge the LoRA factors into the frozen base student before the
            # full-params validation (the reference validates LoRA runs too,
            # tools/train_utils.py:84-139)
            from consistencytta_tpu.training.lora import merge_lora

            base_validate = build_validation_step(pipeline, sched, step_cfg)

            def lora_validate(state, frozen, batch, rng):
                merged = dataclasses.replace(
                    state,
                    student_target=merge_lora(
                        frozen.student, state.student_target
                    ),
                )
                return base_validate(merged, frozen, batch, rng)

            validate_fn = jax.jit(lora_validate)
        elif args.loss_type == "clap" and args.finetune_vae:
            from consistencytta_tpu.training.ftvae import (
                build_ftvae_validation_step,
            )

            validate_fn = jax.jit(
                build_ftvae_validation_step(pipeline, sched, step_cfg)
            )
        else:
            validate_fn = jax.jit(build_validation_step(pipeline, sched, step_cfg))

        if args.use_lora:
            lora0 = init_lora_params(
                params.student, rng=jax.random.PRNGKey(seed)
            )
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                student=lora0,
                student_target=jax.tree_util.tree_map(jnp.array, lora0),
                student_ema=jax.tree_util.tree_map(jnp.array, lora0),
                opt_state=tx.init(lora0),
            )
            frozen = dataclasses.replace(
                frozen, student=params.student
            )  # LoRA base weights; preserves clap towers when present
        elif args.loss_type == "clap" and args.finetune_vae:
            from consistencytta_tpu.training.ftvae import FTVAETrainState

            state = FTVAETrainState.create(params, tx)
        else:
            state = TrainState.create(params, tx)

    # ZeRO-1: optimizer state + EMA shadows shard over the data axis
    step_fn = sharded_step(step_fn, mesh, donate_state=True, state_example=state)
    state = shard_train_state(state, mesh)
    frozen = device_put_replicated(frozen, mesh)

    if args.resume_from_checkpoint:
        state, _, _ = load_checkpoint(
            args.resume_from_checkpoint, state_template=jax.device_get(state)
        )
        # re-apply ZeRO-1 placement: restoring on host and replicating would
        # undo the optimizer/EMA sharding and OOM a multi-chip resume
        state = shard_train_state(state, mesh)

    step_ckpt_every = (
        int(args.checkpointing_steps)
        if str(args.checkpointing_steps).isdigit()
        else None
    )
    loop_cfg = LoopConfig(
        num_epochs=args.num_train_epochs,
        output_dir=args.output_dir,
        save_every=args.save_every,
        eval_batches=max(100 // (args.per_device_eval_batch_size * n_dev), 1),
        starting_epoch=args.starting_epoch,
        seed=seed,
        max_steps=args.max_train_steps,
        save_best=args.checkpointing_steps == "best",
        step_checkpoint_every=step_ckpt_every,
        use_wandb=args.with_tracking,
        wandb_kwargs={"project": "consistencytta_tpu", "config": vars(args)},
    )
    train_loop(
        step_fn, validate_fn, state, frozen, make_train_loader, make_eval_loader,
        loop_cfg, mesh=mesh, pipeline_config=config,
    )


if __name__ == "__main__":
    main()
