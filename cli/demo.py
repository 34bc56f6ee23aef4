"""Interactive demo REPL: prompt -> 1-step student + multi-step teacher
generation with wall-clock comparison (reference demo.py:57-138)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ConsistencyTTA-TPU demo")
    p.add_argument("--original_args", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--vae_checkpoint", type=str, default=None)
    p.add_argument("--unet_model_config", type=str, default=None)
    p.add_argument("--text_encoder_name", type=str, default="google/flan-t5-large")
    p.add_argument("--guidance_scale_input", type=float, default=4.0)
    p.add_argument("--num_teacher_steps", type=int, default=18)
    p.add_argument("--use_bf16", action="store_true")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", type=str, default="demo_outputs")
    p.add_argument("--skip_teacher", action="store_true")
    p.add_argument("--text_len", type=int, default=64)
    return p.parse_args(argv)


def main(argv=None):
    from cli.common import build_pipeline_config, load_frozen_and_roles, read_config_replay
    from consistencytta_tpu.inference.generate import (
        GenerateConfig,
        build_generate_fn,
        build_teacher_generate_fn,
    )
    from consistencytta_tpu.io.audio import write_wav
    from consistencytta_tpu.models.pipeline import Pipeline
    from consistencytta_tpu.text.tokenizer import load_tokenizer, tokenize_with_uncond

    args = parse_args(argv)
    if args.original_args:
        replay = read_config_replay(args.original_args)
        if "unet_model_config" in replay and not args.unet_model_config:
            args.unet_model_config = replay["unet_model_config"]

    config = build_pipeline_config(args)
    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    pipeline = Pipeline.create(config, dtype=dtype)
    params = load_frozen_and_roles(
        pipeline,
        model_path=args.model,
        vae_checkpoint=args.vae_checkpoint,
        random_init_rng=jax.random.PRNGKey(args.seed) if args.random_init else None,
        text_len=args.text_len,
    )

    generate = build_generate_fn(pipeline, GenerateConfig(num_steps=1))
    teacher_generate = (
        None if args.skip_teacher
        else build_teacher_generate_fn(pipeline, args.num_teacher_steps)
    )
    tokenizer = load_tokenizer(args.text_encoder_name, vocab_size=config.t5.vocab_size)
    os.makedirs(args.output_dir, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    count = 0
    print("Enter a prompt (empty line to quit):")
    for line in sys.stdin:
        prompt = line.strip()
        if not prompt:
            break
        ids, mask, uids, umask = tokenize_with_uncond(
            tokenizer, [prompt], args.text_len
        )
        rng, r1, r2 = jax.random.split(rng, 3)

        t0 = time.time()
        wav = np.asarray(jax.block_until_ready(generate(
            params, ids, mask, uids, umask, r1,
            np.float32(args.guidance_scale_input),
        )))
        t_student = time.time() - t0
        path = os.path.join(args.output_dir, f"student_{count}.wav")
        write_wav(path, wav[0], config.sample_rate)
        print(f"  1-step student: {t_student:.3f}s -> {path}")

        if teacher_generate is not None:
            t0 = time.time()
            tea = np.asarray(jax.block_until_ready(teacher_generate(
                params, ids, mask, uids, umask, r2,
                np.float32(args.guidance_scale_input),
            )))
            t_teacher = time.time() - t0
            path = os.path.join(args.output_dir, f"teacher_{count}.wav")
            write_wav(path, tea[0], config.sample_rate)
            print(
                f"  {args.num_teacher_steps}-step teacher: {t_teacher:.3f}s "
                f"({t_teacher / max(t_student, 1e-9):.1f}x slower) -> {path}"
            )
        count += 1
        print("Enter a prompt (empty line to quit):")


if __name__ == "__main__":
    main()
