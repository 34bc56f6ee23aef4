"""Batch test-set generation + evaluation CLI.

TPU-native equivalent of reference inference.py: replays train flags from
summary.jsonl, generates the test set batch-wise through the single jitted
graph, writes wavs, and (optionally) runs the evaluation harness.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _build_parser():
    p = argparse.ArgumentParser(description="ConsistencyTTA-TPU inference")
    p.add_argument("--original_args", type=str, default=None,
                   help="summary.jsonl from training (config replay)")
    p.add_argument("--model", type=str, default=None,
                   help="pytorch_model_2.bin or orbax checkpoint dir")
    p.add_argument("--vae_checkpoint", type=str, default=None)
    p.add_argument("--unet_model_config", type=str, default=None)
    p.add_argument("--pipeline_config", type=str, default=None,
                   help='pipeline base config: "tiny" or a config json path')
    p.add_argument("--test_file", type=str, default="data/test_audiocaps_subset.json")
    p.add_argument("--test_references", type=str, default=None)
    p.add_argument("--text_column", type=str, default="captions")
    p.add_argument("--audio_column", type=str, default="location")
    p.add_argument("--prefix", type=str, default=None,
                   help="prepended to every test prompt; a training --prefix "
                        "replays here automatically (reference "
                        "inference.py:172-180)")
    p.add_argument("--text_encoder_name", type=str, default="google/flan-t5-large")
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--guidance_scale_input", type=float, default=4.0)
    p.add_argument("--guidance_scale_post", type=float, default=1.0)
    p.add_argument("--num_steps", type=int, default=1)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--use_edm", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--use_bf16", action="store_true")
    p.add_argument("--query_teacher", action="store_true",
                   help="also generate with the multi-step teacher")
    p.add_argument("--num_teacher_steps", type=int, default=18)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--text_len", type=int, default=64)
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--no_save_mels", action="store_true",
                   help="skip writing the all_mels.npz artifact (the "
                        "reference always saves all_mels.pt, "
                        "inference.py:222-232)")
    return p


def parse_args(argv=None):
    p = _build_parser()
    args = p.parse_args(argv)
    # which flags the user explicitly typed (vs defaults): re-parse with
    # suppressed defaults — explicit flags take precedence over the
    # --original_args config replay
    for action in p._actions:
        action.default = argparse.SUPPRESS
    args._explicit = set(vars(p.parse_args(argv)))
    return args


# inference-run-local keys never taken from a replayed config (the eval
# protocol pins its own seed, reference inference.sh). random_init and the
# manifest schema columns are run-local too: a --random_init smoke-train
# summary must not silently random-initialize a real inference run, and the
# TRAIN manifest's column names don't describe the TEST manifest.
_REPLAY_EXCLUDE = {
    "original_args", "model", "output_dir", "skip_eval", "no_save_mels",
    "test_file", "test_references", "seed",
    "random_init", "text_column", "audio_column",
}


def apply_config_replay(args, replay: dict):
    """Copy the whole saved flag namespace onto `args` (the reference's
    full-namespace replay, inference.py:114), skipping run-local paths and
    anything the user passed explicitly on this command line."""
    explicit = getattr(args, "_explicit", set())
    for key, val in replay.items():
        if key in _REPLAY_EXCLUDE or key in explicit:
            continue
        if hasattr(args, key):
            setattr(args, key, val)
    return args


def generate_config_from_args(args):
    """args -> the static GenerateConfig baked into the stage-2/3 jitted
    graph (reference inference.py:154-170 scheduler/ema/CFG selection).
    Module-level so the behavioral flag audit can assert each eval flag
    lands in the compiled-graph config (tests/test_flag_audit.py)."""
    from consistencytta_tpu.inference.generate import GenerateConfig

    return GenerateConfig(
        num_steps=args.num_steps,
        guidance_post=args.guidance_scale_post,
        use_ema=args.use_ema,
        use_edm=args.use_edm,
    )


def main(argv=None):
    from cli.common import (
        build_pipeline_config,
        load_frozen_and_roles,
        read_config_replay,
    )
    from consistencytta_tpu.inference.generate import (
        build_generate_fn,
        build_teacher_generate_fn,
    )
    from consistencytta_tpu.io.audio import write_wav
    from consistencytta_tpu.models.pipeline import Pipeline
    from consistencytta_tpu.text.tokenizer import load_tokenizer, tokenize_with_uncond
    from consistencytta_tpu.training.data import T2ADataset

    args = parse_args(argv)
    if args.original_args:
        replay = read_config_replay(args.original_args)
        # reference inference.py:124: an explicitly-passed stage must match
        # the training run's stage (a silent mismatch would sample a guided
        # student with the consistency path or vice versa)
        if "stage" in getattr(args, "_explicit", set()) and "stage" in replay:
            assert args.stage == replay["stage"], (
                "Stage mismatch between training and eval."
            )
        apply_config_replay(args, replay)

    config = build_pipeline_config(args)
    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    pipeline = Pipeline.create(config, dtype=dtype)

    # load_frozen_and_roles handles both torch .bin and orbax checkpoint dirs
    params = load_frozen_and_roles(
        pipeline,
        model_path=args.model,
        vae_checkpoint=args.vae_checkpoint,
        random_init_rng=jax.random.PRNGKey(args.seed) if args.random_init else None,
        text_len=args.text_len,
    )

    if args.stage == 1:
        # AudioGDM inference: multi-step iterative denoising with the
        # guided student (reference inference.py:125, audio_guided_model.py:171-244)
        from consistencytta_tpu.inference.generate import (
            build_guided_student_generate_fn,
        )

        generate = build_guided_student_generate_fn(
            pipeline,
            num_steps=args.num_steps,
            guidance_post=args.guidance_scale_post,
            use_ema=args.use_ema,
            use_edm=args.use_edm,
        )
    else:
        generate = build_generate_fn(pipeline, generate_config_from_args(args))
    teacher_generate = (
        build_teacher_generate_fn(pipeline, args.num_teacher_steps, args.use_edm)
        if args.query_teacher
        else None
    )

    dataset = T2ADataset.from_json(
        args.test_file, args.text_column, args.audio_column,
        prefix=args.prefix, segment_length=config.segment_samples,
    )
    tokenizer = load_tokenizer(args.text_encoder_name, vocab_size=config.t5.vocab_size)
    os.makedirs(args.output_dir, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    all_names, t_total = [], 0.0
    caption_map = {}
    b = args.batch_size

    # all_mels artifact (the reference saves generated mels alongside the
    # wavs and feeds mel_path to eval, inference.py:222-232). Stored mels
    # are the EVAL-protocol normalized log-mels of the written files, so
    # the harness fast path is bit-identical to its recompute path.
    save_mels = not args.no_save_mels
    mel_names, mel_arrays = [], []
    if save_mels:
        from consistencytta_tpu.evaluation.harness import (
            eval_mel_frontend,
            load_wav_16k,
            normalized_logmel,
        )

        mel_frontend = eval_mel_frontend()

    for start in range(0, len(dataset), b):
        caps = dataset.captions[start : start + b]
        if args.num_samples > 1:
            caps = [c for c in caps for _ in range(args.num_samples)]
        pad = b * args.num_samples - len(caps)
        caps_padded = caps + [""] * pad
        ids, mask, uids, umask = tokenize_with_uncond(
            tokenizer, caps_padded, args.text_len
        )
        rng, step_rng = jax.random.split(rng)
        t0 = time.time()
        wav = generate(
            params, ids, mask, uids, umask, step_rng,
            np.float32(args.guidance_scale_input),
        )
        wav = np.asarray(jax.block_until_ready(wav))
        t_total += time.time() - t0

        batch_names = []
        for i in range(len(caps)):
            prompt_idx = start + i // args.num_samples
            sample_idx = i % args.num_samples
            src = os.path.basename(dataset.paths[prompt_idx])
            name = src if src.endswith(".wav") else f"output_{prompt_idx}.wav"
            if args.num_samples > 1:
                name = f"{name[:-4]}_s{sample_idx}.wav"
            out_path = os.path.join(args.output_dir, name)
            write_wav(out_path, wav[i], config.sample_rate)
            caption_map[name] = caps[i]
            batch_names.append(name)
            if save_mels:
                mel_names.append(name)
                mel_arrays.append(
                    normalized_logmel(load_wav_16k(out_path, 1000), mel_frontend)
                )
        all_names.extend(batch_names)

        if teacher_generate is not None:
            rng, tea_rng = jax.random.split(rng)
            tea_wav = np.asarray(
                teacher_generate(
                    params, ids, mask, uids, umask, tea_rng,
                    np.float32(args.guidance_scale_input),
                )
            )
            tea_dir = args.output_dir + "_teacher"
            os.makedirs(tea_dir, exist_ok=True)
            for i, name in enumerate(batch_names):
                write_wav(
                    os.path.join(tea_dir, name), tea_wav[i], config.sample_rate
                )

    print(f"Generated {len(all_names)} clips in {t_total:.1f}s "
          f"({len(all_names) / max(t_total, 1e-9):.2f} clips/s)")

    mel_npz = None
    if save_mels and mel_names:
        mel_npz = os.path.join(args.output_dir, "all_mels.npz")
        np.savez(
            mel_npz,
            names=np.array(mel_names),
            mels=np.stack(mel_arrays),
            target_centisec=1000,
        )

    result = {"num_clips": len(all_names), "gen_seconds": t_total}
    if args.test_references and not args.skip_eval:
        from consistencytta_tpu.evaluation.harness import EvaluationHelper

        helper = EvaluationHelper(sampling_rate=config.sample_rate)
        metrics = helper.main(
            args.output_dir, args.test_references, captions=caption_map,
            mel_path=mel_npz,
        )
        result.update(metrics)
        print(json.dumps(metrics, indent=2))

    with open(os.path.join(args.output_dir, "summary.jsonl"), "a") as f:
        f.write(json.dumps({**vars(args), **result}, default=str) + "\n")


if __name__ == "__main__":
    main()
