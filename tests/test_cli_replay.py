"""CLI flag plumbing: full config replay at inference, --prefix, the
CLAP tokenizer fallback, and --uncondition wiring."""

import numpy as np


class TestConfigReplay:
    """cli/inference replays the WHOLE saved flag namespace (the reference's
    inference.py:114 dotdict replay), with explicit command-line flags
    taking precedence and run-local paths excluded."""

    def _args(self, argv):
        from cli.inference import parse_args

        return parse_args(argv)

    def test_replay_fills_unset_flags(self):
        from cli.inference import apply_config_replay

        args = self._args(["--model", "m"])
        replay = {
            "use_bf16": True, "use_ema": True, "num_steps": 3,
            "use_edm": True, "text_len": 32, "stage": 2,
            "pipeline_config": "tiny",
        }
        apply_config_replay(args, replay)
        assert args.use_bf16 is True
        assert args.use_ema is True
        assert args.num_steps == 3
        assert args.use_edm is True
        assert args.text_len == 32
        assert args.pipeline_config == "tiny"

    def test_explicit_flags_beat_replay(self):
        from cli.inference import apply_config_replay

        args = self._args(["--model", "m", "--num_steps", "2", "--text_len", "64"])
        apply_config_replay(args, {"num_steps": 9, "text_len": 16, "use_ema": True})
        assert args.num_steps == 2
        # explicitly passing the default still wins over replay
        assert args.text_len == 64
        assert args.use_ema is True  # not explicit -> replayed

    def test_run_local_keys_never_replayed(self):
        from cli.inference import apply_config_replay

        args = self._args(["--model", "m", "--output_dir", "out_here"])
        apply_config_replay(args, {
            "model": "elsewhere", "output_dir": "train_dir",
            "test_file": "train.json", "seed": 123,
            # run-local semantics: a --random_init smoke-train summary must
            # not silently random-initialize a real inference run, and the
            # TRAIN manifest's column names don't describe the TEST manifest
            "random_init": True, "text_column": "train_caps",
            "audio_column": "train_loc",
        })
        assert args.model == "m"
        assert args.output_dir == "out_here"
        assert args.test_file != "train.json"
        assert args.seed == 0  # eval protocol pins its own seed
        assert args.random_init is False
        assert args.text_column == "captions"
        assert args.audio_column == "location"

    def test_training_prefix_replays_to_inference(self):
        """A training --prefix must reach the test prompts (the reference
        prepends train_args.prefix at inference, inference.py:172-180)."""
        from cli.inference import apply_config_replay

        args = self._args(["--model", "m"])
        apply_config_replay(args, {"prefix": "sound of "})
        assert args.prefix == "sound of "
        # explicit inference-side --prefix still wins
        args2 = self._args(["--model", "m", "--prefix", "audio: "])
        apply_config_replay(args2, {"prefix": "sound of "})
        assert args2.prefix == "audio: "


class TestPrefix:
    def test_prefix_prepends_captions(self, tmp_path):
        import json

        from consistencytta_tpu.training.data import T2ADataset

        manifest = tmp_path / "d.json"
        with open(manifest, "w") as f:
            f.write(json.dumps({"captions": "a dog barks", "location": "x.wav"}) + "\n")
        ds = T2ADataset.from_json(str(manifest), prefix="sound of ")
        assert ds.captions == ["sound of a dog barks"]
        ds2 = T2ADataset.from_json(str(manifest))
        assert ds2.captions == ["a dog barks"]


class TestClapTokenizerFallback:
    def test_hash_clap_tokenizer_interface(self):
        from consistencytta_tpu.text.tokenizer import HashClapTokenizer

        tok = HashClapTokenizer(vocab_size=120)
        enc = tok(["a dog barks", ""], padding="max_length", truncation=True,
                  max_length=10, return_tensors="np")
        ids, mask = enc["input_ids"], enc["attention_mask"]
        assert ids.shape == (2, 10) and mask.shape == (2, 10)
        assert ids.max() < 120 and ids.min() >= 0
        # RoBERTa special-token layout: bos 0 ... eos 2, pad 1
        assert ids[0, 0] == 0 and ids[1, 0] == 0
        assert ids[1, 1] == 2  # empty prompt: bos + eos
        assert (ids[0][mask[0] == 0] == 1).all()

    def test_load_clap_tokenizer_never_none_and_bounded(self):
        from consistencytta_tpu.text.tokenizer import load_clap_tokenizer

        tok = load_clap_tokenizer(vocab_size=120)
        assert tok is not None
        enc = tok(["some caption"], padding="max_length", truncation=True,
                  max_length=8, return_tensors="np")
        assert enc["input_ids"].max() < 120


class TestUncondition:
    def test_uncondition_swaps_text_condition(self):
        """cfg.uncondition=True: ~10% of samples train with the uncond
        tokenization (the reference parses --uncondition but raises
        NotImplementedError, audio_consistency_model.py:303-304)."""
        import jax
        import jax.numpy as jnp

        from consistencytta_tpu.training.step import ConsistencyStepConfig

        # replicate the swap logic at the batch level
        cfg = ConsistencyStepConfig(uncondition=True)
        assert cfg.uncondition
        b = 2000
        rng, r_drop = jax.random.split(jax.random.PRNGKey(0))
        drop = jax.random.bernoulli(r_drop, 0.1, (b, 1))
        frac = float(jnp.mean(drop.astype(jnp.float32)))
        assert 0.07 < frac < 0.13
