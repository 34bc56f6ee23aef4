"""End-to-end CLI chain test: stage 1 -> stage 2 -> stage 3 handoff ->
inference, through on-disk orbax checkpoints at the tiny config.

This is the executable equivalent of recipes/train.sh (reference
train.sh:18-46 + inference.py): each stage consumes the previous stage's
checkpoint directory exactly the way the recipe wires them
(`--stage1_model saved/stage1/best`, `--stage1_model saved/stage2/epoch_N`,
`--model <ckpt>`), so the loading-path surgeries (orbax handoff, tolerant
fan-out, config replay) are all exercised against real files.
"""

import glob
import json
import os

import numpy as np
import pytest

import cli.inference as cli_inference
import cli.train as cli_train
from consistencytta_tpu.io.audio import write_wav

SEG = 64 * 160  # tiny-config segment samples (0.64 s at 16 kHz)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("chain")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        path = str(wav_dir / f"clip_{i}.wav")
        write_wav(path, (rng.standard_normal(SEG) * 0.1).astype(np.float32), 16000)
        rows.append({"captions": f"a test sound number {i}", "location": path})
    manifest = str(root / "data.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return {"root": root, "manifest": manifest}


def _common_flags(workdir, out):
    return [
        # single-device: these tests prove checkpoint/handoff/replay wiring,
        # not sharding (test_zero1_identity + dryrun_multichip cover the
        # 8-device step); the 8-device sharded step costs ~50 s per variant
        # just to DESERIALIZE from the compile cache on this 1-core box
        "--num_devices", "1",
        "--freeze_text_encoder",
        "--pipeline_config", "tiny",
        "--train_file", workdir["manifest"],
        "--validation_file", workdir["manifest"],
        "--test_file", workdir["manifest"],
        "--per_device_train_batch_size", "1",
        "--per_device_eval_batch_size", "1",
        "--gradient_accumulation_steps", "1",
        "--num_train_epochs", "1",
        "--save_every", "1",
        "--num_diffusion_steps", "4",
        "--seed", "0",
        "--output_dir", str(out),
    ]


@pytest.mark.slow
def test_three_stage_chain_and_inference(workdir):
    root = workdir["root"]
    stage1_dir = root / "stage1"
    stage2_dir = root / "stage2"
    stage3_dir = root / "stage3"

    # stage 1: random init (the TANGO fan-out path is covered by
    # test_checkpoint_surgery), best checkpoint tracked on val_loss
    cli_train.main(
        ["--stage", "1", "--random_init", "--snr_gamma", "5"]
        + _common_flags(workdir, stage1_dir)
    )
    assert os.path.exists(stage1_dir / "best" / "state")
    assert os.path.exists(stage1_dir / "epoch_1" / "state")

    # stage 2 (EDM recipe): students seed from stage 1's orbax best ckpt —
    # the recipes/train.sh stage-2 handoff
    cli_train.main(
        ["--stage", "2", "--use_edm", "--random_init",
         "--stage1_model", str(stage1_dir / "best")]
        + _common_flags(workdir, stage2_dir)
    )
    assert os.path.exists(stage2_dir / "epoch_1" / "state")
    # 4-loss validation ran (DDIM/EDM validation both wired now)
    with open(stage2_dir / "summary.jsonl") as f:
        records = [json.loads(l) for l in f if l.strip()]
    assert any("loss_w_teacher" in r for r in records)

    # stage 3 handoff: stage 2's *epoch* orbax dir as --stage1_model (the
    # exact wiring that used to crash in torch.load); mse stands in for the
    # clap loss (CLAP ckpt assets are not available offline)
    cli_train.main(
        ["--stage", "2", "--use_edm", "--random_init",
         "--stage1_model", str(stage2_dir / "epoch_1"),
         "--loss_type", "mse"]
        + _common_flags(workdir, stage3_dir)
    )
    assert os.path.exists(stage3_dir / "epoch_1" / "state")

    # inference from the stage-3 orbax checkpoint
    out_dir = root / "outputs"
    cli_inference.main([
        "--model", str(stage3_dir / "epoch_1"),
        "--pipeline_config", "tiny",
        "--test_file", workdir["manifest"],
        "--batch_size", "8",
        "--num_steps", "1",
        "--output_dir", str(out_dir),
        "--skip_eval",
    ])
    wavs = glob.glob(str(out_dir / "*.wav"))
    assert len(wavs) == 8
    for w in wavs:
        from consistencytta_tpu.io.audio import read_wav_file

        data = read_wav_file(w, SEG, 16000)
        assert np.isfinite(data).all()

    # all_mels artifact written alongside the wavs (reference
    # inference.py:222-232 saves all_mels.pt)
    with np.load(str(out_dir / "all_mels.npz")) as z:
        assert len(z["names"]) == 8
        assert z["mels"].shape[0] == 8 and np.isfinite(z["mels"]).all()


@pytest.mark.slow
def test_lora_cli_train_validate_infer(workdir):
    """--use_lora as a product: train one step through the CLI (LoRA-tree
    TrainState), LoRA validation losses logged (merge into base before the
    4-loss validation, reference tools/train_utils.py:84-139), then
    cli/inference consumes the LoRA checkpoint via merge-at-load."""
    out = workdir["root"] / "lora"
    cli_train.main(
        ["--stage", "2", "--use_edm", "--random_init", "--use_lora",
         "--max_train_steps", "1"]
        + _common_flags(workdir, out)
    )
    assert os.path.exists(out / "best" / "state")
    with open(out / "summary.jsonl") as f:
        records = [json.loads(l) for l in f if l.strip()]
    assert any(r.get("step") == 1 for r in records)
    # LoRA validation ran: the 4 diagnostic losses are in the log
    assert any("loss_w_teacher" in r for r in records), (
        "LoRA runs must validate like full-param runs"
    )

    # inference from the LoRA orbax checkpoint: the loader merges the A/B
    # factors into the base student stored in the frozen tree
    out_dir = workdir["root"] / "lora_outputs"
    cli_inference.main([
        "--model", str(out / "best"),
        "--pipeline_config", "tiny",
        "--test_file", workdir["manifest"],
        "--batch_size", "8",
        "--num_steps", "1",
        "--output_dir", str(out_dir),
        "--skip_eval",
    ])
    wavs = glob.glob(str(out_dir / "*.wav"))
    assert len(wavs) == 8
    from consistencytta_tpu.io.audio import read_wav_file

    for w in wavs:
        assert np.isfinite(read_wav_file(w, SEG, 16000)).all()


@pytest.mark.slow
def test_stft_loss_cli(workdir):
    """--loss_type stft end-to-end through the CLI (the reference lists the
    stft loss but its implementation crashes on an unset self.sr,
    tools/losses.py:240-243; this one must actually train)."""
    out = workdir["root"] / "stft"
    cli_train.main(
        ["--stage", "2", "--use_edm", "--random_init",
         "--loss_type", "stft", "--max_train_steps", "1"]
        + _common_flags(workdir, out)
    )
    assert os.path.exists(out / "best" / "state")
    with open(out / "summary.jsonl") as f:
        records = [json.loads(l) for l in f if l.strip()]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_ftvae_clap_stage3_roundtrip(workdir):
    """Stage-3 FTVAE through the CLI with the real --loss_type clap branch
    (tiny CLAP checkpoint in the laion_clap key format + offline RoBERTa
    tokenizer fallback), then the round-trip the reference supports
    (models/audio_consistency_model_ftvae.py:69-91): the trained VAE decoder
    + EMA pair load back at inference and drive generation."""
    import jax

    from cli.common import load_frozen_and_roles
    from consistencytta_tpu.io.checkpoints import load_checkpoint
    from consistencytta_tpu.models.pipeline import Pipeline
    from tests.conftest import load_repo_tool
    from tests.tiny import tiny_config

    root = workdir["root"]
    clap_ckpt = str(root / "tiny_clap.pt")
    load_repo_tool("make_tiny_clap").write_tiny_clap_checkpoint(clap_ckpt)

    out = root / "ftvae"
    cli_train.main(
        ["--stage", "2", "--use_edm", "--random_init",
         "--loss_type", "clap", "--finetune_vae",
         "--clap_checkpoint", clap_ckpt,
         "--learning_rate", "1e-3",
         "--max_train_steps", "2"]
        + _common_flags(workdir, out)
    )
    ckpt = out / "best"
    assert os.path.exists(ckpt / "state")
    with open(out / "summary.jsonl") as f:
        records = [json.loads(l) for l in f if l.strip()]
    # FTVAE validation includes the trained-decoder health metric
    assert any("loss_decoder_mel" in r for r in records)

    # the loader merges the trained decoder into params.vae and exposes the
    # EMA pair as params.vae_ema
    state, frozen_tree, _ = load_checkpoint(str(ckpt))
    pipeline = Pipeline.create(tiny_config())
    params = load_frozen_and_roles(pipeline, model_path=str(ckpt))

    got = np.asarray(params.vae["decoder"]["conv_in"]["kernel"])
    trained = np.asarray(state["vae_dec"]["decoder"]["conv_in"]["kernel"])
    frozen_dec = np.asarray(frozen_tree["vae"]["decoder"]["conv_in"]["kernel"])
    np.testing.assert_array_equal(got, trained)
    assert np.abs(trained - frozen_dec).max() > 0, (
        "decoder did not train / loader returned the frozen decoder"
    )
    assert params.vae_ema is not None
    np.testing.assert_array_equal(
        np.asarray(params.vae_ema["decoder"]["conv_in"]["kernel"]),
        np.asarray(state["vae_dec_ema"]["decoder"]["conv_in"]["kernel"]),
    )

    # EMA shadow tracks but is not identical to the trained decoder
    assert (
        np.abs(
            trained - np.asarray(state["vae_dec_ema"]["decoder"]["conv_in"]["kernel"])
        ).max()
        > 0
    )

    # decode-level proof that use_ema_decoder routes through vae_ema: a
    # perturbed EMA pair must change the waveform; the real pair is finite
    z = jax.random.normal(jax.random.PRNGKey(0), pipeline.latent_shape(1))
    wav_trained = np.asarray(
        pipeline.decode_latents(params.vae, params.vocoder, z)
    )
    wav_ema = np.asarray(
        pipeline.decode_latents(
            params.vae, params.vocoder, z,
            vae_ema=params.vae_ema, use_ema_decoder=True,
        )
    )
    assert np.isfinite(wav_trained).all() and np.isfinite(wav_ema).all()
    perturbed = jax.tree_util.tree_map(lambda x: x + 0.05, params.vae_ema)
    wav_pert = np.asarray(
        pipeline.decode_latents(
            params.vae, params.vocoder, z,
            vae_ema=perturbed, use_ema_decoder=True,
        )
    )
    # relative to the signal scale (a random-init tiny vocoder emits ~1e-7
    # amplitudes, so an absolute threshold would be meaningless)
    assert np.abs(wav_trained - wav_pert).max() > np.abs(wav_trained).max()

    # full inference from the FTVAE checkpoint (--use_ema also selects the
    # EMA decoder, reference inference.py:204-206)
    out_dir = root / "ftvae_outputs"
    cli_inference.main([
        "--model", str(ckpt),
        "--pipeline_config", "tiny",
        "--test_file", workdir["manifest"],
        "--batch_size", "8",
        "--num_steps", "1",
        "--use_ema",
        "--output_dir", str(out_dir),
        "--skip_eval",
    ])
    wavs = glob.glob(str(out_dir / "*.wav"))
    assert len(wavs) == 8
    from consistencytta_tpu.io.audio import read_wav_file

    for w in wavs:
        assert np.isfinite(read_wav_file(w, SEG, 16000)).all()


@pytest.mark.slow
def test_resume_preserves_zero1_sharding(workdir, tmp_path):
    """Resume must re-apply ZeRO-1 placement, not replicate the optimizer
    state (cli/train.py resume path; an 8-chip resume would otherwise OOM)."""
    import jax

    from consistencytta_tpu.io.checkpoints import load_checkpoint, save_checkpoint
    from consistencytta_tpu.models.pipeline import Pipeline
    from consistencytta_tpu.ops.schedulers import make_heun_schedule
    from consistencytta_tpu.parallel.mesh import (
        DATA_AXIS,
        make_mesh,
        shard_train_state,
    )
    from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
    from consistencytta_tpu.training.step import TrainState
    from tests.tiny import cached_init_params, tiny_config

    pipeline = Pipeline.create(tiny_config())
    params = cached_init_params(pipeline, text_len=8)
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)

    mesh = make_mesh()
    state = shard_train_state(state, mesh)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state)

    # the CLI resume path: restore on host, then re-shard
    restored, _, _ = load_checkpoint(str(ckpt), state_template=jax.device_get(state))
    restored = shard_train_state(restored, mesh)

    shardings = [
        leaf.sharding for leaf in jax.tree_util.tree_leaves(restored.opt_state)
        if hasattr(leaf, "sharding")
    ]
    assert any(
        DATA_AXIS in (s.spec or ()) for s in shardings
    ), "optimizer state lost its ZeRO-1 sharding on resume"
    # and the restored values match the saved ones
    a = jax.tree_util.tree_leaves(jax.device_get(state.student))
    b = jax.tree_util.tree_leaves(jax.device_get(restored.student))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
