"""Stage-3 CLAP fine-tune loss: differentiable decode -> CLAP graph."""

import pytest

pytestmark = pytest.mark.slow  # CLAP-loss grad graph is compile-bound

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.evaluation.clap_model import (
    CLAPAudioTower,
    CLAPMelFrontend,
    CLAPTextTower,
    HTSATConfig,
    RobertaConfig,
)
from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import make_heun_schedule
from consistencytta_tpu.training.clap_loss import build_clap_loss
from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
from consistencytta_tpu.training.step import (
    ConsistencyStepConfig,
    TrainState,
    build_consistency_train_step,
)
from tests.test_training import make_batch
from tests.tiny import cached_init_params, tiny_config

TINY_HTSAT = HTSATConfig(
    spec_size=128, patch_size=4, patch_stride=4, embed_dim=16,
    depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2), window_size=4, mel_bins=32,
)
TINY_ROBERTA = RobertaConfig(
    vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
    intermediate_size=64, max_position_embeddings=40,
)


@pytest.fixture(scope="module")
def setup():
    pipeline = Pipeline.create(tiny_config())
    params = cached_init_params(pipeline, text_len=8)
    frozen = PipelineParams(
        teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
        t5=params.t5,
    )
    key = jax.random.PRNGKey(1)
    clip_seconds = tiny_config().segment_samples / 16000

    audio_tower = CLAPAudioTower(TINY_HTSAT)
    frontend = CLAPMelFrontend(TINY_HTSAT)
    dummy_mel = frontend(jnp.zeros((1, int(48000 * clip_seconds))))
    audio_params = jax.jit(audio_tower.init)(key, dummy_mel)["params"]
    text_tower = CLAPTextTower(TINY_ROBERTA)
    text_params = jax.jit(text_tower.init)(
        key, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    return pipeline, params, frozen, audio_params, text_params, clip_seconds


class TestClapLoss:
    def test_frozen_threaded_towers_match_closure(self, setup, rng):
        """The stage-3 CLI threads the CLAP towers through frozen.clap_* as
        jit ARGUMENTS (closing GB-scale trees into the step overflows AOT
        compile requests); the loss must be identical either way."""
        import dataclasses

        pipeline, params, frozen, audio_params, text_params, clip_s = setup
        closure_loss = build_clap_loss(
            pipeline, audio_params, text_params,
            htsat_config=TINY_HTSAT, roberta_config=TINY_ROBERTA,
            clip_seconds=clip_s,
        )
        threaded_loss = build_clap_loss(
            pipeline,
            htsat_config=TINY_HTSAT, roberta_config=TINY_ROBERTA,
            clip_seconds=clip_s,
        )
        frozen_threaded = dataclasses.replace(
            frozen, clap_audio=audio_params, clap_text=text_params
        )
        pred = jnp.asarray(
            rng.standard_normal((2,) + pipeline.latent_shape(1)[1:]), jnp.float32
        )
        target = pred * 0.9
        micro = {
            "wav": jnp.asarray(
                rng.standard_normal(
                    (2, tiny_config().segment_samples)
                ) * 0.1, jnp.float32,
            ),
            "clap_text_ids": jnp.asarray(
                rng.integers(2, 128, size=(2, 8)), jnp.int32
            ),
            "clap_text_mask": jnp.ones((2, 8), jnp.int32),
        }
        a = closure_loss(pred, target, frozen, micro)
        b = threaded_loss(pred, target, frozen_threaded, micro)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_stage3_step_runs_and_differs_from_mse(self, setup, rng):
        pipeline, params, frozen, audio_params, text_params, clip_s = setup
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-4, num_warmup_steps=0))

        clap_loss = build_clap_loss(
            pipeline, audio_params, text_params,
            htsat_config=TINY_HTSAT, roberta_config=TINY_ROBERTA,
            clip_seconds=clip_s,
        )
        step_clap = jax.jit(
            build_consistency_train_step(
                pipeline, sched, tx, ConsistencyStepConfig(),
                loss_fn_override=clap_loss,
            )
        )
        step_mse = jax.jit(
            build_consistency_train_step(pipeline, sched, tx, ConsistencyStepConfig())
        )

        batch = make_batch(rng, b=2, text_len=8)
        batch["clap_text_ids"] = rng.integers(2, 128, size=(2, 8)).astype(np.int32)
        batch["clap_text_mask"] = np.ones((2, 8), np.int32)

        state = TrainState.create(params, tx)
        state1, m_clap = step_clap(state, frozen, batch, jax.random.PRNGKey(0))
        _, m_mse = step_mse(state, frozen, batch, jax.random.PRNGKey(0))

        l_clap, l_mse = float(m_clap["loss"]), float(m_mse["loss"])
        assert np.isfinite(l_clap) and np.isfinite(l_mse)
        # clap term adds 0.1 * (2 - cos - cos) on top of the mse component
        assert abs(l_clap - l_mse) > 1e-6
        # params moved
        d = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(lambda a, b: a - b, state1.student, state.student),
            0.0,
        )
        assert d > 0


class TestFTVAEStep:
    """Stage-3 FTVAE variant: trainable VAE decoder + student, CLAP loss,
    EMA decoder pair (reference audio_consistency_model_ftvae.py:52-113)."""

    def test_ftvae_step_trains_decoder_and_updates_ema(self, setup, rng):
        import dataclasses

        from consistencytta_tpu.training.ftvae import (
            FTVAETrainState,
            build_ftvae_train_step,
        )

        pipeline, params, frozen, audio_params, text_params, clip_s = setup
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-2, num_warmup_steps=0))

        # towers threaded through frozen (the production AOT-safe path)
        frozen_t = dataclasses.replace(
            frozen, clap_audio=audio_params, clap_text=text_params
        )
        # ema_decay 0.5 so the one-step EMA delta is visible in fp32 (at
        # the production 0.999 the delta of a tiny-config step underflows
        # a float32 lerp — as it would in the reference's torch lerp)
        step = jax.jit(
            build_ftvae_train_step(
                pipeline, sched, tx, ConsistencyStepConfig(ema_decay=0.5),
                htsat_config=TINY_HTSAT, roberta_config=TINY_ROBERTA,
                clip_seconds=clip_s,
            )
        )
        state = FTVAETrainState.create(params, tx)

        batch = make_batch(rng, b=2, text_len=8)
        batch["clap_text_ids"] = rng.integers(2, 128, size=(2, 8)).astype(np.int32)
        batch["clap_text_mask"] = np.ones((2, 8), np.int32)

        state2, metrics = step(state, frozen_t, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

        def moved(a, b):
            return sum(
                float(jnp.abs(x - y).sum())
                for x, y in zip(
                    jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
                )
            )

        assert moved(state2.student, state.student) > 0  # unet trained
        assert moved(state2.vae_dec, state.vae_dec) > 0  # decoder trained
        # EMA decoder tracked the update (decay < 1 moves it strictly less)
        d_ema = moved(state2.vae_dec_ema, state.vae_dec_ema)
        d_dec = moved(state2.vae_dec, state.vae_dec)
        assert 0 < d_ema < d_dec
