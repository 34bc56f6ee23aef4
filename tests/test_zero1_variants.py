"""ZeRO-1 sharding identity for every step variant cli/train.py ships.

test_zero1.py proves the stage-2 consistency step; production also runs
stage-1 (guided distillation), LoRA, and FTVAE steps under `sharded_step`
(cli/train.py). Each variant carries differently-shaped optimizer/EMA
trees — exactly where ZeRO-1 partitioning bugs hide — so each gets the
same replicated-vs-sharded one-step identity check on the 8-device CPU
mesh. Reference contract: the Accelerate-DDP step (train.py:268-272,
380-385) applied to each model variant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two sharded-step compiles per variant

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import make_ddpm_schedule, make_heun_schedule
from consistencytta_tpu.parallel.mesh import (
    device_put_batch,
    device_put_replicated,
    make_mesh,
    shard_train_state,
    sharded_step,
)
from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
from consistencytta_tpu.training.step import (
    ConsistencyStepConfig,
    GuidedStepConfig,
    TrainState,
    build_guided_train_step,
)
from tests.test_training import make_batch
from tests.tiny import cached_init_params, tiny_config


@pytest.fixture(scope="module")
def setup():
    pipeline = Pipeline.create(tiny_config())
    params = cached_init_params(pipeline, text_len=8)
    frozen = PipelineParams(
        teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
        t5=params.t5,
    )
    mesh = make_mesh()  # 8 devices on the data axis
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
    return pipeline, params, frozen, mesh, tx


def _one_step_both_ways(step_fn, state, frozen, batch, mesh):
    """Run one step replicated and one step ZeRO-1-sharded from the same
    initial state; return both results."""
    frozen_r = device_put_replicated(frozen, mesh)
    batch_d = device_put_batch(batch, mesh)

    step_rep = sharded_step(step_fn, mesh, donate_state=False)
    s_rep, m_rep = step_rep(
        device_put_replicated(state, mesh), frozen_r, batch_d,
        jax.random.PRNGKey(0),
    )

    step_z1 = sharded_step(
        step_fn, mesh, donate_state=False, state_example=state
    )
    s_z1, m_z1 = step_z1(
        shard_train_state(state, mesh), frozen_r, batch_d, jax.random.PRNGKey(0)
    )
    return (s_rep, m_rep), (s_z1, m_z1)


def _assert_identical(s_rep, m_rep, s_z1, m_z1, trainable_attr="student"):
    np.testing.assert_allclose(
        float(m_rep["loss"]), float(m_z1["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(getattr(s_rep, trainable_attr)),
        jax.tree_util.tree_leaves(getattr(s_z1, trainable_attr)),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )
    # the sharded run's shadows must actually be partitioned
    sharded_leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(s_z1)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no ZeRO-1-partitioned leaf in the sharded state"


class TestZero1Variants:
    def test_stage1_guided_step(self, setup, rng):
        """Stage-1 state has no target tree (with_target=False) — its
        optimizer/EMA pytrees differ structurally from stage 2."""
        pipeline, params, frozen, mesh, tx = setup
        sched = make_ddpm_schedule(pipeline.config.scheduler)
        step_fn = build_guided_train_step(
            pipeline, sched, tx, GuidedStepConfig(accum_steps=1)
        )
        state = TrainState.create(params, tx, with_target=False)
        batch = make_batch(rng, b=8, text_len=8)

        (s_rep, m_rep), (s_z1, m_z1) = _one_step_both_ways(
            step_fn, state, frozen, batch, mesh
        )
        _assert_identical(s_rep, m_rep, s_z1, m_z1)

    def test_lora_step(self, setup, rng):
        """LoRA state holds rank-4 A/B factor trees (tiny leading dims —
        many leaves fall back to replicated in zero1_spec) and the base
        student rides in frozen.student."""
        from consistencytta_tpu.training.lora import (
            build_lora_consistency_train_step,
            init_lora_params,
        )

        pipeline, params, frozen, mesh, tx = setup
        sched = make_heun_schedule(pipeline.config.scheduler, 4)
        step_fn = build_lora_consistency_train_step(
            pipeline, sched, tx, ConsistencyStepConfig(accum_steps=1)
        )
        lora0 = init_lora_params(params.student, rng=jax.random.PRNGKey(0))
        tx_l = make_optimizer(
            OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0)
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            student=lora0,
            student_target=jax.tree_util.tree_map(jnp.array, lora0),
            student_ema=jax.tree_util.tree_map(jnp.array, lora0),
            opt_state=tx_l.init(lora0),
        )
        frozen_l = dataclasses.replace(frozen, student=params.student)
        batch = make_batch(rng, b=8, text_len=8)

        (s_rep, m_rep), (s_z1, m_z1) = _one_step_both_ways(
            step_fn, state, frozen_l, batch, mesh
        )
        _assert_identical(s_rep, m_rep, s_z1, m_z1)

    def test_ftvae_step(self, setup, rng):
        """FTVAE state carries the trainable VAE decoder subset + its EMA
        alongside the student, and the optimizer tree is a two-branch dict
        ({unet, vae_dec}) — the most structurally distinct variant."""
        from consistencytta_tpu.evaluation.clap_model import (
            CLAPAudioTower,
            CLAPMelFrontend,
            CLAPTextTower,
        )
        from consistencytta_tpu.training.ftvae import (
            FTVAETrainState,
            build_ftvae_train_step,
        )
        from tests.test_clap_loss import TINY_HTSAT, TINY_ROBERTA

        pipeline, params, frozen, mesh, tx = setup
        clip_seconds = pipeline.config.segment_samples / 16000

        key = jax.random.PRNGKey(1)
        frontend = CLAPMelFrontend(TINY_HTSAT)
        dummy_mel = frontend(jnp.zeros((1, int(48000 * clip_seconds))))
        audio_params = jax.jit(CLAPAudioTower(TINY_HTSAT).init)(
            key, dummy_mel
        )["params"]
        text_params = jax.jit(CLAPTextTower(TINY_ROBERTA).init)(
            key, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
        )["params"]
        frozen_f = dataclasses.replace(
            frozen, clap_audio=audio_params, clap_text=text_params
        )

        sched = make_heun_schedule(pipeline.config.scheduler, 4)
        step_fn = build_ftvae_train_step(
            pipeline, sched, tx, ConsistencyStepConfig(accum_steps=1),
            htsat_config=TINY_HTSAT, roberta_config=TINY_ROBERTA,
            clip_seconds=clip_seconds,
        )
        state = FTVAETrainState.create(params, tx)
        batch = make_batch(rng, b=8, text_len=8)
        batch["clap_text_ids"] = rng.integers(2, 128, size=(8, 8)).astype(
            np.int32
        )
        batch["clap_text_mask"] = np.ones((8, 8), np.int32)

        (s_rep, m_rep), (s_z1, m_z1) = _one_step_both_ways(
            step_fn, state, frozen_f, batch, mesh
        )
        _assert_identical(s_rep, m_rep, s_z1, m_z1)
        # the trainable decoder must update identically too
        for a, b in zip(
            jax.tree_util.tree_leaves(s_rep.vae_dec),
            jax.tree_util.tree_leaves(s_z1.vae_dec),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )
