"""Training-step tests (tiny config): stage-1/stage-2 steps compile, reduce
loss-relevant state, EMA shadows track, NaN batches are skipped, and the DP
sharded step runs on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import (
    make_ddpm_schedule,
    make_heun_schedule,
)
from consistencytta_tpu.parallel.mesh import (
    device_put_batch,
    device_put_replicated,
    make_mesh,
    sharded_step,
)
from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
from consistencytta_tpu.training.step import (
    ConsistencyStepConfig,
    GuidedStepConfig,
    TrainState,
    build_consistency_train_step,
    build_guided_train_step,
    build_validation_step,
)
from consistencytta_tpu.text.tokenizer import HashTokenizer, tokenize_with_uncond
from tests.tiny import cached_init_params, tiny_config


@pytest.fixture(scope="module")
def pipeline():
    return Pipeline.create(tiny_config())


@pytest.fixture(scope="module")
def params(pipeline):
    return cached_init_params(pipeline, text_len=8)


def make_batch(rng, b=4, text_len=8, samples=64 * 160):
    tok = HashTokenizer(vocab_size=256)
    ids, mask, uids, umask = tokenize_with_uncond(
        tok, [f"sound number {i}" for i in range(b)], text_len
    )
    return {
        "wav": (rng.standard_normal((b, samples)) * 0.1).astype(np.float32),
        "ids": ids,
        "mask": mask,
        "uncond_ids": uids,
        "uncond_mask": umask,
    }


@pytest.fixture(scope="module")
def frozen(params):
    return PipelineParams(
        teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
        t5=params.t5,
    )


class TestConsistencyStep:
    @pytest.mark.slow  # full jitted-step compile (~80 s on one CPU core)
    def test_step_runs_and_updates(self, pipeline, params, frozen, rng):
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step = jax.jit(
            build_consistency_train_step(pipeline, sched, tx)
        )
        state = TrainState.create(params, tx)
        batch = make_batch(rng)
        state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))

        assert np.isfinite(float(metrics["loss"]))
        assert bool(metrics["loss_finite"])
        assert int(state2.step) == 1
        # student moved
        diff = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(
                lambda a, b: a - b, state2.student, state.student
            ),
            0.0,
        )
        assert diff > 0

    def test_ema_update_math(self):
        from consistencytta_tpu.training.ema import ema_update

        shadow = {"w": jnp.array([1.0, 2.0]), "b": jnp.array([0.0])}
        param = {"w": jnp.array([3.0, 0.0]), "b": jnp.array([4.0])}
        out = ema_update(shadow, param, 0.95)
        np.testing.assert_allclose(
            np.asarray(out["w"]), 0.95 * np.array([1.0, 2.0]) + 0.05 * np.array([3.0, 0.0]),
            rtol=1e-6,
        )
        # decay 1 -> unchanged exactly; decay 0 -> param (up to rounding)
        same = ema_update(shadow, param, 1.0)
        np.testing.assert_array_equal(np.asarray(same["b"]), np.asarray(shadow["b"]))
        swap = ema_update(shadow, param, 0.0)
        np.testing.assert_allclose(np.asarray(swap["w"]), np.asarray(param["w"]), rtol=1e-6)

    @pytest.mark.slow
    def test_nan_batch_skips_update(self, pipeline, params, frozen, rng):
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step = jax.jit(build_consistency_train_step(pipeline, sched, tx))
        state = TrainState.create(params, tx)
        batch = make_batch(rng)
        batch["wav"] = batch["wav"].at[0, 0].set(np.nan) if hasattr(
            batch["wav"], "at"
        ) else batch["wav"]
        # force NaN through the latent path: poison wav directly
        bad = dict(batch)
        wav = np.array(batch["wav"])
        wav[:] = np.nan
        bad["wav"] = wav
        state2, metrics = step(state, frozen, bad, jax.random.PRNGKey(2))
        # frontend sanitizes NaN input, so loss may still be finite; if it
        # is not, params must be unchanged
        if not bool(metrics["loss_finite"]):
            for a, b in zip(
                jax.tree_util.tree_leaves(state2.student),
                jax.tree_util.tree_leaves(state.student),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_poisoned_grads_skip_update(self, pipeline, params, frozen, rng):
        """Finite loss + non-finite grads must leave params/opt state
        unchanged (stricter than the reference's loss-only check): sqrt at 0
        gives loss=0 (finite) but an inf/nan gradient."""
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))

        def poisoned_loss(pred, target, frozen, micro):
            # d/dpred sqrt(|pred - pred|) is non-finite at 0
            return jnp.sqrt(jnp.abs(pred - pred)).mean(axis=tuple(range(1, pred.ndim)))

        step = jax.jit(
            build_consistency_train_step(
                pipeline, sched, tx, loss_fn_override=poisoned_loss
            )
        )
        state = TrainState.create(params, tx)
        state2, metrics = step(state, frozen, make_batch(rng), jax.random.PRNGKey(5))
        assert np.isfinite(float(metrics["loss"]))  # the loss itself is 0
        assert not bool(metrics["loss_finite"])     # but the guard tripped
        for a, b in zip(
            jax.tree_util.tree_leaves(state2.student),
            jax.tree_util.tree_leaves(state.student),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_grad_accumulation_matches_big_batch_direction(
        self, pipeline, params, frozen, rng
    ):
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step2 = jax.jit(
            build_consistency_train_step(
                pipeline, sched, tx, ConsistencyStepConfig(accum_steps=2)
            )
        )
        state = TrainState.create(params, tx)
        state2, metrics = step2(state, frozen, make_batch(rng), jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))

    @pytest.mark.slow
    def test_ddim_variant(self, pipeline, params, frozen, rng):
        from consistencytta_tpu.ops.schedulers import make_ddim_schedule

        sched = make_ddim_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step = jax.jit(
            build_consistency_train_step(
                pipeline, sched, tx, ConsistencyStepConfig(use_edm=False)
            )
        )
        state = TrainState.create(params, tx)
        _, metrics = step(state, frozen, make_batch(rng), jax.random.PRNGKey(4))
        assert np.isfinite(float(metrics["loss"]))


class TestValidationStep:
    @pytest.mark.slow
    def test_four_losses(self, pipeline, params, frozen, rng):
        sched = make_heun_schedule(pipeline.config.scheduler, 6)
        tx = make_optimizer(OptimizerConfig())
        validate = jax.jit(build_validation_step(pipeline, sched))
        state = TrainState.create(params, tx)
        losses = validate(state, frozen, make_batch(rng, b=2), jax.random.PRNGKey(0))
        assert set(losses) == {
            "loss_w_gt", "loss_w_teacher", "loss_consistency", "loss_teacher"
        }
        for v in losses.values():
            assert np.isfinite(float(v))


class TestGuidedStep:
    @pytest.mark.slow
    def test_stage1_step(self, pipeline, params, frozen, rng):
        sched = make_ddpm_schedule(pipeline.config.scheduler)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step = jax.jit(build_guided_train_step(pipeline, sched, tx))
        state = TrainState.create(params, tx, with_target=False)
        state2, metrics = step(state, frozen, make_batch(rng), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1


class TestShardedTraining:
    @pytest.mark.slow
    def test_dp_step_on_8_devices(self, pipeline, params, frozen, rng):
        assert len(jax.devices()) == 8
        mesh = make_mesh()
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step = sharded_step(
            build_consistency_train_step(pipeline, sched, tx), mesh,
            donate_state=False,
        )
        state = device_put_replicated(TrainState.create(params, tx), mesh)
        frozen_r = device_put_replicated(frozen, mesh)
        batch = device_put_batch(make_batch(rng, b=8), mesh)
        state2, metrics = step(state, frozen_r, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated after the update
        leaf = jax.tree_util.tree_leaves(state2.student)[0]
        assert leaf.sharding.is_fully_replicated
