"""LoRA adaptation tests: identity at init, kernel delta, LoRA-only training."""

import pytest

pytestmark = pytest.mark.slow  # grad-graph compiles dominate (see conftest)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import make_heun_schedule
from consistencytta_tpu.training.lora import (
    build_lora_consistency_train_step,
    init_lora_params,
    lora_param_count,
    merge_lora,
)
from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
from consistencytta_tpu.training.step import ConsistencyStepConfig, TrainState
from tests.test_training import make_batch
from tests.tiny import cached_init_params, tiny_config


@pytest.fixture(scope="module")
def pipeline():
    return Pipeline.create(tiny_config())


@pytest.fixture(scope="module")
def params(pipeline):
    return cached_init_params(pipeline, text_len=8)


class TestLoRA:
    def test_init_covers_all_attention_projections(self, params):
        lora = init_lora_params(params.student, rank=4)
        n = lora_param_count(lora)
        # 3 cross-attn levels x 2 blocks down + 3 up-levels x 3 + mid = 16
        # transformers, each with attn1+attn2 x 4 projections
        assert n > 0
        leaves = jax.tree_util.tree_leaves(lora)
        assert len(leaves) == 16 * 2 * 4 * 2  # (a, b) per projection

    def test_merge_identity_at_init(self, params):
        lora = init_lora_params(params.student, rank=4)
        merged = merge_lora(params.student, lora)
        for a, b in zip(
            jax.tree_util.tree_leaves(merged),
            jax.tree_util.tree_leaves(params.student),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_merge_changes_kernels_after_update(self, params):
        lora = init_lora_params(params.student, rank=4)
        bumped = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
        merged = merge_lora(params.student, bumped)
        diff = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(merged),
                jax.tree_util.tree_leaves(params.student),
            )
        )
        assert diff > 0

    def test_lora_train_step(self, pipeline, params, rng):
        frozen = PipelineParams(
            teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
            t5=params.t5, student=params.student,
        )
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-2, num_warmup_steps=0))
        lora = init_lora_params(params.student, rank=2)
        step = jax.jit(
            build_lora_consistency_train_step(
                pipeline, sched, tx, ConsistencyStepConfig(),
            )
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            student=lora,
            student_target=jax.tree_util.tree_map(jnp.array, lora),
            student_ema=jax.tree_util.tree_map(jnp.array, lora),
            opt_state=tx.init(lora),
        )
        state2, metrics = step(state, frozen, make_batch(rng, b=2, text_len=8),
                               jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        d = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(state2.student),
                jax.tree_util.tree_leaves(state.student),
            )
        )
        assert d > 0  # LoRA factors moved


class TestLoRAProduct:
    def test_is_lora_tree(self, params):
        from consistencytta_tpu.training.lora import is_lora_tree

        lora = init_lora_params(params.student, rank=2)
        assert is_lora_tree(lora)
        assert not is_lora_tree(params.student)
        assert not is_lora_tree({})

    def test_accum_matches_mean_of_micro_grads(self, pipeline, params, rng):
        """cfg.accum_steps=2 must equal the average of the two micro-batch
        gradients (the scan body of training/step.py:259-279). SGD makes the
        optimizer update linear in the gradient, so state deltas compare
        exactly: delta_accum == mean(delta_micro_i) with the same per-micro
        rng split the step uses internally."""
        import optax

        frozen = PipelineParams(
            teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
            t5=params.t5, student=params.student,
        )
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = optax.sgd(0.1)
        lora = init_lora_params(params.student, rank=2)

        def fresh_state():
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                student=jax.tree_util.tree_map(jnp.array, lora),
                student_target=jax.tree_util.tree_map(jnp.array, lora),
                student_ema=jax.tree_util.tree_map(jnp.array, lora),
                opt_state=tx.init(lora),
            )

        step_acc = jax.jit(build_lora_consistency_train_step(
            pipeline, sched, tx,
            ConsistencyStepConfig(accum_steps=2, snr_gamma=None),
        ))
        step_one = jax.jit(build_lora_consistency_train_step(
            pipeline, sched, tx,
            ConsistencyStepConfig(accum_steps=1, snr_gamma=None),
        ))

        batch = make_batch(rng, b=4, text_len=8)
        key = jax.random.PRNGKey(42)
        s_acc, m_acc = step_acc(fresh_state(), frozen, batch, key)

        keys = jax.random.split(key, 2)
        micro0 = {k: v[:2] for k, v in batch.items()}
        micro1 = {k: v[2:] for k, v in batch.items()}
        s_0, m_0 = step_one(fresh_state(), frozen, micro0, keys[0])
        s_1, m_1 = step_one(fresh_state(), frozen, micro1, keys[1])

        # losses average
        np.testing.assert_allclose(
            float(m_acc["loss"]),
            (float(m_0["loss"]) + float(m_1["loss"])) / 2,
            rtol=1e-5,
        )
        # SGD deltas average leaf-by-leaf
        for la, l0, l1, base in zip(
            jax.tree_util.tree_leaves(s_acc.student),
            jax.tree_util.tree_leaves(s_0.student),
            jax.tree_util.tree_leaves(s_1.student),
            jax.tree_util.tree_leaves(lora),
        ):
            d_acc = np.asarray(la) - np.asarray(base)
            d_mean = ((np.asarray(l0) - np.asarray(base))
                      + (np.asarray(l1) - np.asarray(base))) / 2
            np.testing.assert_allclose(d_acc, d_mean, atol=1e-6, rtol=1e-4)
