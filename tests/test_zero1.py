"""ZeRO-1 state sharding: optimizer/EMA trees split over the data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams
from consistencytta_tpu.ops.schedulers import make_heun_schedule
from consistencytta_tpu.parallel.mesh import (
    DATA_AXIS,
    device_put_batch,
    device_put_replicated,
    make_mesh,
    shard_train_state,
    sharded_step,
    zero1_spec,
)
from consistencytta_tpu.training.optim import OptimizerConfig, make_optimizer
from consistencytta_tpu.training.step import (
    ConsistencyStepConfig,
    TrainState,
    build_consistency_train_step,
)
from tests.test_training import make_batch
from tests.tiny import cached_init_params, tiny_config


class TestZero1:
    def test_spec_selection(self):
        mesh = make_mesh()  # 8 devices on the data axis

        class L:
            def __init__(self, shape):
                self.shape = shape

        import jax.sharding as shd

        s = zero1_spec(L((16, 4)), mesh)
        assert s.spec == shd.PartitionSpec(DATA_AXIS)
        s = zero1_spec(L((3, 32)), mesh)
        assert s.spec == shd.PartitionSpec(None, DATA_AXIS)
        s = zero1_spec(L((3, 3)), mesh)  # indivisible -> replicated
        assert s.spec == shd.PartitionSpec()

    @pytest.mark.slow
    def test_zero1_step_matches_replicated(self, rng):
        pipeline = Pipeline.create(tiny_config())
        params = cached_init_params(pipeline, text_len=8)
        frozen = PipelineParams(
            teacher=params.teacher, vae=params.vae, vocoder=params.vocoder,
            t5=params.t5,
        )
        mesh = make_mesh()
        sched = make_heun_schedule(pipeline.config.scheduler, 18)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, num_warmup_steps=0))
        step_fn = build_consistency_train_step(pipeline, sched, tx)

        batch = make_batch(rng, b=8, text_len=8)
        frozen_r = device_put_replicated(frozen, mesh)
        batch_d = device_put_batch(batch, mesh)

        # replicated baseline
        step_rep = sharded_step(step_fn, mesh, donate_state=False)
        state0 = TrainState.create(params, tx)
        s_rep, m_rep = step_rep(
            device_put_replicated(state0, mesh), frozen_r, batch_d,
            jax.random.PRNGKey(0),
        )

        # zero-1 sharded state
        state_sharded = shard_train_state(TrainState.create(params, tx), mesh)
        step_z1 = sharded_step(
            step_fn, mesh, donate_state=False, state_example=state0
        )
        s_z1, m_z1 = step_z1(state_sharded, frozen_r, batch_d, jax.random.PRNGKey(0))

        np.testing.assert_allclose(
            float(m_rep["loss"]), float(m_z1["loss"]), rtol=1e-6
        )
        # identical updated students
        for a, b in zip(
            jax.tree_util.tree_leaves(s_rep.student),
            jax.tree_util.tree_leaves(s_z1.student),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )
        # EMA shadows actually sharded across devices
        leaf = jax.tree_util.tree_leaves(s_z1.student_ema)[0]
        assert not leaf.sharding.is_fully_replicated
