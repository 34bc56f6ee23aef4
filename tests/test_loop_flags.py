"""Training-loop flag semantics: --max_train_steps stops training,
--checkpointing_steps=<int> writes step checkpoints, non-"best" mode skips
best-checkpointing, --with_tracking degrades gracefully without wandb.

(Reference contracts: train.py:264-266,398-400,411-417; the round-1 review
flagged these flags as parsed-but-dead.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from consistencytta_tpu.training.loop import LoopConfig, train_loop
from consistencytta_tpu.training.step import TrainState


def _tiny_state():
    params = {"w": jnp.zeros((2,))}
    tx = optax.sgd(1e-2)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        student=params,
        student_target=None,
        student_ema=params,
        opt_state=tx.init(params),
    )


def _step_fn(state, frozen, batch, rng):
    new = TrainState(
        step=state.step + 1,
        student=state.student,
        student_target=state.student_target,
        student_ema=state.student_ema,
        opt_state=state.opt_state,
    )
    return new, {"loss": jnp.asarray(0.5)}


def _loader_factory(n_batches):
    def make(epoch=0):
        return [{"wav": np.zeros((1,), np.float32)} for _ in range(n_batches)]

    return make


def test_max_steps_stops_mid_epoch(tmp_path):
    cfg = LoopConfig(
        num_epochs=10, output_dir=str(tmp_path), save_every=100,
        max_steps=3, save_best=False,
    )
    state = train_loop(
        _step_fn, None, _tiny_state(), None, _loader_factory(5), None, cfg
    )
    assert int(state.step) == 3


def test_step_checkpointing(tmp_path):
    cfg = LoopConfig(
        num_epochs=1, output_dir=str(tmp_path), save_every=100,
        step_checkpoint_every=2, save_best=False,
    )
    train_loop(
        _step_fn, None, _tiny_state(), None, _loader_factory(5), None, cfg
    )
    assert os.path.exists(tmp_path / "step_2" / "state")
    assert os.path.exists(tmp_path / "step_4" / "state")
    assert not os.path.exists(tmp_path / "step_3")


def test_save_best_toggle(tmp_path):
    cfg = LoopConfig(
        num_epochs=1, output_dir=str(tmp_path), save_every=100, save_best=False,
    )
    train_loop(
        _step_fn, None, _tiny_state(), None, _loader_factory(2), None, cfg
    )
    assert not os.path.exists(tmp_path / "best")

    cfg2 = LoopConfig(
        num_epochs=1, output_dir=str(tmp_path / "b"), save_every=100,
        save_best=True,
    )
    train_loop(
        _step_fn, None, _tiny_state(), None, _loader_factory(2), None, cfg2
    )
    assert os.path.exists(tmp_path / "b" / "best" / "state")


def test_tracking_without_wandb_is_safe(tmp_path):
    cfg = LoopConfig(
        num_epochs=1, output_dir=str(tmp_path), save_every=100,
        save_best=False, use_wandb=True,  # wandb absent in this image
    )
    train_loop(
        _step_fn, None, _tiny_state(), None, _loader_factory(1), None, cfg
    )
    assert os.path.exists(tmp_path / "summary.jsonl")
