"""Epoch-level training orchestration.

The reference's train.py main loop (epoch loop with per-epoch eval, best
checkpointing, epoch checkpoints every --save_every, resume) re-expressed
around the jitted step functions. Host work is limited to data loading and
logging; everything else is one device call per optimizer step.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from consistencytta_tpu.io.checkpoints import SummaryWriter, save_checkpoint
from consistencytta_tpu.models.pipeline import PipelineParams
from consistencytta_tpu.parallel.mesh import device_put_batch
from consistencytta_tpu.training.step import TrainState


@dataclass
class LoopConfig:
    num_epochs: int = 60
    output_dir: str = "saved/run"
    save_every: int = 5  # epoch checkpoints (--save_every)
    eval_batches: Optional[int] = None  # cap validation batches (~100 samples)
    log_every: int = 50
    starting_epoch: int = 0
    seed: int = 0
    # hard optimizer-step cap (reference --max_train_steps,
    # train.py:264-266,398-400): training stops mid-epoch when reached
    max_steps: Optional[int] = None
    # --checkpointing_steps: "best" keeps the best-val checkpoint; an integer
    # value additionally saves `step_{n}` checkpoints every n optimizer steps
    # (the reference's Accelerate save_state cadence, train.py:411-417)
    save_best: bool = True
    step_checkpoint_every: Optional[int] = None
    # --with_tracking: mirror the jsonl log to wandb (train.py:264-266,309)
    use_wandb: bool = False
    wandb_kwargs: Optional[dict] = None


def _strip_captions(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if k != "captions"}


def train_loop(
    step_fn: Callable,
    validate_fn: Optional[Callable],
    state: TrainState,
    frozen: PipelineParams,
    make_train_loader: Callable[[int], Iterable[dict]],
    make_eval_loader: Optional[Callable[[], Iterable[dict]]],
    config: LoopConfig,
    mesh=None,
    pipeline_config=None,
) -> TrainState:
    """Run the full training loop; returns the final state.

    make_train_loader(epoch) -> fresh (re-shuffled) iterator per epoch.
    `step_fn`/`validate_fn` must already be jitted/sharded.
    """
    writer = SummaryWriter(
        config.output_dir,
        use_wandb=config.use_wandb,
        wandb_kwargs=config.wandb_kwargs,
    )
    rng = jax.random.PRNGKey(config.seed)
    best_eval_loss = float("inf")
    reached_max = False

    for epoch in range(config.starting_epoch, config.num_epochs):
        if reached_max:
            break
        t_epoch = time.time()
        train_loss, n_steps = 0.0, 0

        for batch in make_train_loader(epoch):
            rng, step_rng = jax.random.split(rng)
            batch = _strip_captions(batch)
            if mesh is not None:
                batch = device_put_batch(batch, mesh)
            state, metrics = step_fn(state, frozen, batch, step_rng)
            n_steps += 1
            loss = float(metrics["loss"])
            if np.isfinite(loss):
                train_loss += loss
            global_step = int(state.step)
            if n_steps % config.log_every == 0:
                writer.log(
                    {"epoch": epoch, "step": global_step, "train_loss": loss}
                )
            if (
                config.step_checkpoint_every
                and global_step % config.step_checkpoint_every == 0
            ):
                save_checkpoint(
                    os.path.join(config.output_dir, f"step_{global_step}"),
                    state, frozen, pipeline_config,
                )
            if config.max_steps is not None and global_step >= config.max_steps:
                reached_max = True
                break

        record = {
            "epoch": epoch,
            "step": int(state.step),
            "train_loss": train_loss / max(n_steps, 1),
            "epoch_seconds": time.time() - t_epoch,
        }

        # validation (stage-2: 4 losses; best tracked on loss_w_teacher,
        # tools/train_utils.py:217-229)
        if validate_fn is not None and make_eval_loader is not None:
            totals, n_eval = {}, 0
            for i, batch in enumerate(make_eval_loader()):
                if config.eval_batches is not None and i >= config.eval_batches:
                    break
                rng, eval_rng = jax.random.split(rng)
                batch = _strip_captions(batch)
                if mesh is not None:
                    batch = device_put_batch(batch, mesh)
                losses = validate_fn(state, frozen, batch, eval_rng)
                for k, v in losses.items():
                    totals[k] = totals.get(k, 0.0) + float(v)
                n_eval += 1
            for k in totals:
                record[k] = totals[k] / max(n_eval, 1)
            loss_to_track = record.get(
                "loss_w_teacher", record.get("val_loss", record["train_loss"])
            )
        else:
            loss_to_track = record["train_loss"]

        writer.log(record)

        if config.save_best and loss_to_track < best_eval_loss:
            best_eval_loss = loss_to_track
            save_checkpoint(
                os.path.join(config.output_dir, "best"),
                state,
                frozen,
                pipeline_config,
            )
        if (epoch + 1) % config.save_every == 0:
            save_checkpoint(
                os.path.join(config.output_dir, f"epoch_{epoch + 1}"),
                state,
                frozen,
                pipeline_config,
            )

    return state
