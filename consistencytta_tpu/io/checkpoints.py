"""Orbax checkpointing + config replay.

Replaces the reference's Accelerate save_state/load_state + summary.jsonl
replay (train.py:398-400,424-439,495-511; SURVEY.md section 5 checkpoint).
Layout per checkpoint directory:

  {dir}/state      — orbax tree: TrainState (student/target/ema/opt_state)
  {dir}/frozen     — orbax tree: frozen params (teacher/vae/vocoder/t5)
  {dir}/config.json — full config replay (the summary.jsonl equivalent)

`save_best` mirrors the reference's best-val-loss checkpointing
(--checkpointing_steps=best); epoch checkpoints mirror `epoch_{n}`.
Saves are wrapped in a bounded retry (the reference retries forever,
train.py:495-511).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_tree(path: str, tree: Any, retries: int = 3) -> None:
    path = os.path.abspath(path)
    for attempt in range(retries):
        try:
            _checkpointer().save(path, tree, force=True)
            return
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(2.0)


def restore_tree(path: str, template: Optional[Any] = None) -> Any:
    """Restore an orbax tree. With `template`, the restored arrays are typed
    after it and the original container types (TrainState dataclass, optax
    namedtuples) are rebuilt — orbax stores the tree in serialized dict/list
    form, so the template must be serialized the same way before building
    restore args."""
    path = os.path.abspath(path)
    if template is not None:
        import orbax.checkpoint as ocp

        serialized = ocp.tree.serialize_tree(template, keep_empty_nodes=True)
        restored = _checkpointer().restore(
            path,
            restore_args=ocp.checkpoint_utils.construct_restore_args(serialized),
        )
        return ocp.tree.deserialize_tree(
            restored, target=template, keep_empty_nodes=True
        )
    return _checkpointer().restore(path)


def save_checkpoint(
    directory: str, state: Any, frozen: Any = None, config: Any = None
) -> None:
    os.makedirs(directory, exist_ok=True)
    save_tree(os.path.join(directory, "state"), jax.device_get(state))
    if frozen is not None:
        save_tree(os.path.join(directory, "frozen"), jax.device_get(frozen))
    if config is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            if hasattr(config, "to_dict"):
                config = config.to_dict()
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(directory: str, state_template=None, frozen_template=None):
    state = restore_tree(os.path.join(directory, "state"), state_template)
    frozen_path = os.path.join(directory, "frozen")
    frozen = (
        restore_tree(frozen_path, frozen_template)
        if os.path.exists(frozen_path)
        else None
    )
    config_path = os.path.join(directory, "config.json")
    config = None
    if os.path.exists(config_path):
        with open(config_path) as f:
            config = json.load(f)
    return state, frozen, config


class SummaryWriter:
    """Append-only jsonl metrics log (the reference's summary.jsonl,
    tools/train_utils.py:240-241), with optional wandb mirroring."""

    def __init__(self, output_dir: str, use_wandb: bool = False, wandb_kwargs=None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "summary.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None  # wandb optional (absent in this image)

    def log(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
        if self._wandb is not None:
            self._wandb.log(record)
