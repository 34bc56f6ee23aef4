"""Optimizer and LR schedule factory.

Mirrors the reference AdamW + transformers 'linear' schedule
(tools/train_utils.py:59-79): linear warmup to the base LR, then linear
decay to zero at max_train_steps.
"""

from __future__ import annotations

from dataclasses import dataclass

import optax


@dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    weight_decay: float = 1e-4
    num_warmup_steps: int = 750
    max_train_steps: int = 100_000
    max_grad_norm: float | None = None  # reference does not clip


def linear_schedule_with_warmup(config: OptimizerConfig) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(config.num_warmup_steps, 1)
        warmup_factor = jnp.minimum(1.0, step / warm)
        decay_factor = jnp.clip(
            (config.max_train_steps - step)
            / jnp.maximum(config.max_train_steps - config.num_warmup_steps, 1),
            0.0,
            1.0,
        )
        factor = jnp.where(step < config.num_warmup_steps, warmup_factor, decay_factor)
        return config.learning_rate * factor

    return schedule


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    tx = optax.adamw(
        learning_rate=linear_schedule_with_warmup(config),
        b1=config.adam_beta1,
        b2=config.adam_beta2,
        eps=config.adam_epsilon,
        weight_decay=config.weight_decay,
    )
    if config.max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(config.max_grad_norm), tx)
    return tx
