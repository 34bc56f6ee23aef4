"""Optimizer and LR schedule factory.

Mirrors the reference AdamW + transformers get_scheduler
(tools/train_utils.py:59-79): warmup to the base LR, then the decay shape
selected by --lr_scheduler_type ('linear' in every shipped recipe).
"""

from __future__ import annotations

from dataclasses import dataclass

import optax

# decay shapes matching transformers.get_scheduler semantics for the types
# a TTA recipe plausibly uses; anything else is rejected loudly rather than
# silently trained with the wrong schedule
SUPPORTED_LR_SCHEDULES = ("linear", "cosine", "constant", "constant_with_warmup")


@dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    weight_decay: float = 1e-4
    num_warmup_steps: int = 750
    max_train_steps: int = 100_000
    lr_scheduler_type: str = "linear"
    max_grad_norm: float | None = None  # reference does not clip


def lr_schedule_with_warmup(config: OptimizerConfig) -> optax.Schedule:
    if config.lr_scheduler_type not in SUPPORTED_LR_SCHEDULES:
        raise ValueError(
            f"--lr_scheduler_type {config.lr_scheduler_type!r} is not supported; "
            f"choose one of {SUPPORTED_LR_SCHEDULES}"
        )

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        if config.lr_scheduler_type == "constant":
            # transformers 'constant': no warmup, flat LR
            return jnp.full_like(step, config.learning_rate)
        warm = jnp.maximum(config.num_warmup_steps, 1)
        warmup_factor = jnp.minimum(1.0, step / warm)
        progress = jnp.clip(
            (step - config.num_warmup_steps)
            / jnp.maximum(config.max_train_steps - config.num_warmup_steps, 1),
            0.0,
            1.0,
        )
        if config.lr_scheduler_type == "cosine":
            import numpy as np

            decay_factor = 0.5 * (1.0 + jnp.cos(np.pi * progress))
        elif config.lr_scheduler_type == "constant_with_warmup":
            decay_factor = jnp.ones_like(step)
        else:  # linear
            decay_factor = 1.0 - progress
        factor = jnp.where(step < config.num_warmup_steps, warmup_factor, decay_factor)
        return config.learning_rate * factor

    return schedule


# backward-compat alias (pre-round-4 name, linear was the only shape)
linear_schedule_with_warmup = lr_schedule_with_warmup


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    tx = optax.adamw(
        learning_rate=lr_schedule_with_warmup(config),
        b1=config.adam_beta1,
        b2=config.adam_beta2,
        eps=config.adam_epsilon,
        weight_decay=config.weight_decay,
    )
    if config.max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(config.max_grad_norm), tx)
    return tx
