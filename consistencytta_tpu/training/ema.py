"""Exponential moving averages over parameter pytrees.

Replaces the reference's module-walking EMA (tools/train_utils.py:255-282)
with a one-line tree lerp. The consistency recipe keeps two shadows of the
student: the target network (decay 0.95) and the inference EMA (decay 0.999)
(models/audio_consistency_model.py:221-227; train.sh --target_ema_decay
--ema_decay).
"""

from __future__ import annotations

import jax


def ema_update(shadow, params, decay: float):
    """shadow <- shadow + (1 - decay) * (params - shadow)."""
    return jax.tree_util.tree_map(
        lambda s, p: s + (1.0 - decay) * (p - s), shadow, params
    )
