"""Framework utilities: determinism, profiling, timing.

Replaces the reference's aux knobs (SURVEY.md section 5): seed_all
(tools/torch_tools.py:12-22) and the wall-clock phase timing of
AudioLCM.inference (models/audio_consistency_model.py:465-545), upgraded to
jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import os
import random
import time
from typing import Iterator, Optional

import numpy as np


def seed_all(seed: int) -> "jax.Array":
    """Seed every host RNG and return a jax PRNG key.

    JAX device RNG is explicit (threaded keys), so unlike the reference
    there is no hidden device-side generator to pin — determinism follows
    from passing keys derived from this seed.
    """
    import jax

    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (viewable in TensorBoard/XProf); no-op
    when log_dir is None."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with device synchronization, the
    block_until_ready analog of the reference's time() brackets."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None) -> Iterator[None]:
        import jax

        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> dict:
        return dict(self.phases)
