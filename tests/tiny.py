"""Tiny pipeline configuration for tests, plus a disk cache for random-init
parameter trees.

`Pipeline.init_params` traces + compiles every module's init graph; on the
CPU test backend that is the single largest fixture cost in the quick tier
(~35 s warm / minutes cold per config). The values are pure functions of
(config, seed, text_len, roles) and the package source, so they are cached
as pickled numpy trees under `.test_cache/` keyed by a digest of all of
those — a source change invalidates the cache automatically.
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle

from consistencytta_tpu.configs import PipelineConfig

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE_DIR = os.path.join(_REPO, ".test_cache")
_DEFAULT_ROLES = ("student", "student_target", "student_ema", "teacher")


def tiny_config() -> PipelineConfig:
    return PipelineConfig.tiny()


@functools.lru_cache(maxsize=1)
def _source_digest() -> str:
    """Digest of every package source file: any code change invalidates
    cached param trees (param structure or init math may have moved)."""
    h = hashlib.sha256()
    pkg = os.path.join(_REPO, "consistencytta_tpu")
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".py"):
                with open(os.path.join(root, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def cached_init_params(
    pipeline,
    seed: int = 0,
    *,
    text_len: int,  # required: a silent default must not diverge from
    # Pipeline.init_params' own (64) and hand back wrong-shaped text params
    roles=_DEFAULT_ROLES,
):
    """`pipeline.init_params` with a cross-run disk cache (tests only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    key = (
        f"{pipeline.config!r}|{seed}|{text_len}|{tuple(roles)}"
        f"|{pipeline.student_unet.dtype}|{_source_digest()}"
    )
    path = os.path.join(
        _CACHE_DIR,
        "params-" + hashlib.sha256(key.encode()).hexdigest()[:24] + ".pkl",
    )
    if os.path.exists(path):
        with open(path, "rb") as f:
            np_tree = pickle.load(f)
        return jax.tree_util.tree_map(jnp.asarray, np_tree)

    params = pipeline.init_params(
        jax.random.PRNGKey(seed), roles=tuple(roles), text_len=text_len
    )
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
    os.replace(tmp, path)
    return params
