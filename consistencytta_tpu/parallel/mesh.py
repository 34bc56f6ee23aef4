"""Device mesh + sharding utilities: the distributed story of the framework.

The reference's only parallelism is DDP data-parallel training through HF
Accelerate (NCCL allreduce at `accelerator.backward`, SURVEY.md section 2.9).
The TPU-native equivalent implemented here: a 1-D `data` mesh axis, batches
sharded over it, parameters replicated; under `jax.jit` with these shardings
XLA inserts the gradient all-reduce over ICI automatically — no comm code.

A `model` axis is reserved in the mesh for future tensor-parallel sharding
(the ~500M-param UNet fits one chip, so it stays size 1 in the shipped
configs; `dryrun_multichip` exercises mesh shapes with both axes).

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` — the
mesh then spans all processes and per-host data loading feeds
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """1- or 2-D mesh over the available devices: (data, model)."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh):
    """Sharding for batch pytrees: leading axis split over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh):
    """Sharding for parameter/state pytrees: fully replicated."""
    return NamedSharding(mesh, P())


def device_put_batch(batch, mesh: Mesh):
    return jax.device_put(batch, shard_batch(mesh))


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicate(mesh))


def sharded_step(
    step_fn: Callable, mesh: Mesh, donate_state: bool = True
) -> Callable:
    """Compile step(state, frozen, batch, rng) with DP shardings:
    state/frozen replicated, batch split over `data`. XLA derives the
    gradient psum over ICI from these constraints (the NCCL-allreduce
    equivalent of reference accelerator.backward)."""
    rep = replicate(mesh)
    data = shard_batch(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def sharded_eval(
    fn: Callable, mesh: Mesh, n_batch_args: int, n_replicated_tail: int = 0
) -> Callable:
    """Compile fn(params, *batch_args, *tail_args) with params replicated,
    `n_batch_args` args sharded over `data`, and `n_replicated_tail` trailing
    args (rng keys, scalars) replicated — for batched inference/eval."""
    rep = replicate(mesh)
    data = shard_batch(mesh)
    return jax.jit(
        fn,
        in_shardings=(rep,) + (data,) * n_batch_args + (rep,) * n_replicated_tail,
        out_shardings=data,
    )
