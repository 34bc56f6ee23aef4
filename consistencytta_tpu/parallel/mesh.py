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
    """Place a batch on the mesh, split over `data`. Single-host: a plain
    device_put. Multi-host (jax.distributed initialized): each process
    passes only its LOCAL slice of the global batch and the global array is
    assembled across hosts without any cross-host data movement."""
    if jax.process_count() > 1:
        return make_global_batch_from_local(batch, mesh)
    return jax.device_put(batch, shard_batch(mesh))


def make_global_batch_from_local(local_batch, mesh: Mesh):
    """Multi-host data feeding: build globally-sharded batch arrays from
    per-process local shards via jax.make_array_from_process_local_data.
    `local_batch` leaves carry this process's rows only; the returned arrays
    are global [world_batch, ...] jax.Arrays sharded over `data`.

    This is the TPU-native replacement for the reference's per-rank
    DataLoader + DDP pairing (each Accelerate rank reads its own rows;
    SURVEY.md section 2.9): per-host loaders feed disjoint manifest slices,
    and the resulting global array is what the jitted step consumes."""
    sharding = shard_batch(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_batch,
    )


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicate(mesh))


def zero1_spec(leaf, mesh: Mesh) -> NamedSharding:
    """ZeRO-1-style sharding for an optimizer-state / EMA leaf: split the
    first axis whose size divides the data-axis extent; replicate scalars
    and indivisible leaves. Under jit, constraining the optimizer state and
    EMA shadows this way makes XLA partition the update math and keep only
    1/N of those tensors per chip (weight-update sharding)."""
    n = mesh.shape[DATA_AXIS]
    if n == 1 or not hasattr(leaf, "shape"):
        return replicate(mesh)
    for axis, dim in enumerate(leaf.shape):
        if dim % n == 0 and dim >= n:
            spec = [None] * axis + [DATA_AXIS]  # trailing dims unsharded
            return NamedSharding(mesh, P(*spec))
    return replicate(mesh)


def zero1_tree_sharding(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda x: zero1_spec(x, mesh), tree)


def device_put_zero1(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, zero1_spec(x, mesh)), tree
    )


def sharded_step(
    step_fn: Callable,
    mesh: Mesh,
    donate_state: bool = True,
    state_example=None,
) -> Callable:
    """Compile step(state, frozen, batch, rng) with DP shardings:
    batch split over `data`, frozen params replicated; XLA derives the
    gradient psum over ICI from these constraints (the NCCL-allreduce
    equivalent of reference accelerator.backward).

    When `state_example` (a TrainState) is given, its optimizer state and
    EMA shadow trees are ZeRO-1 sharded over the data axis instead of
    replicated — the memory that keeps full-scale stage-2 training from
    fitting a single 16G chip (student + Adam moments + target + ema fp32
    ~ 11 GB) divides across the mesh. Use `shard_train_state` to lay out
    the initial state accordingly."""
    rep = replicate(mesh)
    data = shard_batch(mesh)
    if state_example is None:
        state_shardings = rep
    else:
        import dataclasses

        fields = {}
        for f in dataclasses.fields(state_example):
            val = getattr(state_example, f.name)
            if f.name in ("student_target", "student_ema", "opt_state",
                          "vae_dec_ema") and val is not None:
                fields[f.name] = zero1_tree_sharding(val, mesh)
            else:
                fields[f.name] = jax.tree_util.tree_map(lambda _: rep, val)
        state_shardings = type(state_example)(**fields)

    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, rep, data, rep),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def _dedup_aliased_leaves(state):
    """Copy any leaf buffer that appears more than once in the state.

    Role trees seeded from a single checkpoint alias (cli/common.py fans one
    student_ema tree out to student/target/ema; Pipeline.init_params shares
    one init across roles). On a multi-device mesh device_put copies and
    hides that, but on a 1-device mesh it is a no-op and the donated step
    fails with "Attempt to donate the same buffer twice"."""
    import jax.numpy as jnp

    seen: set = set()

    def dedup(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            if id(x) in seen:
                return jnp.array(x, copy=True)
            seen.add(id(x))
        return x

    return jax.tree_util.tree_map(dedup, state)


def shard_train_state(state, mesh: Mesh, zero1: bool = True):
    """Place a TrainState on the mesh: student replicated; optimizer state
    and EMA shadows ZeRO-1 sharded when requested."""
    import dataclasses

    state = _dedup_aliased_leaves(state)
    fields = {}
    for f in dataclasses.fields(state):
        val = getattr(state, f.name)
        if zero1 and val is not None and f.name in (
            "student_target", "student_ema", "opt_state", "vae_dec_ema"
        ):
            fields[f.name] = device_put_zero1(val, mesh)
        else:
            fields[f.name] = jax.device_put(val, replicate(mesh))
    return type(state)(**fields)


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
