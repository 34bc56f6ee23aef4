"""Multi-host data-feeding path (parallel/mesh.py): global batch assembly
from per-process local shards, validated on the virtual 8-device mesh with
two simulated hosts.

A real multi-process run needs jax.distributed; here the per-host assembly
is simulated with jax.make_array_from_single_device_arrays over the same
device partition a 2-host x 4-device slice would own, and the result is fed
through a sharded computation to confirm it is indistinguishable from the
single-host device_put path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from consistencytta_tpu.parallel.mesh import (
    make_global_batch_from_local,
    make_mesh,
    shard_batch,
    device_put_batch,
)


def test_single_process_local_equals_global():
    mesh = make_mesh()
    batch = {
        "wav": np.arange(8 * 6, dtype=np.float32).reshape(8, 6),
        "ids": np.arange(8 * 4, dtype=np.int32).reshape(8, 4),
    }
    out = make_global_batch_from_local(batch, mesh)
    ref = device_put_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
        assert out[k].sharding == ref[k].sharding


def test_two_simulated_hosts_assemble_global_batch():
    """Each simulated host owns 4 of the 8 devices and supplies only its
    rows; the assembled global array must match the single-host placement
    and feed a sharded reduction identically."""
    mesh = make_mesh()
    sharding = shard_batch(mesh)
    devices = mesh.devices.reshape(-1)
    global_batch = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)

    shards = []
    for proc in range(2):  # simulated processes
        local = global_batch[proc * 4 : (proc + 1) * 4]
        for i, dev in enumerate(devices[proc * 4 : (proc + 1) * 4]):
            shards.append(jax.device_put(local[i : i + 1], dev))
    arr = jax.make_array_from_single_device_arrays(
        global_batch.shape, sharding, shards
    )

    np.testing.assert_array_equal(np.asarray(arr), global_batch)
    assert not arr.sharding.is_fully_replicated

    # a data-parallel reduction sees the same values as the local path
    f = jax.jit(lambda x: (x * x).sum(), in_shardings=sharding)
    want = float(f(device_put_batch(global_batch, mesh)))
    got = float(f(arr))
    assert got == want


def test_dataset_process_shard():
    from consistencytta_tpu.training.data import T2ADataset

    ds = T2ADataset(
        captions=[f"c{i}" for i in range(10)],
        paths=[f"p{i}" for i in range(10)],
    )
    a = ds.shard(0, 2)
    b = ds.shard(1, 2)
    assert a.captions == ["c0", "c2", "c4", "c6", "c8"]
    assert b.captions == ["c1", "c3", "c5", "c7", "c9"]
    assert a.segment_length == ds.segment_length
    assert set(a.paths) | set(b.paths) == set(ds.paths)
