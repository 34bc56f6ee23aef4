from consistencytta_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_step,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "sharded_step"]
